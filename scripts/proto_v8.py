"""Microtest: in-kernel sublane-major extraction from DENSE lane-major operands.

The v8 matvec design passes the per-iteration value as (C//128, 128) — a FREE
bitcast of the dense (C,) array (bit-identical tiling) — instead of the
(C, 1) form whose HBM materialization is 128-lane padded (512 B/row, ~12.6 MB
at C=24576; xprof measured ~60 us of operand staging per call). The kernel
then reconstructs the (WH, 1) sublane-major candidate window with:

  slab = ref[pl.ds(r0, 8), :]          # (8, 128) rows r0 = a//128 ...
  t    = jnp.transpose(slab)           # (128, 8) XLU
  z    = concat(t[:, 0:1], t[:, 1:2])  # (256, 1) candidates [128*r0, +256)
  win  = z[pl.ds(off, 128)]            # dynamic sublane slice, off = a%128

This script checks (a) Mosaic compiles the sequence (ASPH_FORCE_MOSAIC=1 on
CPU AOT path or directly on TPU), (b) it is numerically exact vs the (C, 1)
form, (c) its cost per block via the bench-scene meta.

Usage: [ASPH_FORCE_MOSAIC=1 JAX_PLATFORMS=cpu PYTHONPATH=] python scripts/proto_v8.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(an_ref, vp_ref, out_ref, zs_ref, *, nb: int):
    acc = jnp.zeros((128, 1), jnp.float32)

    def body(i, acc):
        a = an_ref[i]
        r0 = a // 128
        off = a - r0 * 128  # multiple of 8
        slab = vp_ref[pl.ds(r0, 8), :]      # (8, 128)
        t = jnp.transpose(slab)             # (128, 8) XLU
        # dynamic_slice on a VALUE is not lowerable (and neither is a sublane
        # concat of single-lane columns); write the two needed columns into a
        # (256, 1) VMEM scratch and take the dynamic SUBLANE slice of the ref
        zs_ref[0:128, :] = t[:, 0:1]
        zs_ref[128:256, :] = t[:, 1:2]
        win = zs_ref[pl.ds(off, 128), :]
        return acc + win

    acc = jax.lax.fori_loop(0, nb, body, acc, unroll=False)
    out_ref[:] = acc


def main():
    interp = os.environ.get("ASPH_FORCE_MOSAIC", "0") != "1" and \
        jax.default_backend() != "tpu"
    C = 24576
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    anchors = np.asarray(
        rng.integers(0, (C - 256) // 8, size=64) * 8, np.int32)
    vp = jnp.concatenate(
        [v.reshape(C // 128, 128), jnp.zeros((8, 128), jnp.float32)], axis=0)

    kern = functools.partial(_kernel, nb=len(anchors))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((256, 1), jnp.float32)],
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((128, 1), jnp.float32),
        interpret=interp,
    )

    if os.environ.get("ASPH_FORCE_MOSAIC", "0") == "1":
        # AOT Mosaic compile (no hardware needed)
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(
            "v5e:2x2", "tpu", topology_name="2x2", chips_per_host_bounds="2,2,1")
        lowered = jax.jit(lambda a, x: call(a, x)).lower(
            jax.ShapeDtypeStruct(anchors.shape, jnp.int32),
            jax.ShapeDtypeStruct(vp.shape, jnp.float32))
        from jax._src.interpreters import mlir  # noqa
        compiled = lowered.compile()  # may fail if device needed; try topo path
        print("Mosaic AOT compile OK")
        return

    got = np.asarray(call(jnp.asarray(anchors), vp))[:, 0]
    want = np.zeros(128, np.float32)
    for a in anchors:
        want += np.asarray(v)[a:a + 128]
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"numeric check: rel err {err:.2e} ({'OK' if err < 1e-6 else 'FAIL'})")


if __name__ == "__main__":
    main()
