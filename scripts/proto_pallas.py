"""Prototype: block-list pair sweep kernel — validates the round-2 engine design.

Checks, on the real TPU:
  1. PrefetchScalarGridSpec index maps driven by per-block scalar arrays
  2. output revisiting with accumulation across consecutive grid steps
  3. per-block cost (DMA (F,WK) candidates + (F,TQ) queries + masked pair math)

Layout: queries (NT, F, TQ), candidates (NC, F, WK) — 3D so the trailing block dims
equal the array dims (Mosaic requirement).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 8
WK = 64


def kernel(qt_ref, ck_ref, lo_ref, hi_ref, scale_ref, q_ref, c_ref, out_ref):
    b = pl.program_id(0)
    lo = lo_ref[b]
    hi = hi_ref[b]
    ck = ck_ref[b]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, WK), 1) + ck * WK
    cvalid = (col >= lo) & (col < hi)

    cx = c_ref[0, 0, :].reshape(1, WK)
    cy = c_ref[0, 1, :].reshape(1, WK)
    ch = c_ref[0, 2, :].reshape(1, WK)
    cm = c_ref[0, 3, :].reshape(1, WK)
    scale = scale_ref[0]

    prev_qt = qt_ref[jnp.maximum(b - 1, 0)]
    prev_same = (b > 0) & (prev_qt == qt_ref[b])

    @pl.when(jnp.logical_not(prev_same))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    outs = []
    for q in range(TQ):
        qx = q_ref[0, 0, q]
        qy = q_ref[0, 1, q]
        qh = q_ref[0, 2, q]
        dx = qx - cx
        dy = qy - cy
        r2 = dx * dx + dy * dy
        h_ij = jnp.maximum(0.5 * (qh + ch), 1e-6)
        rad = scale * h_ij
        valid = cvalid & (r2 < rad * rad)
        w = jnp.exp(-r2 / (h_ij * h_ij))
        contrib = jnp.where(valid, cm * w, 0.0)
        outs.append(jnp.sum(contrib))

    vals = jnp.stack(outs).reshape(1, TQ)
    out_ref[0, 0:1, :] += vals


def run(E, NT, C, F=4, reps=20):
    key = jax.random.PRNGKey(0)
    NC = C // WK
    qtbl = jax.random.normal(key, (NT, F, TQ), jnp.float32) * 0.01
    qtbl = qtbl.at[:, 2].set(jnp.abs(qtbl[:, 2]) + 0.05)
    ctbl = jax.random.normal(key, (NC, F, WK), jnp.float32) * 0.01
    ctbl = ctbl.at[:, 2].set(jnp.abs(ctbl[:, 2]) + 0.05)

    bpt = E // NT
    qt = jnp.repeat(jnp.arange(NT, dtype=jnp.int32), bpt)
    ck = jax.random.randint(key, (E,), 0, NC, jnp.int32)
    lo = ck * WK + 3
    hi = ck * WK + 50
    scale = jnp.full((1,), 2.0, jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(E,),
        in_specs=[
            pl.BlockSpec((1, F, TQ), lambda b, qt, ck, lo, hi, s: (qt[b], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, WK), lambda b, qt, ck, lo, hi, s: (ck[b], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, TQ), lambda b, qt, ck, lo, hi, s: (qt[b], 0, 0),
                               memory_space=pltpu.VMEM),
    )

    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NT, 8, TQ), jnp.float32),
    )
    fj = jax.jit(f)

    out = fj(qt, ck, lo, hi, scale, qtbl, ctbl)
    jax.block_until_ready(out)

    def chain(x):
        o = fj(qt, ck, lo, hi, scale, x, ctbl)
        return x + jnp.mean(o).astype(x.dtype) * 1e-9

    x = chain(qtbl)
    float(np.asarray(jnp.sum(x[0, 0, :1])))  # warm the chained program
    t0 = time.perf_counter()
    for _ in range(reps // 2):
        x = chain(x)
    float(np.asarray(jnp.sum(x[0, 0, :1])))
    t1 = time.perf_counter()
    for _ in range(reps):
        x = chain(x)
    float(np.asarray(jnp.sum(x[0, 0, :1])))
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (reps - reps // 2) * 1000
    print(f"E={E} NT={NT}: {dt:.3f} ms/sweep  ({dt/E*1e3:.3f} us/block, "
          f"{E*TQ*WK/dt*1e3/1e9:.2f} Gpairs/s)")

    if E <= 512:
        got = np.asarray(fj(qt, ck, lo, hi, scale, qtbl, ctbl))[:, 0, :]
        qn, cn = np.asarray(qtbl), np.asarray(ctbl)
        want = np.zeros((NT, TQ), np.float32)
        for e in range(E):
            t = int(qt[e])
            cb = int(ck[e])
            cols = np.arange(cb * WK, cb * WK + WK)
            m = (cols >= int(lo[e])) & (cols < int(hi[e]))
            for q in range(TQ):
                dx = qn[t, 0, q] - cn[cb, 0]
                dy = qn[t, 1, q] - cn[cb, 1]
                r2 = dx * dx + dy * dy
                h_ij = np.maximum(0.5 * (qn[t, 2, q] + cn[cb, 2]), 1e-6)
                v = m & (r2 < (2.0 * h_ij) ** 2)
                w = np.exp(-r2 / (h_ij * h_ij))
                want[t, q] += np.sum(np.where(v, cn[cb, 3] * w, 0.0))
        err = np.max(np.abs(got - want) / (np.abs(want) + 1e-6))
        print(f"  parity vs numpy: max rel err {err:.2e}")


if __name__ == "__main__":
    run(E=512, NT=128, C=24576)
    run(E=4096, NT=1024, C=24576)
    run(E=8192, NT=2048, C=24576)
    run(E=16384, NT=3072, C=24576)
