"""Microbench the primitives of the patch-clique operator design (round 5).

The proposed structure replaces the streamed Pallas matvec with:
  - S sorted layout padded to 128 slots per patch (NB = C//128 patches)
  - per-patch candidate segment = [own 128 slots | 128 gathered halo slots]
  - weight blocks (NB, 256, 128) built by pure-XLA pair math
  - operator application = batched einsum (NB, 256, 128) x (NB, 256)
  - per-iteration halo sync = ONE (NB*128,) gather from S

This script measures, on the real chip, the pieces that decide whether the
design's arithmetic holds (differential timing per the PERFORMANCE.md
methodology: (t_long - t_short) / delta_iters):

  1. (C,) f32 take() gather cost at C = 24576 / 49152  (halo sync per value)
  2. batched matvec einsum (NB, 256, 128) bf16 x (NB, 256) f32, NB=128/256
  3. one int32 sort at 4C keys (the halo-map build) vs C keys
  4. fused pair-term build: (NB, 256, 128) from (NB,256,F)+(NB,128,F)
     with bf16 store + 4 reduced outputs (the clique builder shape)

Usage: python scripts/proto_clique.py   (default env -> axon TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed_scan(fn, carry0, n_long=64, n_short=8, ops=None):
    """Differential scan timing: returns seconds per iteration."""

    def run(n):
        def body(c, _):
            return fn(c), None

        out, _ = jax.lax.scan(body, carry0, None, length=n)
        return out

    jl = jax.jit(lambda: run(n_long))
    js = jax.jit(lambda: run(n_short))
    for j in (js, jl):
        jax.block_until_ready(j())
    ts = time.perf_counter()
    jax.block_until_ready(js())
    ts = time.perf_counter() - ts
    tl = time.perf_counter()
    jax.block_until_ready(jl())
    tl = time.perf_counter() - tl
    return (tl - ts) / (n_long - n_short)


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()} {jax.devices()}")

    # 1. gather cost
    for C in (24576, 49152):
        idx = jnp.asarray(rng.integers(0, C, size=C, dtype=np.int32))
        x0 = jnp.asarray(rng.standard_normal(C).astype(np.float32))

        def g(c, idx=idx):
            return c[idx] + 1.0

        dt = timed_scan(g, x0)
        print(f"gather (C={C}) f32 take: {dt * 1e6:8.2f} us")

    # 1b. 2-column gather (positions/halos as (C,2))
    C = 24576
    idx = jnp.asarray(rng.integers(0, C, size=C, dtype=np.int32))
    x2 = jnp.asarray(rng.standard_normal((C, 2)).astype(np.float32))

    def g2(c):
        return c[idx] + 1.0

    dt = timed_scan(g2, x2)
    print(f"gather (C={C}) (C,2) rows  : {dt * 1e6:8.2f} us")

    # 2. batched einsum matvec
    for NB in (128, 192, 256):
        w = jnp.asarray(rng.standard_normal((NB, 256, 128)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        v0 = jnp.asarray(rng.standard_normal((NB, 256)).astype(np.float32))

        def mv(v):
            o = jnp.einsum("bsl,bs->bl", w, v.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            # chain: reuse output as next value's primary half
            return jnp.concatenate([o, o], axis=1)

        dt = timed_scan(mv, v0)
        mb = NB * 256 * 128 * 2 / 1e6
        print(f"einsum (NB={NB}) {mb:5.1f} MB bf16: {dt * 1e6:8.2f} us "
              f"({mb / 1e3 / dt:6.0f} GB/s)")

    # 2b. einsum with f32 value (parity mode: f32 weights)
    NB = 128
    wf = jnp.asarray(rng.standard_normal((NB, 256, 128)).astype(np.float32))
    v0 = jnp.asarray(rng.standard_normal((NB, 256)).astype(np.float32))

    def mvf(v):
        o = jnp.einsum("bsl,bs->bl", wf, v,
                       preferred_element_type=jnp.float32)
        return jnp.concatenate([o, o], axis=1)

    dt = timed_scan(mvf, v0)
    mb = NB * 256 * 128 * 4 / 1e6
    print(f"einsum (NB={NB}) {mb:5.1f} MB f32 : {dt * 1e6:8.2f} us "
          f"({mb / 1e3 / dt:6.0f} GB/s)")

    # 3. sort cost: C vs 4C int32 single-key
    for n in (24576, 4 * 24576):
        k0 = jnp.asarray(rng.integers(0, 2**30, size=n, dtype=np.int32))

        def s(k):
            (ks,) = jax.lax.sort((k,), num_keys=1)
            return ks ^ 1

        dt = timed_scan(s, k0)
        print(f"sort ({n} int32 keys): {dt * 1e6:8.2f} us")

    # 4. clique builder shape: pair terms + bf16 block + 4 reduces
    NB, F = 128, 5
    q = jnp.asarray(rng.standard_normal((NB, 128, F)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((NB, 256, F)).astype(np.float32))

    def build(qc):
        q, c = qc
        qx = q[:, None, :, 0]; qy = q[:, None, :, 1]; qh = q[:, None, :, 2]
        cx = c[:, :, None, 0]; cy = c[:, :, None, 1]; ch = c[:, :, None, 2]
        cm = c[:, :, None, 3]
        dx = qx - cx
        dy = qy - cy
        r2 = dx * dx + dy * dy
        h_ij = jnp.maximum(0.5 * (qh + ch), 1e-6)
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        u = r / (2.0 * h_ij)
        # cubic spline-ish piecewise (same op mix as kernels.py)
        t1 = jnp.maximum(1.0 - u, 0.0)
        t2 = jnp.maximum(0.5 - u, 0.0)
        wk = t1 * t1 * t1 - 4.0 * t2 * t2 * t2
        dwk = -3.0 * t1 * t1 + 12.0 * t2 * t2
        norm = 1.0 / (h_ij * h_ij)
        valid = (r2 < 4.0 * h_ij * h_ij) & (ch > 0)
        g = jnp.where(valid, cm * norm * dwk / jnp.maximum(r, 1e-6), 0.0)
        den = jnp.where(valid, cm * norm * wk, 0.0)
        blocks = g.astype(jnp.bfloat16)
        s1x = jnp.sum(g * dx, axis=1)
        s1y = jnp.sum(g * dy, axis=1)
        rho = jnp.sum(den, axis=1)
        g2 = jnp.sum(g * g * (dx * dx + dy * dy), axis=1)
        return blocks, s1x, s1y, rho, g2

    jb = jax.jit(lambda q, c: build((q, c)))
    jax.block_until_ready(jb(q, c))

    def chain(qc):
        blocks, s1x, s1y, rho, g2 = build(qc)
        # make the next iteration depend on everything (anti-hoist)
        q2 = qc[0] + (s1x + s1y + rho + g2)[:, :, None] * 1e-9 \
            + jnp.float32(jnp.sum(blocks.astype(jnp.float32)) * 1e-12)
        return (q2, qc[1])

    dt = timed_scan(chain, (q, c), n_long=32, n_short=8)
    print(f"clique builder (NB={NB}, 256x128 pairs + bf16 block + 4 reduces): "
          f"{dt * 1e6:8.2f} us")


if __name__ == "__main__":
    main()
