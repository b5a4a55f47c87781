"""Primitive micro-benchmarks on the real TPU: gather variants, row-window slicing,
batched matvec, dense window reduce. Drives the round-2 engine design.

Timing through the axon tunnel: block_until_ready under-reports (queue ack, not
completion), and full host transfers measure the tunnel. So each measurement chains
reps with a data dependency, fetches a SCALAR to host, and reports the difference
between two rep counts (fixed latency cancels).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _run(fn, x, consts, reps):
    t0 = time.perf_counter()
    out = x
    for _ in range(reps):
        out = fn(out, *consts)
    s = float(np.asarray(jnp.sum(jax.tree.leaves(out)[0][..., :1])))
    return time.perf_counter() - t0, s


def timeit(fn, x, *consts, reps=32):
    """fn(x, *consts) -> array with x's shape/dtype (chained)."""
    _run(fn, x, consts, 2)  # warmup/compile
    t_half, _ = _run(fn, x, consts, reps // 2)
    t_full, _ = _run(fn, x, consts, reps)
    return (t_full - t_half) / (reps - reps // 2) * 1000.0


def main():
    key = jax.random.PRNGKey(0)

    # calibration: 8192^3 bf16 matmul = 1.1 TFLOP (expect ~5.6 ms at v5e 197 TFLOPs)
    a = jax.random.normal(key, (8192, 8192), jnp.bfloat16)
    f = jax.jit(lambda x, b: (x @ b) * 1e-3)
    print(f"CAL matmul 8192^3 bf16: {timeit(f, a, a, reps=8):.3f} ms (expect ~5.6)")

    # calibration: 1 GB elementwise (expect ~2.5 ms at 819 GB/s for r+w)
    big = jax.random.normal(key, (256 * 1024 * 1024,), jnp.float32)
    f = jax.jit(lambda x: x * 1.000001)
    print(f"CAL 1GB elementwise: {timeit(f, big, reps=8):.3f} ms (expect ~2.6)")

    C = 24576
    K = 96
    F = 8
    tbl = jax.random.normal(key, (C, F), jnp.float32)
    idx = jax.random.randint(key, (C, K), 0, C, jnp.int32)

    # arbitrary row gather, chained: gathered -> reduce back to table shape
    def g_rows(t, i):
        g = t[i[:, :, 0] if i.ndim == 3 else i]          # (C,K,F)
        return jnp.mean(g, axis=1) + t * 1e-6

    print(f"row-gather (24k,96) rows F=8: {timeit(jax.jit(g_rows), tbl, idx):.3f} ms "
          f"({C*K*F*4/1e6:.0f} MB gathered)")

    vec = jax.random.normal(key, (C,), jnp.float32)

    def g_elem(v, i):
        g = v[i]                                          # (C,K)
        return jnp.mean(g, axis=1) + v * 1e-6

    print(f"elem-gather (24k,96): {timeit(jax.jit(g_elem), vec, idx):.3f} ms")

    # contiguous 3-row window gather
    T, W3 = 3072, 48
    starts = jax.random.randint(key, (T, 3), 0, C - W3, jnp.int32)

    def g_win(v, s):
        i = s[:, :, None] + jnp.arange(W3)[None, None, :]
        g = v[i.reshape(T, 3 * W3)]
        return v + jnp.mean(g) * 1e-6

    print(f"contig-window gather (3072,144): {timeit(jax.jit(g_win), vec, starts):.3f} ms")

    def g_win_tbl(t, s):
        i = s[:, :, None] + jnp.arange(W3)[None, None, :]
        g = t[i.reshape(T, 3 * W3)]                        # (T,144,F)
        return t + jnp.mean(g) * 1e-6

    print(f"contig-window gather (3072,144) rows F=8: "
          f"{timeit(jax.jit(g_win_tbl), tbl, starts):.3f} ms")

    # batched matvec at Jacobi shapes
    for dt in (jnp.float32, jnp.bfloat16):
        Wt = jax.random.normal(key, (T, 16, 144), dt)
        xv = jax.random.normal(key, (T, 144, 8), dt)

        def mv(x, w):
            o = jnp.einsum("tqw,twf->tqf", w, x)          # (T,16,8)
            return x + jnp.mean(o).astype(x.dtype) * 1e-6

        nm = np.dtype(dt).name
        print(f"batched matvec (3072,16,144)@(..,144,8) {nm}: "
              f"{timeit(jax.jit(mv), xv, Wt):.3f} ms "
              f"(weights {Wt.size*Wt.dtype.itemsize/1e6:.0f} MB)")

    # dense window sweep at the current engine's hot shape
    NY = NX = 128
    MPC, Wd = 24, 216
    q = jax.random.normal(key, (NY, NX, MPC, 2), jnp.float32)
    c = jax.random.normal(key, (NY, NX, Wd, 2), jnp.float32)

    def sweep(q, c):
        diff = q[:, :, :, None] - c[:, :, None, :]
        r2 = jnp.sum(diff * diff, -1)
        w = jnp.exp(-r2)
        red = jnp.sum(w[..., None] * diff, axis=3)        # (ny,nx,24,2)
        return q + red * 1e-6

    print(f"dense window sweep (128,128,24,216) 85M pairs: "
          f"{timeit(jax.jit(sweep), q, c, reps=8):.3f} ms")

    # scatter + argsort (binning costs)
    tgt = jax.random.randint(key, (C,), 0, 524256, jnp.int32)

    def sc(v, t):
        s = jnp.zeros((524256,), jnp.float32).at[t].set(v)
        return v + jnp.mean(s) * 1e-6

    print(f"scatter 24k -> 524k slots: {timeit(jax.jit(sc), vec, tgt):.3f} ms")

    keyz = jax.random.randint(key, (C,), 0, 1 << 20, jnp.int32)

    def srt(k):
        o = jnp.argsort(k)
        return k + o * 0

    print(f"argsort 24k int32: {timeit(jax.jit(srt), keyz):.3f} ms")

    keyz2 = jax.random.randint(key, (196608,), 0, 1 << 20, jnp.int32)
    print(f"argsort 196k int32: {timeit(jax.jit(srt), keyz2):.3f} ms")


if __name__ == "__main__":
    main()
