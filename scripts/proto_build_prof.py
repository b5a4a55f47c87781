"""Profile build_tiles components on the TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x, *consts, reps=256):
    """Scan fn reps times inside one program; subtract the 1-rep dispatch cost.

    Large device arrays must be passed via *consts (forwarded as jit arguments) —
    closed-over arrays become HLO constants and blow up the remote-compile payload.
    """

    def looped(n):
        def body(c, _):
            return fn(c, *c_args), None

        def outer(x0, *cs):
            nonlocal c_args
            c_args = cs
            return jax.lax.scan(body, x0, None, length=n)[0]

        c_args = ()
        return jax.jit(outer)

    f_full, f_one = looped(reps), looped(1)

    def run(f):
        y = f(x, *consts)
        float(np.asarray(jnp.sum(jax.tree.leaves(y)[0].reshape(-1)[:1].astype(jnp.float32))))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            y = f(x, *consts)
            float(np.asarray(jnp.sum(jax.tree.leaves(y)[0].reshape(-1)[:1].astype(jnp.float32))))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(f_full) - run(f_one)) / (reps - 1) * 1000


def main():
    key = jax.random.PRNGKey(0)
    C = 24576
    keys = jax.random.randint(key, (C,), 0, 1 << 20, jnp.int32)
    iota = jnp.arange(C, dtype=jnp.int32)
    f1 = jax.jit(lambda k: jax.lax.sort((k, k + 1, iota), num_keys=1)[0])
    print(f"lax.sort 3-operand 24k: {timeit(f1, keys):.3f} ms")

    f2 = jax.jit(lambda k: jnp.cumsum(k % 7).astype(jnp.int32))
    print(f"cumsum 24k: {timeit(f2, keys):.3f} ms")

    f3 = jax.jit(lambda k: jax.lax.associative_scan(jnp.maximum, k))
    print(f"assoc_scan 24k: {timeit(f3, keys):.3f} ms")

    cells = jax.random.randint(key, (16390,), 0, 1 << 20, jnp.int32)
    print(f"assoc_scan 16k: {timeit(f3, cells):.3f} ms")

    f4 = jax.jit(lambda k: k + jnp.zeros((16390,), jnp.int32).at[k % 16390].set(k)[0])
    print(f"scatter 24k->16k: {timeit(f4, keys):.3f} ms")

    vals = jax.random.normal(key, (C,), jnp.float32)
    lvl = keys % 7

    def hmaxes(v):
        hm = jnp.zeros((8,), jnp.float32)
        for p in range(7):
            hm = hm.at[p].set(jnp.max(jnp.where(lvl == p, v, 0.0)))
        return v + hm[0] * 1e-9

    print(f"8 masked maxes 24k: {timeit(jax.jit(hmaxes), vals):.3f} ms")

    tbl = jax.random.normal(key, (C + 1, 8), jnp.float32)
    perm = jax.random.randint(key, (C,), 0, C, jnp.int32)

    def rowgather(t):
        g = t[:C][perm]
        return t + jnp.mean(g) * 1e-9

    print(f"row gather (24k,8): {timeit(jax.jit(rowgather), tbl):.3f} ms")

    # full build for comparison
    import dataclasses
    from adaptive_sph_tpu.ops.grid import make_grid_config
    from adaptive_sph_tpu.ops.tiles import TileConfig, build_tiles
    from scripts.proto_tiles import make_scene

    pos2, h2, mass2, alive2 = make_scene(11827, 8, C, seed=1, dense=True)
    g2 = make_grid_config((-1, -1), (1, 1), 2.0, 0.00827, 0.4135, C)
    g2 = dataclasses.replace(g2, populated=(0, g2.levels - 1))
    cfg2 = TileConfig.from_grid(g2, 2.0, tq=32)
    bt = jax.jit(lambda p: build_tiles(p, h2 * 2.0, h2, alive2, cfg2).pp.astype(jnp.float32)[:, None] * 1e-9 + p)
    print(f"full build_tiles: {timeit(bt, pos2, reps=64):.3f} ms")


if __name__ == "__main__":
    main()
