"""AOT Mosaic/XLA compile check of the production TPU path — NO hardware needed.

The local libtpu can compile full TPU executables against a described topology
(compile-only PJRT), which runs the complete Mosaic kernel pipeline — the same
one that crashes at runtime-compile time on the real chip. This validates every
Pallas kernel and the whole jitted step locally, independent of the axon tunnel.

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/aot_check.py [--resident] [--bf16]
"""

import os
import sys
import time

sys.path.insert(0, ".")

# force real Mosaic lowering — without this, default_interpret() sees a CPU
# backend and the "AOT check" would compile interpret-mode emulations instead
os.environ["ASPH_FORCE_MOSAIC"] = "1"


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    resident = "--resident" in sys.argv
    bf16 = "--bf16" in sys.argv

    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    devs = np.array(topo.devices)[:1]
    mesh = Mesh(devs.reshape(1), ("x",))
    s = NamedSharding(mesh, P())

    def aot(name, fn, args):
        shaped = [
            jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s), a
            )
            for a in args
        ]
        t0 = time.time()
        jax.jit(fn).lower(*shaped).compile()
        print(f"AOT OK  {name:<28s} {time.time()-t0:6.1f}s")

    # the full production step at bench shapes (includes every hot kernel:
    # tile build, sweeps, fused builder, matvecs / resident solve)
    import dataclasses

    from bench import build_sim

    sim = build_sim(replicas=1)
    if resident or bf16:
        sim.params = dataclasses.replace(
            sim.params, resident_solver=resident, weight_cache_bf16=bf16
        )
        from adaptive_sph_tpu.models.simulation import make_step_fn

        step = make_step_fn(sim.params, sim.ncfg, sim.boundary_handler,
                            grid_cfg=None, tile_cfg=sim.tile_cfg)
    else:
        step = sim.step_fn
    mode = f"resident={resident} bf16={bf16}"
    print(f"checking bench step ({mode}; C={sim.tile_cfg.capacity}, "
          f"tq={sim.tile_cfg.tq}, b_max={sim.tile_cfg.b_max})")
    aot(f"bench step [{mode}]", lambda st: step(st)[0], [sim.state])


if __name__ == "__main__":
    main()
