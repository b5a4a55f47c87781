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

    if "--multichip" in sys.argv:
        # slab-sharded production step (shard_map + ppermute halo exchange +
        # Mosaic kernels) compiled for a real 4-chip v5e mesh — the CPU dryrun
        # only exercises interpret-mode kernels; this validates the actual
        # multi-chip TPU program
        import numpy as np_

        from adaptive_sph_tpu.models import scene as scene_mod
        from adaptive_sph_tpu.parallel import tile_sharding as ts
        from adaptive_sph_tpu.runner import create_simulation, grid_config_for
        from adaptive_sph_tpu.utils.params import (
            InitBoundaryHandlerType, ParticleSizes, PressureSolverMethod,
            SimulationParams,
        )

        ndev = 4
        scene = scene_mod.scene_from_dict({
            "boundary": {"type": "box", "width": 2.0, "height": 2.0},
            "blocks": [{"pos": [-0.95, -0.5], "size": [1.2, 0.6],
                        "spacing": 0.03, "volume_fill_ratio": 0.93,
                        "velocity": [0, 0]}],
        })
        params = SimulationParams(
            particle_sizes=ParticleSizes.Uniform,
            pressure_solver_method=PressureSolverMethod.HybridDFSPH,
            init_boundary_handler=InitBoundaryHandlerType.AnalyticOverestimate,
            merging=False, sharing=False, splitting=False, max_iters=100,
            warm_start_pressure=True,
        )
        sim = create_simulation(params, scene, capacity=2048, backend="tiles")
        gcfg = grid_config_for(sim.params, scene, sim.state, sim.state.capacity)
        scfg = ts.make_slab_config(sim.params, gcfg, sim.state, ndev, tq=16)
        tmesh = ts.Mesh(np.array(topo.devices).reshape(ndev), (ts.AXIS,))
        step = ts.make_slab_step_fn(sim.params, scfg, sim.boundary_handler,
                                    tmesh)
        import jax.numpy as jnp_
        from jax.sharding import PartitionSpec as P_

        def shaped(a, c_dev):
            a = jnp_.asarray(a) if not hasattr(a, "dtype") else a
            if getattr(a, "ndim", 0) >= 1:
                gshape = (ndev * c_dev,) + a.shape[1:]
                spec = P_(ts.AXIS, *([None] * (a.ndim - 1)))
            else:
                gshape, spec = a.shape, P_()
            return jax.ShapeDtypeStruct(gshape, a.dtype,
                                        sharding=NamedSharding(tmesh, spec))

        def collectives(compiled):
            """Communication structure of the compiled program: op counts and
            total all-gather bytes (the GSPMD fallback's replication cost)."""
            import collections
            import re

            txt = compiled.as_text()
            ops = collections.Counter(
                m for m in re.findall(
                    r" (all-gather|all-reduce|reduce-scatter|"
                    r"collective-permute|all-to-all)(?:-start)?\(", txt))
            ag_bytes = sum(
                4 * int(np_.prod([int(x) for x in m.split(",")]))
                for m in re.findall(
                    r"= \(?f32\[([0-9,]+)\][^ ]* all-gather(?:-start)?\(", txt)
            )
            return dict(ops), ag_bytes

        sst = jax.tree.map(lambda a: shaped(a, scfg.c_dev), sim.state)
        t0 = time.time()
        comp = jax.jit(lambda st: step(st)[0]).lower(sst).compile()
        ops, ag = collectives(comp)
        print(f"AOT OK  slab step [{ndev}-chip mesh]   {time.time()-t0:6.1f}s"
              f"  collectives={ops} all-gather-bytes={ag}")

        # adaptive variant: slab-local merge/share/split partner matching
        from adaptive_sph_tpu.utils.params import LevelEstimationMethod

        params_a = params.replace(
            particle_sizes=ParticleSizes.Adaptive,
            level_estimation_method=LevelEstimationMethod.EmptyAngle,
            merging=True, sharing=True, splitting=True,
        )
        sim_a = create_simulation(params_a, scene, capacity=2048,
                                  backend="tiles")
        gcfg_a = grid_config_for(sim_a.params, scene, sim_a.state,
                                 sim_a.state.capacity)
        scfg_a = ts.make_slab_config(sim_a.params, gcfg_a, sim_a.state, ndev,
                                     tq=16)
        step_a = ts.make_slab_step_fn(sim_a.params, scfg_a,
                                      sim_a.boundary_handler, tmesh,
                                      split_patterns=sim_a.split_patterns)
        sst_a = jax.tree.map(lambda a: shaped(a, scfg_a.c_dev), sim_a.state)
        t0 = time.time()
        comp = jax.jit(lambda st: step_a(st)[0]).lower(sst_a).compile()
        ops, ag = collectives(comp)
        print(f"AOT OK  slab step adaptive [{ndev}-chip] {time.time()-t0:6.1f}s"
              f"  collectives={ops} all-gather-bytes={ag}")

        # GSPMD particle-sharded fallback (parallel/sharding.py): compile at
        # the same scale and expose its communication structure — the honest
        # evidence for the 'replicated compute' caveat in its docstring
        from adaptive_sph_tpu.parallel.sharding import make_sharded_step_fn

        sim_g = create_simulation(params, scene, capacity=2048,
                                  backend="lists")
        gmesh = ts.Mesh(np.array(topo.devices).reshape(ndev), ("p",))
        gstep = make_sharded_step_fn(sim_g.params, sim_g.ncfg,
                                     sim_g.boundary_handler, gmesh)

        def gshaped(a):
            a = jnp_.asarray(a) if not hasattr(a, "dtype") else a
            spec = (P_("p", *([None] * (a.ndim - 1)))
                    if getattr(a, "ndim", 0) >= 1 else P_())
            return jax.ShapeDtypeStruct(a.shape, a.dtype,
                                        sharding=NamedSharding(gmesh, spec))

        gst = jax.tree.map(gshaped, sim_g.state)
        t0 = time.time()
        comp = jax.jit(lambda st: gstep(st)[0]).lower(gst).compile()
        ops, ag = collectives(comp)
        print(f"AOT OK  GSPMD list step [{ndev}-chip]  {time.time()-t0:6.1f}s"
              f"  collectives={ops} all-gather-bytes={ag}")
        return

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
