"""Sweep the leg3d two-axis block sizes (B0 planes x B1 rows) on the
255^3 V(2,1) cycle.

Halo read amplification is (B0+2*H0)/B0 * (B1+2*H1)/B1 — 1.75x at the
shipped (8, 96); larger blocks cut redundant reads but grow the VMEM
window, so the sweep finds the best feasible point (Mosaic OOMs and
failures are recorded per config, not fatal).

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_sweep_leg3d_blocks.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

CONFIGS = [(8, 112), (12, 128), (12, 96), (8, 160), (16, 80), (8, 144)]


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[sweep3d] device: {jax.devices()[0]}", file=sys.stderr,
          flush=True)

    from evostencils_tpu.problems.poisson import poisson_3d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler import lower as lower_mod
    from evostencils_tpu.compiler.solve import make_cycle_loop
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu.ops.pallas import leg3d

    p = poisson_3d(max_level=8, min_level=2)
    p.dtype = np.float32
    cyc = v_cycle(p.level_contexts, p.rhs_entity, pre_smoothing=2,
                  post_smoothing=1, omega=1.15, partitioning=part.RedBlack,
                  coarse_operator=p.coarsest_operator)
    b = p.build_rhs()
    n_dof = int(np.prod(p.finest_grid[0].size))
    K = 50

    results = []
    for B0, B1 in CONFIGS:
        leg3d._B0, leg3d._B1 = B0, B1
        try:
            low = lower_cycle_fresh(lower_mod, cyc, p)
            loop = make_cycle_loop(low, K)

            def probe(u, bf, om):
                out = loop(u, bf, om)
                s = out[0].ravel()[0]
                return out, s, s + 1

            run = jax.jit(probe)
            om = jnp.asarray(low.default_omegas, jnp.float32)
            u = tuple(jnp.zeros_like(x) for x in b)
            t0 = time.perf_counter()
            u, s, s2 = run(u, b, om)
            float(s)
            compile_s = time.perf_counter() - t0
            # chained timed batches + window calibration
            times, spares = [], [s2]
            for _ in range(3):
                t0 = time.perf_counter()
                u, s, s2 = run(u, b, om)
                float(s)
                times.append(time.perf_counter() - t0)
                spares.append(s2)

            def fetch(sp):
                t0 = time.perf_counter()
                float(sp)
                return time.perf_counter() - t0

            ovh = min(fetch(sp) for sp in spares)
            t_cyc = (min(times) - ovh) / K
            dofs = n_dof / t_cyc
            print(f"[sweep3d] B0={B0:3d} B1={B1:3d}  {t_cyc*1e3:7.3f} ms/cycle "
                  f"{dofs:.3e} DoF/s  (compile {compile_s:.0f}s, "
                  f"checksum {float(s):.6e})", flush=True)
            results.append((t_cyc, B0, B1))
        except Exception as e:
            print(f"[sweep3d] B0={B0:3d} B1={B1:3d}  FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    if results:
        best = min(results)
        print(f"[sweep3d] best: B0={best[1]} B1={best[2]} "
              f"{best[0]*1e3:.3f} ms/cycle", flush=True)


def lower_cycle_fresh(lower_mod, cyc, p):
    """Re-lower with cleared trace caches so the new block sizes take."""
    return lower_mod.lower_cycle(cyc, p.approximation, p.rhs_entity)


if __name__ == "__main__":
    main()
