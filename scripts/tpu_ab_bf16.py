"""A/B: f32 vs bf16 V-cycle throughput on the live device.

Times the headline V(2,1) RB-GS cycle (bench.py protocol: chained-state
batches, one-element sync fetches) with the fine-grid state in f32 and in
bfloat16.  The cycle is HBM-bound, so bf16 should approach 2x DoF/s; the
convergence story for bf16 cycles lives in compiler/refine.py
(mixed-precision refinement) and scripts/deep_solve.py — this script is
throughput only.

Run alone (single-client TPU tunnel):
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_ab_bf16.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.compiler.solve import make_cycle_loop
    from evostencils_tpu.ir import partitioning as part

    print(f"[ab] device: {jax.devices()[0]}", file=sys.stderr)

    max_level, min_level = 12, 5
    problem = poisson_2d(max_level=max_level, min_level=min_level)
    problem.dtype = np.float32
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=1, omega=1.15,
                    partitioning=part.RedBlack,
                    coarse_operator=problem.coarsest_operator)
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    b32 = problem.build_rhs()
    omegas = jnp.asarray(lowered.default_omegas, dtype=jnp.float32)
    n_dof = int(np.prod(problem.finest_grid[0].size))
    K = 200

    loop = make_cycle_loop(lowered, K)
    run = jax.jit(loop)

    def timeit(u0, bf, label):
        probe = jax.jit(lambda u: u[0].astype(jnp.float32).ravel()[0])
        t0 = time.perf_counter()
        u = run(u0, bf, omegas)
        float(probe(u))
        print(f"[ab] {label}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        cal = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(probe(u))
            cal.append(time.perf_counter() - t0)
        overhead = min(cal)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(2):
                u = run(u, bf, omegas)
            float(probe(u))
            ts.append((time.perf_counter() - t0 - overhead) / 2)
        t = min(ts) / K
        print(f"[ab] {label}: {t * 1e3:.3f} ms/cycle, "
              f"{n_dof / t:.3e} DoF/s", file=sys.stderr, flush=True)
        return t

    u0 = tuple(jnp.zeros_like(x) for x in b32)
    t32 = timeit(u0, b32, "f32 ")
    b16 = tuple(x.astype(jnp.bfloat16) for x in b32)
    u16 = tuple(jnp.zeros_like(x) for x in b16)
    t16 = timeit(u16, b16, "bf16")
    print(f"[ab] bf16 speedup over f32: {t32 / t16:.2f}x", file=sys.stderr)
    print(f'{{"f32_ms": {t32 * 1e3:.4f}, "bf16_ms": {t16 * 1e3:.4f}, '
          f'"speedup": {t32 / t16:.3f}}}')


if __name__ == "__main__":
    main()
