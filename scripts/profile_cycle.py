"""Per-level timing breakdown of the headline V-cycle on the live device.

Times truncated cycles (levels >= L only) to attribute cycle time to
fine-level kernels vs coarse-level launch latency.  Note that truncating at
level L also moves the coarsest-grid direct solve up to level L, so each
per-level delta includes the change in coarse-solve cost, not just the
removed level's smoother/transfer kernels.  Diagnostics only.
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
    from evostencils_tpu.ir import partitioning as part

    dev = jax.devices()[0]
    print(f"[prof] device: {dev}", file=sys.stderr)

    max_level, min_level = 12, 5
    K = 200

    def timeit(lowered, u0, b, omegas):
        def k_cycles(u, b_fields, om):
            def body(u, _):
                return lowered.step(u, b_fields, om), None
            u, _ = jax.lax.scan(body, u, None, length=K)
            return u
        run = jax.jit(k_cycles)
        probe = jax.jit(lambda u: u[0].ravel()[0])
        u = run(u0, b, omegas)
        float(probe(u))
        times = []
        # chained batches so no call can be served from a cache (bench.py)
        for _ in range(3):
            t0 = time.perf_counter()
            u = run(u, b, omegas)
            float(probe(u))
            times.append(time.perf_counter() - t0)
        return min(times) / K

    prev = None
    for lo in range(min_level, max_level):
        problem = poisson_2d(max_level=max_level, min_level=lo)
        problem.dtype = np.float32
        cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                        pre_smoothing=2, post_smoothing=1, omega=1.15,
                        partitioning=part.RedBlack,
                        coarse_operator=problem.coarsest_operator)
        lowered = lower_cycle(cycle, problem.approximation,
                              problem.rhs_entity)
        b = problem.build_rhs()
        u0 = tuple(jnp.zeros_like(x) for x in b)
        omegas = jnp.asarray(lowered.default_omegas, dtype=jnp.float32)
        t = timeit(lowered, u0, b, omegas)
        delta = "" if prev is None else f"  ({(t - prev) * 1e3:+.3f} ms)"
        print(f"[prof] min_level={lo:2d}: cycle {t * 1e3:.3f} ms{delta}",
              file=sys.stderr)
        prev = t


if __name__ == "__main__":
    main()
