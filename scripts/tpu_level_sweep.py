"""Cycle time vs max_level: separates fine-level HBM cost from fixed
per-level launch overheads (t(L) ~= overhead + c*4^L)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part

    print("device:", jax.devices()[0], file=sys.stderr)
    for ml in (9, 10, 11, 12):
        p = poisson_2d(max_level=ml, min_level=5)
        p.dtype = np.float32
        cyc = v_cycle(p.level_contexts, p.rhs_entity, pre_smoothing=2,
                      post_smoothing=1, omega=1.15,
                      partitioning=part.RedBlack,
                      coarse_operator=p.coarsest_operator)
        low = lower_cycle(cyc, p.approximation, p.rhs_entity)
        b = p.build_rhs()
        u0 = tuple(jnp.zeros_like(x) for x in b)
        om = jnp.asarray(low.default_omegas, jnp.float32)
        K = 400

        def k_cycles(u, bf, om):
            def body(u, _):
                return low.step(u, bf, om), None
            u, _ = jax.lax.scan(body, u, None, length=K)
            return sum(jnp.sum(x) for x in u)

        run = jax.jit(k_cycles)
        t0 = time.perf_counter()
        float(run(u0, b, om))
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(run(u0, b, om))
            ts.append(time.perf_counter() - t0)
        ct = min(ts) / K
        n_dof = (2 ** ml - 1) ** 2
        print(f"L={ml}: cycle {ct*1e3:7.3f} ms  {n_dof/ct:.3e} DoF/s  "
              f"(compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
