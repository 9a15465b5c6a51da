"""A/B the bench V-cycle column-transfer modes on TPU."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time

import numpy as np


def build_raw(mode):
    import jax
    import jax.numpy as jnp
    from evostencils_tpu.config import config
    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part

    config.column_transfers = mode
    problem = poisson_2d(max_level=12, min_level=5)
    problem.dtype = np.float32
    cyc = v_cycle(problem.level_contexts, problem.rhs_entity,
                  pre_smoothing=2, post_smoothing=1, omega=1.15,
                  partitioning=part.RedBlack,
                  coarse_operator=problem.coarsest_operator)
    low = lower_cycle(cyc, problem.approximation, problem.rhs_entity)
    b = problem.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(low.default_omegas, jnp.float32)
    return low, u0, b, om


def build(mode):
    import jax
    import jax.numpy as jnp
    from evostencils_tpu.config import config
    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part

    config.column_transfers = mode
    problem = poisson_2d(max_level=12, min_level=5)
    problem.dtype = np.float32
    cyc = v_cycle(problem.level_contexts, problem.rhs_entity,
                  pre_smoothing=2, post_smoothing=1, omega=1.15,
                  partitioning=part.RedBlack,
                  coarse_operator=problem.coarsest_operator)
    low = lower_cycle(cyc, problem.approximation, problem.rhs_entity)
    b = problem.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(low.default_omegas, jnp.float32)
    K = 200

    def k_cycles(u, bf, om):
        def body(u, _):
            return low.step(u, bf, om), None
        u, _ = jax.lax.scan(body, u, None, length=K)
        return sum(jnp.sum(x) for x in u)

    return jax.jit(k_cycles), (u0, b, om), K


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("device:", jax.devices()[0], file=sys.stderr)
    n_dof = (2**12 - 1) ** 2
    for mode in ('matmul', 'matmul_bf16'):
        run, args, K = build(mode)
        t0 = time.perf_counter()
        v0 = float(run(*args))
        print(f"mode={mode}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(*args))
            ts.append(time.perf_counter() - t0)
        ct = min(ts) / K
        print(f"mode={mode}: cycle {ct*1e3:.3f} ms, "
              f"{n_dof/ct:.3e} DoF/s, checksum {v0:.6e}")
        import jax.numpy as jnp
        from evostencils_tpu.compiler.solve import make_solver
        low, u0, b, om = build_raw(mode)
        solver = make_solver(low, max_iterations=20, target_reduction=1e-5)
        u_s, iters, hist = solver(u0, b, om)
        hist = np.asarray(jax.device_get(hist)); iters = int(iters)
        k = min(iters, 4)
        rho = float((hist[k]/hist[0])**(1/max(k,1)))
        print(f"mode={mode}: solve 1e-5 in {iters} iters, rho={rho:.4f}")


if __name__ == "__main__":
    main()
