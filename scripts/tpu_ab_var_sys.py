"""A/B on device: var-coef (2047^2, Jacobi 0.8) and elasticity (2047^2,
collective RB 1.25) V(2,1) cycles, generic vs leg-super-fused
(rbgs_var/rbgs_sys super kernels).  Chained-state, window-subtracted."""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def bench_cycle(problem, cycle_builder, K=100):
    import jax
    import jax.numpy as jnp
    from evostencils_tpu.compiler.lower import lower_cycle
    low = lower_cycle(cycle_builder(), problem.approximation,
                      problem.rhs_entity)
    b = problem.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(low.default_omegas, jnp.float32)

    def k_cycles(u, bf, omg):
        def body(u, _):
            out = low.step(u, bf, omg)
            return tuple(o.astype(f.dtype) for o, f in zip(out, u)), None
        u, _ = jax.lax.scan(body, u, None, length=K)
        s = u[0].ravel()[0]
        return u, s, s + 1

    run = jax.jit(k_cycles)
    t0 = time.perf_counter()
    u, s, sp = run(u0, b, om)
    cs = float(s)
    compile_s = time.perf_counter() - t0
    times, spares = [], [sp]
    for _ in range(4):
        t0 = time.perf_counter()
        u, s, sp = run(u, b, om)
        float(s)
        times.append(time.perf_counter() - t0)
        spares.append(sp)

    def fetch_time(x):
        t0 = time.perf_counter()
        float(x)
        return time.perf_counter() - t0

    over = min(fetch_time(x) for x in spares)
    return (min(times) - over) / K, cs, compile_s


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from evostencils_tpu import config as cfgmod
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu.problems.poisson import poisson_2d_variable
    from evostencils_tpu.problems.elasticity import linear_elasticity_2d
    print("device:", jax.devices()[0], file=sys.stderr, flush=True)

    def var_case():
        p = poisson_2d_variable(max_level=11, min_level=5)
        p.dtype = np.float32
        return p, lambda: v_cycle(
            p.level_contexts, p.rhs_entity, pre_smoothing=2,
            post_smoothing=1, omega=0.8, partitioning=part.Single,
            coarse_operator=p.coarsest_operator), (2 ** 11 - 1) ** 2

    def ela_case():
        p = linear_elasticity_2d(max_level=11, min_level=4)
        p.dtype = np.float32
        return p, lambda: v_cycle(
            p.level_contexts, p.rhs_entity, pre_smoothing=2,
            post_smoothing=1, omega=1.25, partitioning=part.RedBlack,
            coarse_operator=p.coarsest_operator), 2 * (2 ** 11 - 1) ** 2

    for name, case in [("var2047", var_case), ("elast2047", ela_case)]:
        for pallas in (False, True):
            cfgmod.config.use_pallas_kernels = pallas
            p, cb, dof = case()
            ct, cs, comp = bench_cycle(p, cb)
            print(f"{name} pallas={pallas}: {ct*1e3:.3f} ms/cycle "
                  f"{dof/ct:.3e} DoF/s (compile {comp:.1f}s, "
                  f"checksum {cs:.6e})", flush=True)


if __name__ == "__main__":
    main()
