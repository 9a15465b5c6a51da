"""A/B: generic StencilField XLA path vs fused variable-coefficient
Pallas sweeps on TPU (variable-coefficient 2D Poisson)."""

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
    from evostencils_tpu import config as cfgmod
    from evostencils_tpu.problems.poisson import poisson_2d_variable
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part

    print("device:", jax.devices()[0], file=sys.stderr)
    ml = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    n_dof = (2 ** ml - 1) ** 2
    K = 200
    for pallas in (False, True):
        cfgmod.config.use_pallas_kernels = pallas
        p = poisson_2d_variable(max_level=ml, min_level=5)
        p.dtype = np.float32
        cyc = v_cycle(p.level_contexts, p.rhs_entity, pre_smoothing=2,
                      post_smoothing=1, omega=1.0,
                      partitioning=part.RedBlack,
                      coarse_operator=p.coarsest_operator)
        low = lower_cycle(cyc, p.approximation, p.rhs_entity)
        b = p.build_rhs()
        u0 = tuple(jnp.zeros_like(x) for x in b)
        om = jnp.asarray(low.default_omegas, jnp.float32)

        def k_cycles(u, bf, omg):
            def body(u, _):
                return low.step(u, bf, omg), None
            u, _ = jax.lax.scan(body, u, None, length=K)
            return sum(jnp.sum(x) for x in u)

        run = jax.jit(k_cycles)
        t0 = time.perf_counter()
        cs = float(run(u0, b, om))
        print(f"pallas={pallas}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(u0, b, om))
            ts.append(time.perf_counter() - t0)
        ct = min(ts) / K
        print(f"pallas={pallas}: varcoef cycle {ct*1e3:.3f} ms, "
              f"{n_dof/ct:.3e} DoF/s, checksum {cs:.6e}")


if __name__ == "__main__":
    main()
