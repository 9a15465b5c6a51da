"""A/B: plain step-scan vs inter-iteration fused cycle loop on TPU."""

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
    from evostencils_tpu.compiler.solve import make_cycle_loop
    from evostencils_tpu.ir import partitioning as part

    print("device:", jax.devices()[0], file=sys.stderr)
    p = poisson_2d(max_level=12, min_level=5)
    p.dtype = np.float32
    cyc = v_cycle(p.level_contexts, p.rhs_entity, pre_smoothing=2,
                  post_smoothing=1, omega=1.15, partitioning=part.RedBlack,
                  coarse_operator=p.coarsest_operator)
    low = lower_cycle(cyc, p.approximation, p.rhs_entity)
    b = p.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(low.default_omegas, jnp.float32)
    K = 200
    n_dof = (2 ** 12 - 1) ** 2

    def scan_run(u, bf, omg):
        def body(u, _):
            return low.step(u, bf, omg), None
        u, _ = jax.lax.scan(body, u, None, length=K)
        return u

    fused = make_cycle_loop(low, K)

    for name, run in (("scan", jax.jit(scan_run)), ("fused", fused)):
        t0 = time.perf_counter()
        out = run(u0, b, om)
        cs = float(sum(jnp.sum(x) for x in out))   # host fetch = real barrier
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(u0, b, om)[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        ct = min(ts) / K
        print(f"{name}: cycle {ct*1e3:.3f} ms, {n_dof/ct:.3e} DoF/s, "
              f"checksum {cs:.6e}")


if __name__ == "__main__":
    main()
