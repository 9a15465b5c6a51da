"""Tune the mega-kernel row-block size for the fused solve loop."""

import functools
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
    from evostencils_tpu.compiler import solve as solve_mod
    from evostencils_tpu.ops.pallas import transfer as ptransfer
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
    orig = ptransfer.upleg_downleg_fused

    for R in (32, 48, 96, 128):
        ptransfer.upleg_downleg_fused = functools.partial(orig, block_rows=R)
        try:
            run = solve_mod.make_cycle_loop(low, K)
            t0 = time.perf_counter()
            out = run(u0, b, om)
            cs = float(sum(jnp.sum(x) for x in out))   # host fetch = barrier
            comp = time.perf_counter() - t0
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                float(run(u0, b, om)[0].ravel()[0])
                ts.append(time.perf_counter() - t0)
            ct = min(ts) / K
            print(f"R={R}: cycle {ct*1e3:.3f} ms {n_dof/ct:.3e} DoF/s "
                  f"checksum {cs:.6e} (compile {comp:.0f}s)")
        except Exception as e:
            print(f"R={R}: FAILED {type(e).__name__}: {str(e)[:120]}")
        finally:
            ptransfer.upleg_downleg_fused = orig


if __name__ == "__main__":
    main()
