"""A/B at 255^3: generic XLA path vs the two-axis-blocked 3D Pallas legs
(ops/pallas/leg3d.py).  Chained-state timing with window-overhead
subtraction (BASELINE.md timing-infrastructure protocol)."""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from evostencils_tpu import config as cfgmod
    from evostencils_tpu.problems.poisson import poisson_3d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part

    print("device:", jax.devices()[0], file=sys.stderr, flush=True)
    ml = 8                      # 255^3
    n_dof = (2 ** ml - 1) ** 3
    K = 50
    results = {}
    for pallas in (False, True):
        cfgmod.config.use_pallas_kernels = pallas
        p = poisson_3d(max_level=ml, min_level=3)
        p.dtype = np.float32
        cyc = v_cycle(p.level_contexts, p.rhs_entity, pre_smoothing=2,
                      post_smoothing=1, omega=1.15,
                      partitioning=part.RedBlack,
                      coarse_operator=p.coarsest_operator)
        low = lower_cycle(cyc, p.approximation, p.rhs_entity)
        b = p.build_rhs()
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
        print(f"pallas={pallas}: compile+first "
              f"{time.perf_counter()-t0:.1f}s checksum {float(s):.6e}",
              file=sys.stderr, flush=True)
        times, spares = [], [sp]
        for _ in range(4):
            t0 = time.perf_counter()
            u, s, sp = run(u, b, om)       # chained state
            float(s)
            times.append(time.perf_counter() - t0)
            spares.append(sp)
        # window overhead: fetch of a computed-but-never-fetched scalar
        def fetch_time(x):
            t0 = time.perf_counter()
            float(x)
            return time.perf_counter() - t0
        over = min(fetch_time(x) for x in spares)
        ct = (min(times) - over) / K
        results[pallas] = ct
        print(f"pallas={pallas}: 3D cycle {ct*1e3:.3f} ms, "
              f"{n_dof/ct:.3e} DoF/s (window {over*1e3:.1f} ms)",
              flush=True)
    if results.get(True) and results.get(False):
        print(f"speedup: {results[False]/results[True]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
