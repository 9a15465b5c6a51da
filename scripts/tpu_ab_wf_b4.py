"""Device A/B: 3D wavefront down-leg at B=2 vs B=4 planes per step
(255^3 V(2,1); VERDICT r4 next-step #4 'amortize the 130 per-grid-step
overheads' lever).  Outcome is either a measured speedup or the
recorded VMEM/Mosaic negative at today's kernel layout.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_ab_wf_b4.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def measure(block):
    import jax
    import jax.numpy as jnp
    from evostencils_tpu.config import config
    from evostencils_tpu.problems.poisson import poisson_3d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part

    config.wavefront_downleg_block = block
    problem = poisson_3d(max_level=8, min_level=2)     # 255^3
    problem.dtype = np.float32
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=1, omega=1.15,
                    partitioning=part.RedBlack,
                    coarse_operator=problem.coarsest_operator)
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    b = problem.build_rhs()
    om = jnp.asarray(lowered.default_omegas, jnp.float32)

    @jax.jit
    def chain(u, k):
        def body(c, _):
            return lowered.step(c, b, om), None
        u, _ = jax.lax.scan(lambda c, x: (lowered.step(c, b, om), None),
                            u, None, length=k)
        return u

    u = tuple(jnp.zeros_like(x) for x in b)
    try:
        u = chain(u, 2)
        float(np.asarray(jax.device_get(u[0]))[1, 1, 1])
    except Exception as e:
        print(f"[ab-b4] B={block}: COMPILE/RUN FAILED: "
              f"{type(e).__name__}: {str(e)[:400]}", flush=True)
        return None, None
    samples = {}
    for S in (8, 32):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            u = chain(u, S)
            float(np.asarray(jax.device_get(u[0]))[1, 1, 1])
            best = min(best, time.perf_counter() - t0)
        samples[S] = best
    slope = (samples[32] - samples[8]) / 24.0
    chk = float(np.linalg.norm(np.asarray(jax.device_get(u[0])).ravel()))
    print(f"[ab-b4] B={block}: {slope * 1e3:.3f} ms/cycle "
          f"({16.58e6 * 9 / slope / 1e9:.2f}e9 DoF/s) checksum {chk:.6e}",
          flush=True)
    return slope, chk


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[ab-b4] device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    s2, c2 = measure(2)
    s4, c4 = measure(4)
    if s2 and s4:
        print(f"[ab-b4] speedup B=4 vs B=2: {s2 / s4:.3f}x; "
              f"checksum rel diff {abs(c4 - c2) / max(abs(c2), 1e-30):.2e}",
              flush=True)


if __name__ == "__main__":
    main()
