"""Round-4 device A/Bs, chained-state, slope-fit timed:

1. 3D Poisson 255^3 V(2,1): two-axis leg3d kernels (round-3 shipping,
   1.895 ms/cycle) vs the wavefront down/up legs
   (ops/pallas/wavefront3d.py) — VERDICT r3 next-step #5.
2. 2D Poisson 4095^2 V(2,1): masked half-sweeps vs the combined
   red+black update form (config.combined_rb) — VERDICT r3 next-step #6.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_ab_r4.py [--case 3d|2d]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def bench_cycle(problem, cycle, n_cycles=200, reps=3, sizes=(1, 2, 4)):
    """ms/cycle via the slope-fit protocol over chained cycle-loop
    launches (each launch runs ``n_cycles`` cycles in one program)."""
    import jax
    import jax.numpy as jnp
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.compiler.solve import make_cycle_loop
    from evostencils_tpu.ir import transformations

    transformations.assign_cycle_ids(cycle)
    low = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    om = jnp.asarray(low.default_omegas, jnp.float32)
    b = problem.build_rhs()
    run = make_cycle_loop(low, n_cycles)
    u = tuple(jnp.zeros_like(x) for x in b)
    u = run(u, b, om)
    float(np.abs(np.asarray(jax.device_get(u[0].ravel()[0]))))
    checksum = float(np.asarray(jax.device_get(
        jnp.sum(jnp.abs(u[0].astype(jnp.float32))))))

    per_s = {}
    salt = 1
    for rep in range(reps):
        for S in sizes:
            u0 = tuple((x * (1 + (salt % 7) * 1e-30)) for x in u)
            float(np.abs(np.asarray(jax.device_get(u0[0].ravel()[0]))))
            t0 = time.perf_counter()
            out = u0
            for j in range(S):
                out = run(tuple(x * (1 + ((salt + j) % 5) * 1e-30)
                                for x in out), b, om)
            float(np.abs(np.asarray(jax.device_get(out[0].ravel()[0]))))
            per_s.setdefault(S, []).append(time.perf_counter() - t0)
            salt += S
            u = out
    pairs = [(S, min(ws)) for S, ws in sorted(per_s.items())]
    A = np.stack([[p[0] for p in pairs], np.ones(len(pairs))], 1)
    W = np.array([p[1] for p in pairs])
    slope = np.linalg.lstsq(A, W, rcond=None)[0][0]
    return slope * 1e3 / n_cycles, checksum


def case_3d():
    import jax.numpy as jnp
    from evostencils_tpu.problems.poisson import poisson_3d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu.ops.pallas import wavefront3d

    problem = poisson_3d(max_level=8, min_level=4)      # 255^3
    problem.dtype = np.float32
    dof = (2 ** 8 - 1) ** 3

    def cyc():
        return v_cycle(problem.level_contexts, problem.rhs_entity,
                       pre_smoothing=2, post_smoothing=1, omega=1.15,
                       partitioning=part.RedBlack,
                       coarse_operator=problem.coarsest_operator)

    # A: wavefront disabled (supports() forced off)
    orig = wavefront3d.supports
    wavefront3d.supports = lambda u: False
    try:
        ms_a, ck_a = bench_cycle(problem, cyc())
    finally:
        wavefront3d.supports = orig
    print(f"[ab3d] leg3d two-axis path: {ms_a:.3f} ms/cycle "
          f"({dof / ms_a * 1e3 / 1e9:.2f}e9 DoF/s) checksum {ck_a:.6e}",
          flush=True)
    ms_b, ck_b = bench_cycle(problem, cyc())
    print(f"[ab3d] wavefront legs:      {ms_b:.3f} ms/cycle "
          f"({dof / ms_b * 1e3 / 1e9:.2f}e9 DoF/s) checksum {ck_b:.6e}",
          flush=True)
    print(f"[ab3d] speedup {ms_a / ms_b:.2f}x; checksum rel diff "
          f"{abs(ck_a - ck_b) / max(abs(ck_a), 1e-30):.2e}", flush=True)


def case_2d():
    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu.config import config

    problem = poisson_2d(max_level=12, min_level=5)     # 4095^2
    problem.dtype = np.float32
    dof = (2 ** 12 - 1) ** 2

    def cyc():
        return v_cycle(problem.level_contexts, problem.rhs_entity,
                       pre_smoothing=2, post_smoothing=1, omega=1.15,
                       partitioning=part.RedBlack,
                       coarse_operator=problem.coarsest_operator)

    config.combined_rb = False
    ms_a, ck_a = bench_cycle(problem, cyc())
    print(f"[ab2d] masked half-sweeps: {ms_a:.3f} ms/cycle "
          f"({dof / ms_a * 1e3 / 1e9:.2f}e9 DoF/s) checksum {ck_a:.6e}",
          flush=True)
    config.combined_rb = True
    ms_b, ck_b = bench_cycle(problem, cyc())
    config.combined_rb = False
    print(f"[ab2d] combined RB form:   {ms_b:.3f} ms/cycle "
          f"({dof / ms_b * 1e3 / 1e9:.2f}e9 DoF/s) checksum {ck_b:.6e}",
          flush=True)
    print(f"[ab2d] speedup {ms_a / ms_b:.2f}x; checksum rel diff "
          f"{abs(ck_a - ck_b) / max(abs(ck_a), 1e-30):.2e}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", choices=["3d", "2d", "all"], default="all")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[ab] device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    if args.case in ("3d", "all"):
        case_3d()
    if args.case in ("2d", "all"):
        case_2d()


if __name__ == "__main__":
    main()
