"""Round-3 per-leg attribution: column-FUSED leg kernels + block-size A/B.

Times the col-fused kernels (ops/pallas/transfer.py lane-transfer section)
that the lowered step now uses, the coarse tail, and the full step, at the
bench size (4095^2 f32); optionally sweeps the row-block sizes.

Run alone (single-client TPU tunnel):
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/leg_profile3.py
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from leg_profile import bench, row, HBM_BPS  # noqa: E402  (same dir)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--blocks", action="store_true",
                        help="sweep row-block sizes for the fused legs")
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp
    cache = str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler import lower as L
    from evostencils_tpu.compiler import solve as S
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu.ops.pallas import transfer as pt
    from evostencils_tpu.config import pallas_interpret
    interp = pallas_interpret()

    print(f"[leg3] device: {jax.devices()[0]}", file=sys.stderr)

    max_level, min_level = 12, 5
    problem = poisson_2d(max_level=max_level, min_level=min_level)
    problem.dtype = np.float32
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=1, omega=1.15,
                    partitioning=part.RedBlack,
                    coarse_operator=problem.coarsest_operator)
    lowered = L.lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    plan = L.extract_fine_leg_plan(lowered.expression)
    assert plan is not None

    n = m = 2 ** max_level - 1
    nc = mc = (n - 1) // 2
    B = 4
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    e = jnp.asarray(rng.standard_normal((nc, mc)), jnp.float32)
    rc = jnp.asarray(rng.standard_normal((nc, mc)), jnp.float32)
    om = jnp.float32(1.15)

    def time_legs(tag=""):
        t = bench(lambda u_, b_: pt.presmooth_residual_restrict(
            u_, b_, [om, om], plan.vals, (plan.r_taps[0], plan.r_taps[1]),
            interpret=interp), (u, b), chain=lambda out, a: (out[0], a[1]))
        row(f"down-leg colfused{tag}", t, (3 * n * m + nc * mc) * B)
        t = bench(lambda u_, e_, b_: pt.prolong_correct_postsmooth_col(
            u_, e_, b_, [om, om], plan.vals,
            (plan.p_taps[0], plan.p_taps[1]), interpret=interp),
            (u, e, b), chain=lambda out, a: (out, a[1], a[2]))
        row(f"up-leg colfused{tag}", t, (3 * n * m + nc * mc) * B)
        t = bench(lambda u_, e_, b_: pt.upleg_downleg_col(
            u_, e_, b_, [om, om, om, om], plan.vals, plan.p_taps,
            plan.r_taps, interpret=interp), (u, e, b),
            chain=lambda out, a: (out[0], out[1], a[2]))
        row(f"mega colfused{tag}", t, (3 * n * m + 2 * nc * mc) * B)

    time_legs()

    if args.blocks:
        orig_rc, orig_rf = pt._ROW_BLOCK_COARSE, pt._ROW_BLOCK_FINE
        for (rcb, rfb) in [(64, 128), (16, 32), (48, 96)]:
            pt._ROW_BLOCK_COARSE, pt._ROW_BLOCK_FINE = rcb, rfb
            try:
                time_legs(tag=f"[Rc={rcb}]")
            except Exception as ex:
                print(f"[leg3] Rc={rcb} FAILED: {str(ex)[:150]}",
                      file=sys.stderr, flush=True)
        pt._ROW_BLOCK_COARSE, pt._ROW_BLOCK_FINE = orig_rc, orig_rf

    # coarse tail + full step
    tail = L.make_coarse_tail(lowered, plan)
    omv = jnp.asarray(lowered.default_omegas, jnp.float32)
    t = bench(lambda r_: tail(r_, (u,), (b,), omv), (rc,),
              chain=lambda out, a: (out,))
    row("coarse tail (below finest)", t,
        2 * (4.0 / 3.0) * 4 * nc * mc * B)
    t = bench(lambda u_, b_: lowered.step((u_,), (b_,), omv), (u, b),
              chain=lambda out, a: (out[0], a[1]))
    row("full lowered.step (1 V-cycle)", t,
        (2 * (3 * n * m + nc * mc)) * B)


if __name__ == "__main__":
    main()
