"""Per-leg roofline attribution of the headline V-cycle on the device.

Times each fine-level leg of the fused V(2,1) in isolation at the bench
size (4095^2 f32) and reports achieved HBM bandwidth vs the v5e roofline
(819 GB/s), pinning where the cycle's time goes:

* down-leg kernel  (2 pre-smooth sweeps + residual + row restriction)
* up-leg kernel    (row prolongation + correction + post-smooth)
* inter-iteration mega-kernel (up-leg of k + down-leg of k+1)
* column transfers (lane-axis restriction/prolongation) per strategy
* the full coarse tail (everything below the finest level)
* the complete lowered.step for reference

Run alone (single-client TPU tunnel):
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/leg_profile.py
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

HBM_BPS = 819e9   # v5e


_window_overhead = None


def _calibrate_window():
    """Seconds of fixed overhead per timed window: dispatch + the scalar
    fetch that closes it (~tens of ms through the axon relay).  Subtracted
    from every measurement — at K=50 it is ~1 ms/call of phantom time."""
    global _window_overhead
    if _window_overhead is not None:
        return _window_overhead
    import jax
    import jax.numpy as jnp
    tiny = jax.jit(lambda x: (x * 1.000001).ravel()[:1].astype(jnp.float32))
    x = jnp.ones((8, 128), jnp.float32)
    float(tiny(x)[0])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(tiny(x)[0])
        ts.append(time.perf_counter() - t0)
    _window_overhead = min(ts)
    print(f"[leg] window overhead (dispatch+fetch): "
          f"{_window_overhead * 1e3:.1f} ms", file=sys.stderr, flush=True)
    return _window_overhead


def bench(fn, args, chain, K=512, reps=3):
    """min seconds per call of ``fn(*args)``, window overhead subtracted.

    ``chain(out, args) -> args'`` feeds each iteration's output back into
    the next iteration's arguments INSIDE the scan.  Without that data
    dependence XLA's while-loop invariant code motion hoists the whole
    computation out of the loop (measured: a loop-invariant matmul costs
    the same at K=16 as at K=1), silently timing one call as if it were K.
    A scalar fetch closes each timing window (block_until_ready only
    acknowledges enqueue through the axon relay); the fetch+dispatch
    overhead is measured by :func:`_calibrate_window` and subtracted.
    """
    import jax
    import jax.numpy as jnp

    over = _calibrate_window()

    def k_times(*a):
        def body(carry, _):
            out = fn(*carry)
            return chain(out, carry), None
        a, _ = jax.lax.scan(body, a, None, length=K)
        leaves = jax.tree_util.tree_leaves(a)
        return sum(jnp.sum(jnp.real(x).ravel()[:1]) for x in leaves)

    run = jax.jit(k_times)
    float(run(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - over, 1e-9) / K


def row(name, t_s, bytes_moved):
    gbs = bytes_moved / t_s / 1e9
    print(f"[leg] {name:34s} {t_s * 1e3:8.3f} ms  {gbs:7.1f} GB/s  "
          f"{gbs * 1e9 / HBM_BPS * 100:5.1f}% of HBM roofline",
          file=sys.stderr, flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="time only the fused legs, the coarse tail and "
                             "the full step (each distinct program costs a "
                             "multi-minute remote compile on the tunnel)")
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
    from evostencils_tpu import config as cfg
    from evostencils_tpu.config import pallas_interpret
    interp = pallas_interpret()

    print(f"[leg] device: {jax.devices()[0]}", file=sys.stderr)

    max_level, min_level = 12, 5
    problem = poisson_2d(max_level=max_level, min_level=min_level)
    problem.dtype = np.float32
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=1, omega=1.15,
                    partitioning=part.RedBlack,
                    coarse_operator=problem.coarsest_operator)
    lowered = L.lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    plan = L.extract_fine_leg_plan(lowered.expression)
    assert plan is not None, "fine-leg plan did not match"

    n = 2 ** max_level - 1
    m = n
    nc = (n - 1) // 2
    B = 4  # f32 bytes
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    rr = jnp.asarray(rng.standard_normal((nc, m)), jnp.float32)
    ch = jnp.asarray(rng.standard_normal((nc, m)), jnp.float32)
    rc = jnp.asarray(rng.standard_normal((nc, nc)), jnp.float32)
    om = jnp.float32(1.15)

    # --- fine-level Pallas legs --------------------------------------------
    # each chain feeds the iteration's output back as next input, so the
    # scan cannot be hoisted (see bench docstring)
    t = bench(lambda u_, b_: pt.presmooth_residual_rowrestrict(
        u_, b_, [om, om], plan.vals, plan.r_taps[0], interpret=interp),
        (u, b), chain=lambda out, a: (out[0], a[1]))
    # streams: read u, read b, write u, write rr(half)
    row("down-leg (2xRB+res+rowR)", t, (3 * n * m + nc * m) * B)

    t = bench(lambda u_, c_, b_: pt.prolong_correct_postsmooth(
        u_, c_, b_, [om, om], plan.vals, plan.p_taps[0], interpret=interp),
        (u, ch, b), chain=lambda out, a: (out, a[1], a[2]))
    row("up-leg (rowP+corr+1xRB)", t, (3 * n * m + nc * m) * B)

    t = bench(lambda u_, c_, b_: pt.upleg_downleg_fused(
        u_, c_, b_, [om, om, om, om], plan.vals, plan.p_taps[0],
        plan.r_taps[0], interpret=interp), (u, ch, b),
        chain=lambda out, a: (out[0], out[1], a[2]))
    row("mega (up-leg k + down-leg k+1)", t, (3 * n * m + 2 * nc * m) * B)

    # --- column transfers per strategy -------------------------------------
    # R: (nc,m)->(nc,nc) and P: (nc,nc)->(nc,m) have mismatched in/out
    # shapes, so neither can chain alone without adding artificial array
    # traffic; time the chained PAIR (P's output feeds R, R's feeds P) and
    # report the pair time — it is what one V-cycle pays per fine level
    # (one R + one P) and is the number that picks the best mode.
    modes = (cfg.config.column_transfers or "matmul",) if args.quick \
        else ("matmul", "conv", "transpose", "banded")
    for mode in modes:
        cfg.config.column_transfers = mode
        try:
            def pair(r_):
                rc_ = L._col_restrict(r_, plan.r_taps[1], m)
                return L._col_prolong(rc_, plan.p_taps[1], m)
            t = bench(pair, (rr,), chain=lambda out, a: (out,))
            row(f"col R+P pair[{mode}]", t,
                (nc * m + 2 * nc * nc + nc * m) * B)
        except Exception as e:
            print(f"[leg] col[{mode}] FAILED: {str(e)[:120]}",
                  file=sys.stderr)
    cfg.config.column_transfers = None

    # --- coarse tail and full step -----------------------------------------
    tail = S.make_coarse_tail(lowered, plan)
    omv = jnp.asarray(lowered.default_omegas, jnp.float32)
    bt = (b,)
    ut = (u,)
    t = bench(lambda r_: tail(r_, ut, bt, omv), (rc,),
              chain=lambda out, a: (out,))
    row("coarse tail (levels below fine)", t, 2 * (4.0 / 3.0) *
        (3 * nc * nc + nc * nc) * B)   # rough: geometric series below fine

    t = bench(lambda u_, b_: lowered.step((u_,), (b_,), omv), (u, b),
              chain=lambda out, a: (out[0], a[1]))
    row("full lowered.step (1 V-cycle)", t, (2 * (3 * n * m + nc * m)
                                             + 2 * nc * m) * B)


if __name__ == "__main__":
    main()
