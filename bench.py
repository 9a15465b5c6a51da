"""Headline benchmark: stencil DoF/s per chip on the reference V-cycle.

Solves the reference 2D Poisson problem (V-cycle, RB-GS omega=1.15,
2 pre / 1 post — example_problems/Poisson/2D_FD_Poisson_fromL2.exa3) in f32
on the available accelerator and reports fine-grid degrees of freedom
processed per second through full V-cycles.

The timed loop is ``compiler.solve.make_cycle_loop`` — the production path
where consecutive cycles share one Pallas pass at the finest level (the
up-leg of cycle k fuses with the down-leg of cycle k+1), not the plain
per-cycle ``lowered.step``.

``vs_baseline`` prices the *same cycle expression* on the reference's own
roofline machine model (6-core AVX2 CPU, 249.6 GFLOP/s, 45.8 GB/s —
reference scripts/optimize.py:79-84) via prediction.performance and reports
measured speedup over that model.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import pathlib
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = str(pathlib.Path(__file__).resolve().parent / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.compiler.solve import (
        make_solver, make_cycle_loop, residual_norm_fn)
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu.prediction.performance import (
        PerformanceEvaluator, REFERENCE_CPU, TPU_V5E)

    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)

    max_level, min_level = 12, 5
    problem = poisson_2d(max_level=max_level, min_level=min_level)
    problem.dtype = np.float32
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=1, omega=1.15,
                    partitioning=part.RedBlack,
                    coarse_operator=problem.coarsest_operator)
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    b = problem.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    omegas = jnp.asarray(lowered.default_omegas, dtype=jnp.float32)

    # --- throughput: K cycles through the production cycle loop -------------
    # NOTE: the axon relay has ~25-30 ms per-call latency and async
    # dispatch; a scalar checksum fetch forces real execution
    # (block_until_ready does NOT synchronize through the relay), K
    # amortizes the RPC (production solve loops likewise run many cycles
    # per launch).  config.loop_fusion decides whether the loop fuses
    # cycle k's up-leg with cycle k+1's down-leg — off on v5e where the
    # A/B (scripts/tpu_ab_fusedloop.py) measured it net-slower.
    # ONE compiled program: the remote compile service through the tunnel
    # costs ~10 minutes per program, so the K-cycle loop and the scalar
    # checksum share a single jit (the checksum leaf is the only buffer
    # fetched; a second, never-fetched scalar calibrates the window).
    K = 200
    loop = make_cycle_loop(lowered, K)
    res_norm = residual_norm_fn(lowered.operator)

    def k_and_probe(u, b_fields, om):
        out = loop(u, b_fields, om)
        s = out[0].ravel()[0]
        # device-numerics probe: the XLA-path residual of the Pallas-cycled
        # state (fetched once, after timing — see below)
        rn = res_norm(out, b_fields)
        return out, s, s + 1, rn

    run = jax.jit(k_and_probe)
    t0 = time.perf_counter()
    u, s, s2, rn = run(u0, b, omegas)
    float(s)
    print(f"[bench] compile+first: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # Timed batches CHAIN the state (u of batch j feeds batch j+1): a
    # repeat call with identical arguments can be served from a cache or
    # elided, but a data-dependent chain must execute — the 2026-08-20
    # driver run measured an impossible 0.000 ms/cycle with the old
    # identical-args repetition.  Each batch is closed by the one-element
    # checksum fetch (block_until_ready only acknowledges enqueue on the
    # relay).
    R = 3
    times = []
    spares = [s2]
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(R):
            u, s, s2, rn = run(u, b, omegas)
        float(s)
        times.append(time.perf_counter() - t0)
        spares.append(s2)

    # fixed window overhead (dispatch + fetch, ~tens of ms through the
    # relay): fetching a small never-fetched buffer is a pure host round
    # trip (jax caches values after the first fetch, so each calibration
    # sample needs its own fresh buffer)
    def time_fetch(sp):
        t0 = time.perf_counter()
        float(sp)
        return time.perf_counter() - t0

    overhead = min(time_fetch(sp) for sp in spares)
    print(f"[bench] window overhead (dispatch+fetch): {overhead * 1e3:.1f} ms",
          file=sys.stderr)
    times = [(t - overhead) / R for t in times]
    cycle_time = min(times) / K
    n_dof = int(np.prod(problem.finest_grid[0].size))
    dof_per_s = n_dof / cycle_time
    spread = (max(times) - min(times)) / min(times)
    print(f"[bench] {n_dof} DoF, cycle {cycle_time * 1e3:.3f} ms, "
          f"{dof_per_s:.3e} DoF/s (sample spread {spread * 100:.1f}%)",
          file=sys.stderr)

    # --- roofline accounting ------------------------------------------------
    # unfused op-sum on the v5e model (every operation pays its own
    # read+write round trip)
    v5e_unfused = PerformanceEvaluator(TPU_V5E).estimate_runtime(cycle)
    # fused-pass lower bound: the finest level is two Pallas passes per
    # cycle (down-leg, up-leg), each streaming u and b once and writing u
    # once -> 5 fine-grid arrays of HBM traffic; coarser levels likewise
    # but on 1/4 the points (2D), bounded by the geometric series 4/3.
    fused_floor = (5 * n_dof * 4 / TPU_V5E.bandwidth) * (4.0 / 3.0)
    print(f"[bench] v5e roofline: unfused {v5e_unfused * 1e3:.3f} ms, "
          f"fused-pass floor {fused_floor * 1e3:.3f} ms -> achieved "
          f"{fused_floor / cycle_time * 100:.0f}% of fused SoL, "
          f"{v5e_unfused / cycle_time * 100:.0f}% of unfused roofline",
          file=sys.stderr)
    if cycle_time < 0.5 * fused_floor:
        print("[bench] WARNING: measured time is below half the HBM "
              "speed-of-light floor — timing is not physical, refusing "
              "to report it", file=sys.stderr)
        sys.exit(1)

    # --- convergence sanity: f32 solve to 1e-5 (above the f32 floor) --------
    # on the IN-PROCESS CPU backend: convergence is algorithm physics, not
    # device timing, and a second remote compile would double wall time
    from evostencils_tpu.config import config as es_config
    cpu = jax.devices("cpu")[0]
    b_c = tuple(jax.device_put(np.asarray(x), cpu) for x in b)
    u0_c = tuple(jnp.zeros_like(x) for x in b_c)
    om_c = jax.device_put(np.asarray(omegas), cpu)
    old_pallas = es_config.use_pallas_kernels
    es_config.use_pallas_kernels = False
    try:
        with jax.default_device(cpu):
            solver = make_solver(lowered, max_iterations=20,
                                 target_reduction=1e-5)
            u_s, iters, hist = solver(u0_c, b_c, om_c)
            hist = np.asarray(jax.device_get(hist))
    finally:
        es_config.use_pallas_kernels = old_pallas
    iters = int(iters)
    # asymptotic rho from the pre-plateau iterations
    k = min(iters, 4)
    rho = float((hist[k] / hist[0]) ** (1 / max(k, 1)))
    print(f"[bench] solve to 1e-5: {iters} iterations, rho(first {k})={rho:.4f}",
          file=sys.stderr)

    # --- device-numerics probe ---------------------------------------------
    # The Pallas-cycled device state must satisfy the TRUE equation: its
    # residual — computed by the XLA-path operator apply inside the same
    # jitted program, so an in-kernel stencil/residual/transfer error
    # cannot cancel itself — must sit at the f32 fixed-point floor.  This
    # catches device-only Pallas numerics regressions (the bf16 in-kernel
    # divergence class, BASELINE.md) that the one-element timing checksum
    # and the CPU-only convergence check would both miss.
    #
    # A direct device-vs-CPU *solution* comparison is the wrong probe at
    # this cycle count: the f32 fixed point random-walks in low-frequency
    # modes (~1e-4 relative row drift after 25 XLA-path cycles on CPU,
    # 2.2e-4 after 50 — measured 2026-08-21; ~2e-3 after the 2600 device
    # cycles here), so thousands of cycles drift legitimately above any
    # solver-tolerance threshold while the residual stays on the floor.
    rn_b = float(np.sqrt(sum(float(np.vdot(np.asarray(x), np.asarray(x)))
                             for x in b)))
    rel_res = float(rn) / rn_b
    print(f"[bench] device state relative residual after "
          f"{K * (1 + 4 * R)} cycles: {rel_res:.2e}", file=sys.stderr)
    if not np.isfinite(rel_res) or rel_res > 1e-4:
        print("[bench] WARNING: device state does not satisfy the "
              "discretized equation to the f32 floor — device numerics "
              "are broken, refusing to report", file=sys.stderr)
        sys.exit(1)
    # gross solution cross-check (catches a consistent wrong-operator
    # fixed point); threshold leaves room for the measured drift above
    mid = u[0].shape[0] // 2
    row_dev = np.asarray(jax.device_get(u[0][mid]))        # 16 KB fetch
    row_cpu = np.asarray(jax.device_get(u_s[0][mid]))
    scale = float(np.max(np.abs(row_cpu))) or 1.0
    row_err = float(np.max(np.abs(row_dev - row_cpu))) / scale
    print(f"[bench] device-vs-CPU solution row error: {row_err:.2e} "
          f"(f32 fixed-point drift; gross threshold 1e-2)", file=sys.stderr)
    if not np.isfinite(row_err) or row_err > 1e-2:
        print("[bench] WARNING: device solution diverges from CPU "
              "reference — device numerics are broken, refusing to report",
              file=sys.stderr)
        sys.exit(1)

    # --- reference machine model for the same cycle -------------------------
    ref_cycle_time = PerformanceEvaluator(REFERENCE_CPU).estimate_runtime(cycle)
    vs_baseline = ref_cycle_time / cycle_time
    print(f"[bench] reference CPU roofline cycle: {ref_cycle_time * 1e3:.2f} ms "
          f"-> speedup {vs_baseline:.1f}x", file=sys.stderr)

    print(json.dumps({
        "metric": "poisson2d_4095sq_vcycle_throughput",
        "value": dof_per_s,
        "unit": "DoF/s",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
