"""Inter-iteration fused cycle loop vs plain step iteration.

``make_cycle_loop`` fuses the up-leg of cycle k with the down-leg of
cycle k+1 at the finest level (one HBM pass); it must be exactly
equivalent to K applications of ``lowered.step`` up to f32 reassociation
(kernels run in Pallas interpret mode on the CPU test platform)."""

import numpy as np
import jax.numpy as jnp
import pytest

from evostencils_tpu import config as cfgmod
from evostencils_tpu.problems.poisson import poisson_2d, poisson_3d
from evostencils_tpu.compiler.cycles import v_cycle
from evostencils_tpu.compiler.lower import lower_cycle, extract_fine_leg_plan
from evostencils_tpu.compiler.solve import make_cycle_loop
from evostencils_tpu.ir import partitioning as part


def _build(problem_fn, **kw):
    p = problem_fn(**kw)
    p.dtype = np.float32
    cyc = v_cycle(p.level_contexts, p.rhs_entity, pre_smoothing=2,
                  post_smoothing=1, omega=1.15, partitioning=part.RedBlack,
                  coarse_operator=p.coarsest_operator)
    low = lower_cycle(cyc, p.approximation, p.rhs_entity)
    b = p.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(low.default_omegas, jnp.float32)
    return low, u0, b, om


@pytest.mark.parametrize("K", [1, 2, 4])
def test_fused_loop_matches_step_iteration(K):
    old = cfgmod.config.use_pallas_kernels
    try:
        cfgmod.config.use_pallas_kernels = True
        cfgmod.config.loop_fusion = True
        low, u0, b, om = _build(poisson_2d, max_level=9, min_level=5)
        assert extract_fine_leg_plan(low.expression) is not None
        u_ref = u0
        for _ in range(K):
            u_ref = low.step(u_ref, b, om)
        u_fused = make_cycle_loop(low, K)(u0, b, om)
    finally:
        cfgmod.config.use_pallas_kernels = old
        cfgmod.config.loop_fusion = False
    scale = float(np.max(np.abs(np.asarray(u_ref[0]))))
    np.testing.assert_allclose(np.asarray(u_fused[0]),
                               np.asarray(u_ref[0]),
                               rtol=0, atol=3e-5 * max(scale, 1e-3))


def test_fused_loop_converges():
    """K fused cycles drive the residual down like K plain cycles."""
    from evostencils_tpu.compiler.solve import residual_norm_fn
    old = cfgmod.config.use_pallas_kernels
    try:
        cfgmod.config.use_pallas_kernels = True
        cfgmod.config.loop_fusion = True
        low, u0, b, om = _build(poisson_2d, max_level=9, min_level=5)
        u = make_cycle_loop(low, 8)(u0, b, om)
    finally:
        cfgmod.config.use_pallas_kernels = old
        cfgmod.config.loop_fusion = False
    rn = residual_norm_fn(low.operator)
    r0 = float(rn(u0, b))
    r8 = float(rn(u, b))
    assert r8 / r0 < 1e-5   # f32 residual floor (~2e-6 at 511^2)


def test_fused_loop_fallback_unsupported_structure():
    """Structures outside the plan (3D here) fall back to step iteration
    and still produce identical results."""
    old = cfgmod.config.use_pallas_kernels
    try:
        cfgmod.config.use_pallas_kernels = True
        cfgmod.config.loop_fusion = True
        low, u0, b, om = _build(poisson_3d, max_level=4, min_level=2)
        u_ref = u0
        for _ in range(2):
            u_ref = low.step(u_ref, b, om)
        u_loop = make_cycle_loop(low, 2)(u0, b, om)
    finally:
        cfgmod.config.use_pallas_kernels = old
        cfgmod.config.loop_fusion = False
    np.testing.assert_allclose(np.asarray(u_loop[0]), np.asarray(u_ref[0]),
                               rtol=0, atol=1e-6)
