"""Two-axis-blocked 3D leg kernels (ops/pallas/leg3d.py) against the
generic XLA lowering they replace at sizes where plane-blocked kernels
exceed VMEM (the 255^3 class, BASELINE.md round-2 3D gap)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evostencils_tpu.ops import apply as ops
from evostencils_tpu.ops.pallas import leg3d
from evostencils_tpu.stencils.constant import Stencil
from evostencils_tpu.stencils import gallery

VALS7 = (6.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0)
OFFS = leg3d.__dict__.get("SEVEN_OFFSETS") or [
    (0, 0, 0), (-1, 0, 0), (1, 0, 0),
    (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)]

SHAPES = [(31, 31, 63), (23, 39, 63), (31, 63, 127)]


def _stencil7():
    from evostencils_tpu.ops.pallas.rbgs3d import SEVEN_OFFSETS
    return Stencil(list(zip(SEVEN_OFFSETS, VALS7)))


def _taps():
    cf = (2, 2, 2)
    r = gallery.FullWeightingRestrictionGenerator(cf)
    p = gallery.MultilinearInterpolationGenerator(cf)

    class G:
        size = None
    from evostencils_tpu.grids import Grid
    g = Grid(size=(31, 31, 31), spacing=(1.0, 1.0, 1.0), level=5)
    r_st = r.generate_stencil(g)
    p_st = p.generate_stencil(g)
    r_fac = ops.separable_factors(r_st)
    p_fac = ops.separable_factors(p_st)
    taps = leg3d.seven_taps(r_fac, p_fac)
    assert taps is not None
    return r_st, p_st, taps


def _data(shape, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    return u, b


@pytest.mark.parametrize("shape", SHAPES)
def test_fused_rb_sweep_3d2(shape):
    from evostencils_tpu.compiler.lower import red_black_masks
    u, b = _data(shape)
    st = _stencil7()
    dinv = 1.0 / VALS7[0]
    om = 1.15
    # reference: two masked half-sweeps via the generic path
    red, black = red_black_masks(shape, jnp.float32)
    v = u
    for mask in (red, black):
        r = b - ops.apply_constant(st, v)
        v = v + om * mask * (dinv * r)
    got = leg3d.fused_rbgs_sweep_3d2(u, b, om, VALS7, dinv, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(v), atol=2e-5)


@pytest.mark.parametrize("shape", SHAPES)
def test_residual_restrict_3d(shape):
    u, b = _data(shape)
    st = _stencil7()
    r_st, p_st, taps = _taps()
    r = b - ops.apply_constant(st, u)
    want = ops.restrict(r_st, r)
    got = leg3d.residual_restrict_3d(u, b, VALS7, taps[0], interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("shape", SHAPES)
def test_prolong_correct_3d(shape):
    u, _ = _data(shape)
    r_st, p_st, taps = _taps()
    nc = tuple((s - 1) // 2 for s in shape)
    rng = np.random.default_rng(3)
    e = jnp.asarray(rng.standard_normal(nc), jnp.float32)
    om = 0.9
    want = u + om * ops.prolong(p_st, e, shape)
    got = leg3d.prolong_correct_3d(u, e, om, taps[1], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_3d_cycle_step_lowering_equivalence():
    """The full lowered 3D V-cycle step matches the generic path when the
    leg3d branches are forced on (interpret mode, plane-blocked kernels
    disabled via a size where they would refuse anyway is impractical on
    CPU — instead compare Pallas-on vs Pallas-off directly)."""
    from evostencils_tpu.problems.poisson import poisson_3d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu.config import config

    problem = poisson_3d(max_level=5, min_level=3)
    problem.dtype = np.float32
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=1, omega=1.15,
                    partitioning=part.RedBlack,
                    coarse_operator=problem.coarsest_operator)
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    b = problem.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(lowered.default_omegas, dtype=jnp.float32)

    from evostencils_tpu.ops.pallas import rbgs3d
    old_pallas = config.use_pallas_kernels
    old_budget = rbgs3d._VMEM_BUDGET
    try:
        config.use_pallas_kernels = False
        ref = lowered.step(u0, b, om)
        config.use_pallas_kernels = True
        # starve the plane-blocked kernel so the two-axis path is taken
        rbgs3d._VMEM_BUDGET = 1
        out = lowered.step(u0, b, om)
    finally:
        config.use_pallas_kernels = old_pallas
        rbgs3d._VMEM_BUDGET = old_budget
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=2e-5)
    assert float(jnp.abs(out[0]).max()) > 0
