"""Complex-stencil Pallas sweep kernels vs the generic complex path
(interpret mode on the CPU test platform).

The fused re/im-plane kernels (ops/pallas/rbgs_cx.py) must match the
masked complex half-sweep math of lower.py's generic path (reference
semantics: RB-GS over the shifted-Laplace preconditioner M,
/root/reference example_problems/Helmholtz/2D_FD_Helmholtz_fromL3.exa3
:55-77, :203-212)."""

import numpy as np
import jax.numpy as jnp
import pytest

from evostencils_tpu.ops.pallas import rbgs_cx
from evostencils_tpu.stencils.constant import Stencil

VALS = (4.0 - 0.5j, -1.0 + 0.02j, -1.0 + 0.02j, -1.0 - 0.01j, -1.0 - 0.01j)


def _ref_half(u, b, om, parity):
    n, m = u.shape
    up = jnp.pad(u, 1)
    au = sum(v * up[1 + o0:1 + o0 + n, 1 + o1:1 + o1 + m]
             for v, (o0, o1) in zip(
                 VALS, [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]))
    upd = om * (b - au) / VALS[0]
    if parity < 0:
        return u + upd
    ii = jnp.arange(n)[:, None] + jnp.arange(m)[None, :]
    return u + jnp.where((ii % 2) == parity, upd, 0.0)


def _random_cx(n, m, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((n, m))
                       + 1j * rng.standard_normal((n, m)), jnp.complex64)


@pytest.mark.parametrize("n,m", [(257, 255), (129, 130), (96, 140),
                                 (300, 200)])
def test_fused_cx_rbgs_matches_masked_halfsweeps(n, m):
    u = _random_cx(n, m, 1)
    b = _random_cx(n, m, 2)
    om = jnp.asarray(0.6, jnp.float32)
    want = _ref_half(_ref_half(u, b, om, 0), b, om, 1)
    got = rbgs_cx.fused_rbgs_sweep_cx(u, b, om, VALS, interpret=True)
    assert got.dtype == u.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-6)


def test_fused_cx_jacobi_matches_full_update():
    n, m = 257, 255
    u = _random_cx(n, m, 3)
    b = _random_cx(n, m, 4)
    om = jnp.asarray(0.8, jnp.float32)
    want = _ref_half(u, b, om, -1)
    got = rbgs_cx.jacobi_sweep_cx(u, b, om, VALS, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-6)


def test_complex_five_point_values():
    st = Stencil([((0, 0), 4.0 - 2j), ((-1, 0), -1.0), ((1, 0), -1.0),
                  ((0, -1), -1.0), ((0, 1), -1.0)])
    vals = rbgs_cx.complex_five_point_values(st)
    assert vals == (4.0 - 2j, -1.0, -1.0, -1.0, -1.0)
    # all-real stencil belongs to the real kernel, not this one
    st_real = Stencil([((0, 0), 4.0), ((-1, 0), -1.0), ((1, 0), -1.0),
                       ((0, -1), -1.0), ((0, 1), -1.0)])
    assert rbgs_cx.complex_five_point_values(st_real) is None
    # 9-point -> None
    st9 = Stencil([((0, 0), 4.0 - 2j), ((1, 1), -1.0)])
    assert rbgs_cx.complex_five_point_values(st9) is None


def _run_helmholtz_cycle(problem_fn):
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part

    p = problem_fn(max_level=8, min_level=5)
    p.dtype = np.float32  # -> complex64 grids
    cyc = v_cycle(p.level_contexts, p.rhs_entity, pre_smoothing=2,
                  post_smoothing=1, omega=0.6,
                  partitioning=part.RedBlack,
                  coarse_operator=p.coarsest_operator)
    low = lower_cycle(cyc, p.approximation, p.rhs_entity)
    b = p.build_rhs()
    u = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(low.default_omegas, jnp.float32)
    for _ in range(3):
        u = low.step(u, b, om)
    return np.asarray(u[0])


def _ab_pallas(problem_fn):
    from evostencils_tpu import config as cfgmod
    old = cfgmod.config.use_pallas_kernels
    try:
        cfgmod.config.use_pallas_kernels = False
        ref = _run_helmholtz_cycle(problem_fn)
        cfgmod.config.use_pallas_kernels = True
        got = _run_helmholtz_cycle(problem_fn)
    finally:
        cfgmod.config.use_pallas_kernels = old
    return got, ref


def _dirichlet_helmholtz(max_level, min_level):
    """Shifted-Laplace problem with a CONSTANT stencil everywhere
    (plain Dirichlet — no Robin fold, no stencil field), the pattern the
    fused complex kernel accepts."""
    from evostencils_tpu.problems import helmholtz as hh

    class ConstGen:
        def __init__(self, k, shift=0.0):
            self.k = k
            self.shift = shift

        def generate_stencil(self, grid):
            return hh._helmholtz_stencil(grid, self.k, self.shift)

    p = hh.helmholtz_2d(max_level=max_level, min_level=min_level)
    from evostencils_tpu.ir import base, system
    from evostencils_tpu.problems.api import LevelContext
    contexts = []
    for ctx in p.level_contexts:
        g = ctx.grid[0]
        op = system.Operator(ctx.operator.name, [[base.Operator(
            "M", g, ConstGen(hh.K_DEFAULT, hh.SHIFT))]])
        contexts.append(LevelContext(
            operator=op, restriction=ctx.restriction,
            prolongation=ctx.prolongation,
            approximation=ctx.approximation, grid=ctx.grid))
    g_min = p.coarsest_operator.entries[0][0].grid
    p.coarsest_operator = system.Operator(
        p.coarsest_operator.name, [[base.Operator(
            "M", g_min, ConstGen(hh.K_DEFAULT, hh.SHIFT))]])
    p.level_contexts = contexts
    return p


def test_helmholtz_const_lowering_fused_matches_generic():
    """With a constant complex stencil the fused cx kernel must ENGAGE
    (results differ in rounding from the generic path) and match it."""
    got, ref = _ab_pallas(_dirichlet_helmholtz)
    assert np.max(np.abs(got - ref)) > 0  # fused path actually engaged
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=2e-4 * np.max(np.abs(ref)))


def test_helmholtz_robin_fused_path_disengages():
    """The Robin-folded operator has position-dependent boundary columns
    (problems/helmholtz.py HelmholtzOperatorGenerator.generate_stencil_field)
    — the constant-stencil kernel would smooth those columns with the
    interior stencil, so the lowering must NOT engage it: the Pallas A/B
    is bit-identical because both runs take the generic path.  Regression
    test for the id-reuse stencil-field cache bug (compiler/lower.py
    _stencil_field_of, fixed 2026-08-21) which let the fused kernel
    engage on exactly this operator."""
    from evostencils_tpu.problems.helmholtz import helmholtz_2d
    got, ref = _ab_pallas(helmholtz_2d)
    assert np.array_equal(got, ref)
