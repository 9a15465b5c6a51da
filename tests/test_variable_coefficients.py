"""Variable-coefficient operators run as true per-node coefficient fields
(reference gallery.py:87-185 freezes them at one sample position; here the
StencilField path is the executable operator)."""

import numpy as np
import jax.numpy as jnp

from evostencils_tpu.stencils import gallery
from evostencils_tpu.grids import Grid
from evostencils_tpu.ops.apply import StencilField
from evostencils_tpu.problems.poisson import poisson_2d_variable
from evostencils_tpu.compiler.cycles import v_cycle
from evostencils_tpu.compiler.lower import lower_cycle
from evostencils_tpu.compiler.solve import make_solver
from evostencils_tpu.ir import partitioning as part


def test_stencil_field_matches_dense_and_symmetry():
    gen = gallery.Poisson2DVariableCoefficients()
    grid = Grid((15, 15), (1 / 16, 1 / 16), 4)
    sf = gen.generate_stencil_field(grid)
    assert isinstance(sf, StencilField)
    A = sf.dense_matrix()
    # -div(a grad u) with face coefficients is symmetric positive definite
    np.testing.assert_allclose(A, A.T, rtol=1e-12)
    eigs = np.linalg.eigvalsh(A)
    assert eigs.min() > 0
    # matvec path agrees with the dense matrix
    rng = np.random.default_rng(0)
    u = rng.standard_normal(grid.size)
    got = np.asarray(sf.apply(jnp.asarray(u)))
    want = (A @ u.ravel()).reshape(grid.size)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_field_varies_and_center_matches_frozen_stencil():
    gen = gallery.Poisson2DVariableCoefficients()
    grid = Grid((31, 31), (1 / 32, 1 / 32), 5)
    sf = gen.generate_stencil_field(grid)
    center = dict(zip(sf.offsets, sf.fields))[(0, 0)]
    assert np.asarray(center).std() > 1.0  # genuinely variable
    frozen = dict(gen.generate_stencil(grid).entries)[(0, 0)]
    # node nearest to the freeze position (0.5, 0.5) agrees
    i = 15  # x = 16/32 = 0.5
    np.testing.assert_allclose(np.asarray(center)[i, i], frozen, rtol=1e-12)


def test_variable_poisson_vcycle_converges():
    problem = poisson_2d_variable(max_level=6, min_level=3)
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=2, omega=0.8,
                    partitioning=part.Single,
                    coarse_operator=problem.coarsest_operator)
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    b = problem.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(lowered.default_omegas)
    run = make_solver(lowered, max_iterations=80, target_reduction=1e-12)
    u, k, hist = run(u0, b, om)
    k = int(k)
    hist = np.asarray(hist)
    assert hist[k] / hist[0] <= 1e-12
    rho = (hist[k] / hist[0]) ** (1.0 / k)
    # variable coefficients with rediscretized coarse ops: still mesh-quality
    assert rho < 0.35


def test_variable_poisson_3d_vcycle_converges():
    from evostencils_tpu.problems.poisson import poisson_3d_variable
    problem = poisson_3d_variable(max_level=4, min_level=2)
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=2, omega=0.8,
                    partitioning=part.Single,
                    coarse_operator=problem.coarsest_operator)
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    b = problem.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(lowered.default_omegas)
    run = make_solver(lowered, max_iterations=80, target_reduction=1e-10)
    u, k, hist = run(u0, b, om)
    k = int(k)
    hist = np.asarray(hist)
    assert hist[k] <= 1e-10 * hist[0] * (1 + 1e-9)
    rho = (hist[k] / hist[0]) ** (1 / k)
    assert rho < 0.35


def test_3d_stencil_field_symmetric_positive():
    gen = gallery.Poisson3DVariableCoefficients()
    grid = Grid((7, 7, 7), (1 / 8, 1 / 8, 1 / 8), 3)
    sf = gen.generate_stencil_field(grid)
    A = sf.dense_matrix()
    np.testing.assert_allclose(A, A.T, rtol=1e-12)
    assert np.linalg.eigvalsh(A).min() > 0


def test_almost_uniform_decomposition_matches_full_apply():
    """StencilField.apply's uniform / scalar+exceptional-rows fast paths
    (ops/apply.py _uniform_values) must be exact against the plain
    field-product apply for all three structures: fully uniform,
    uniform-except-two-rows (the Robin-fold pattern), genuinely varying."""
    import numpy as np
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    n, m = 17, 13
    u = jnp.asarray(rng.standard_normal((n, m)))
    offs = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]

    def dense_apply(sf, u):
        return sf.dense_matrix() @ np.asarray(u).ravel()

    # fully uniform
    sf_u = StencilField(offs, [np.full((n, m), c)
                               for c in (4.0, -1.0, -1.0, -1.0, -1.0)])
    assert all(d is not None and d[0] == "const"
               for d in sf_u._uniform_values())
    np.testing.assert_allclose(np.asarray(sf_u.apply(u)).ravel(),
                               dense_apply(sf_u, u), atol=1e-12)

    # Robin-fold pattern: diagonal uniform except first/last row
    diag = np.full((n, m), 4.0)
    diag[0, :] += 0.25
    diag[-1, :] += rng.standard_normal(m) * 0.1
    sf_r = StencilField(offs, [diag] + [np.full((n, m), -1.0)] * 4)
    descs = sf_r._uniform_values()
    assert descs[0] is not None and descs[0][0] == "rows" \
        and len(descs[0][2]) == 2
    np.testing.assert_allclose(np.asarray(sf_r.apply(u)).ravel(),
                               dense_apply(sf_r, u), atol=1e-12)

    # genuinely varying -> full-array path
    sf_v = StencilField(offs, [rng.standard_normal((n, m))
                               for _ in offs])
    assert sf_v._uniform_values()[0] is None
    np.testing.assert_allclose(np.asarray(sf_v.apply(u)).ravel(),
                               dense_apply(sf_v, u), atol=1e-12)
