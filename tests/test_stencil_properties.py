"""Property-based tests: stencil algebra laws against dense matrices.

The reference has no tests at all (SURVEY.md §4); these pin the algebra
semantics (constant.py / periodic.py) to their dense-matrix meaning on
random stencils, the strongest form of the unit tests the build plan
calls for ("stencil algebra vs dense matrices")."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from evostencils_tpu.grids import unit_interval_grid
from evostencils_tpu.ops import apply as ap
from evostencils_tpu.stencils import constant, periodic


GRID = unit_interval_grid(2, 3)          # 7x7 interior


def dense(st_):
    return ap.dense_matrix(periodic.as_periodic(st_), GRID)


@st.composite
def stencils(draw, max_entries=4, radius=1):
    n = draw(st.integers(1, max_entries))
    entries = {}
    for _ in range(n):
        off = (draw(st.integers(-radius, radius)),
               draw(st.integers(-radius, radius)))
        val = draw(st.floats(-4, 4, allow_nan=False, width=32))
        entries[off] = entries.get(off, 0.0) + val
    return constant.Stencil(list(entries.items()))


@settings(max_examples=40, deadline=None)
@given(stencils(), stencils())
def test_add_matches_dense(a, b):
    got = dense(constant.add(a, b))
    np.testing.assert_allclose(got, dense(a) + dense(b), atol=1e-12)


@settings(max_examples=40, deadline=None)
@given(stencils(), stencils())
def test_mul_is_operator_composition(a, b):
    """Stencil composition == dense matrix product up to boundary rows.

    Stencil composition assumes translation invariance; on a finite
    Dirichlet grid the composed stencil and the matrix product differ in
    rows within 2*radius of the boundary, so compare interior rows only
    (offsets of a*b reach +-2)."""
    got = dense(constant.mul(a, b))
    want = dense(a) @ dense(b)
    nx, ny = GRID.size
    interior = [i * ny + j for i in range(2, nx - 2)
                for j in range(2, ny - 2)]
    np.testing.assert_allclose(got[np.ix_(interior, interior)],
                               want[np.ix_(interior, interior)],
                               atol=1e-10)


@settings(max_examples=40, deadline=None)
@given(stencils(), st.floats(-3, 3, allow_nan=False, width=32))
def test_scale_matches_dense(a, factor):
    np.testing.assert_allclose(dense(constant.scale(factor, a)),
                               factor * dense(a), atol=1e-12)


@settings(max_examples=40, deadline=None)
@given(stencils())
def test_transpose_matches_dense_T(a):
    np.testing.assert_allclose(dense(constant.transpose(a)),
                               dense(a).T, atol=1e-12)


@settings(max_examples=40, deadline=None)
@given(stencils())
def test_splits_partition_the_operator(a):
    """diagonal + lower + upper == whole stencil."""
    parts = (dense(constant.diagonal(a)) + dense(constant.lower(a))
             + dense(constant.upper(a)))
    np.testing.assert_allclose(parts, dense(a), atol=1e-12)


@settings(max_examples=30, deadline=None)
@given(stencils())
def test_apply_matches_dense_matvec(a):
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    u = rng.standard_normal(GRID.size)
    got = np.asarray(ap.apply_constant(a, jnp.asarray(u)))
    want = (dense(a) @ u.ravel()).reshape(GRID.size)
    np.testing.assert_allclose(got, want, atol=1e-8)


@settings(max_examples=20, deadline=None)
@given(stencils())
def test_diagonal_inverse(a):
    """inverse() of the diagonal part is its elementwise reciprocal."""
    diag = constant.diagonal(a)
    center = dict(diag.entries).get((0, 0), 0.0)
    if abs(center) < 1e-6:
        return
    inv = constant.inverse(diag)
    np.testing.assert_allclose(dense(inv) @ dense(diag),
                               np.eye(dense(a).shape[0]), atol=1e-8)
