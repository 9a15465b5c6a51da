"""Unit tests: stencil algebra vs dense matrices (SURVEY.md §4 test pyramid)."""

import numpy as np
import pytest

from evostencils_tpu.stencils import constant, periodic, gallery
from evostencils_tpu.grids import unit_interval_grid, coarsen
from evostencils_tpu.ops import apply as ops


def grid2d(level=4):
    return unit_interval_grid(2, level)


class TestConstantAlgebra:
    def test_normalization_merges_offsets(self):
        s = constant.Stencil([((0, 0), 1.0), ((0, 0), 2.0), ((1, 0), -1.0)])
        assert s.value_at((0, 0)) == 3.0
        assert s.number_of_entries == 2

    def test_add_sub_scale(self):
        a = gallery.Poisson2D().generate_stencil(grid2d())
        b = constant.scale(2.0, a)
        assert constant.sub(b, a) == a
        assert constant.add(a, a) == b

    def test_splits_partition(self):
        a = gallery.Poisson2D().generate_stencil(grid2d())
        d, l, u = constant.diagonal(a), constant.lower(a), constant.upper(a)
        assert constant.add(constant.add(d, l), u) == a
        assert d.number_of_entries == 1
        assert l.number_of_entries == 2 and u.number_of_entries == 2

    def test_transpose_matches_dense(self):
        g = grid2d(3)
        a = constant.Stencil([((0, 0), 4.0), ((1, 0), -1.0), ((0, -1), -2.0)])
        At = ops.dense_matrix(constant.transpose(a), g)
        A = ops.dense_matrix(a, g)
        np.testing.assert_allclose(At, A.T)

    def test_compose_matches_dense_product_interior(self):
        # Composition equals the matrix product away from the boundary.
        g = grid2d(4)
        a = gallery.Poisson2D().generate_stencil(g)
        prod = constant.mul(a, a)
        A = ops.dense_matrix(a, g)
        P = ops.dense_matrix(prod, g)
        A2 = A @ A
        # compare rows of interior points only (distance >= 2 from boundary)
        shape = g.size
        for idx in np.ndindex(*shape):
            if all(2 <= i < n - 2 for i, n in zip(idx, shape)):
                row = np.ravel_multi_index(idx, shape)
                np.testing.assert_allclose(P[row], A2[row], rtol=1e-12)

    def test_inverse_diagonal(self):
        d = constant.Stencil([((0, 0), 4.0)])
        inv = constant.inverse(d)
        assert inv.value_at((0, 0)) == 0.25
        with pytest.raises(ValueError):
            constant.inverse(gallery.Poisson2D().generate_stencil(grid2d()))


class TestPeriodicAlgebra:
    def test_constant_lift_roundtrip(self):
        a = gallery.Poisson2D().generate_stencil(grid2d())
        ps = periodic.from_constant(a)
        assert ps.is_constant and ps.to_constant() == a

    def test_lcm_period_add(self):
        dim = 1
        s1 = constant.Stencil([((0,), 1.0)])
        s2 = constant.Stencil([((0,), 10.0)])
        a = periodic.PeriodicStencil(np.array([s1, s2], dtype=object))          # period 2
        b = periodic.PeriodicStencil(np.array([s1, s1, s2], dtype=object))      # period 3
        c = periodic.add(a, b)
        assert c.period == (6,)
        vals = [c[i].value_at((0,)) for i in range(6)]
        # a(i) = 1 if i even else 10; b(i) = 10 if i%3==2 else 1
        assert vals == [2.0, 11.0, 11.0, 11.0, 2.0, 20.0]

    def test_red_black_filters_sum_to_identity(self):
        a = gallery.Poisson2D().generate_stencil(grid2d())
        red, black = periodic.red_black_partitioning(a, grid2d())
        total = periodic.add(red, black)
        for s in total.constant_entries():
            assert s == constant.unit(2)

    def test_block_diagonal_matches_dense(self):
        g = grid2d(3)  # 7x7 interior
        a = gallery.Poisson2D().generate_stencil(g)
        bd = periodic.block_diagonal(a, (2, 2))
        M = ops.dense_matrix(bd, g)
        A = ops.dense_matrix(a, g)
        shape = g.size
        # entries within an aligned block are kept, others dropped.
        # block anchor uses node index = interior index + 1
        for r_idx in np.ndindex(*shape):
            for c_idx in np.ndindex(*shape):
                r = np.ravel_multi_index(r_idx, shape)
                c = np.ravel_multi_index(c_idx, shape)
                same_block = all((ri + 1) // 2 == (ci + 1) // 2
                                 for ri, ci in zip(r_idx, c_idx))
                if same_block:
                    assert M[r, c] == A[r, c]
                else:
                    assert M[r, c] == 0.0

    def test_periodic_mul_exact_composition(self):
        # red filter * A == dense(red) @ dense(A)
        g = grid2d(3)
        a = gallery.Poisson2D().generate_stencil(g)
        red, black = periodic.red_black_partitioning(a, g)
        comp = periodic.mul(red, periodic.from_constant(a))
        np.testing.assert_allclose(
            ops.dense_matrix(comp, g),
            ops.dense_matrix(red, g) @ ops.dense_matrix(a, g), rtol=1e-13)


class TestApply:
    def test_apply_matches_dense(self):
        import jax.numpy as jnp
        g = grid2d(4)
        a = gallery.Poisson2D().generate_stencil(g)
        rng = np.random.default_rng(0)
        u = rng.standard_normal(g.size)
        out = ops.apply_constant(a, jnp.asarray(u))
        A = ops.dense_matrix(a, g)
        np.testing.assert_allclose(np.asarray(out).reshape(-1),
                                   A @ u.reshape(-1), rtol=1e-12)

    def test_apply_periodic_matches_dense(self):
        import jax.numpy as jnp
        g = grid2d(3)
        a = gallery.Poisson2D().generate_stencil(g)
        red, _ = periodic.red_black_partitioning(a, g)
        masked = periodic.mul(red, periodic.from_constant(a))
        rng = np.random.default_rng(1)
        u = rng.standard_normal(g.size)
        out = ops.apply_periodic(masked, jnp.asarray(u))
        M = ops.dense_matrix(masked, g)
        np.testing.assert_allclose(np.asarray(out).reshape(-1),
                                   M @ u.reshape(-1), rtol=1e-12)

    def test_restrict_prolong_match_dense(self):
        import jax.numpy as jnp
        fine = grid2d(4)
        coarse = coarsen(fine)
        R = gallery.FullWeightingRestrictionGenerator((2, 2)).generate_stencil(fine)
        P = gallery.MultilinearInterpolationGenerator((2, 2)).generate_stencil(fine)
        rng = np.random.default_rng(2)
        uf = rng.standard_normal(fine.size)
        uc = rng.standard_normal(coarse.size)
        Rd = ops.dense_restriction_matrix(R, fine, coarse)
        Pd = ops.dense_prolongation_matrix(P, fine, coarse)
        np.testing.assert_allclose(
            np.asarray(ops.restrict(R, jnp.asarray(uf))).reshape(-1),
            Rd @ uf.reshape(-1), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ops.prolong(P, jnp.asarray(uc), fine.size)).reshape(-1),
            Pd @ uc.reshape(-1), rtol=1e-12)

    def test_prolongation_is_scaled_restriction_transpose(self):
        fine = grid2d(4)
        coarse = coarsen(fine)
        R = gallery.FullWeightingRestrictionGenerator((2, 2)).generate_stencil(fine)
        P = gallery.MultilinearInterpolationGenerator((2, 2)).generate_stencil(fine)
        Rd = ops.dense_restriction_matrix(R, fine, coarse)
        Pd = ops.dense_prolongation_matrix(P, fine, coarse)
        np.testing.assert_allclose(Pd, (2 ** 2) * Rd.T, rtol=1e-12)


class TestTreeAnalyses:
    def test_find_independent_field_sets(self):
        from evostencils_tpu.ir import base, system, transformations
        from evostencils_tpu.grids import unit_interval_grid
        from evostencils_tpu.stencils import gallery
        g = unit_interval_grid(2, 4)
        A = base.Operator("A", g, gallery.Poisson2D())
        Z = base.ZeroOperator(g)
        # block-diagonal 2x2 system: fields decouple
        op = system.Operator("S", [[A, Z], [Z, A]])
        assert transformations.find_independent_field_sets(op) == [[0], [1]]
        # coupled system: one group
        op2 = system.Operator("S2", [[A, A], [Z, A]])
        assert transformations.find_independent_field_sets(op2) == [[0, 1]]

    def test_expression_to_dot(self, tmp_path):
        from evostencils_tpu.ir import transformations
        from evostencils_tpu.ir.reference_cycles import (
            generate_v_22_cycle_two_grid)
        from evostencils_tpu.problems.poisson import poisson_2d
        problem = poisson_2d(max_level=4, min_level=3)
        cycle = generate_v_22_cycle_two_grid(
            problem.level_contexts[0], problem.coarsest_operator,
            problem.rhs_entity)
        out = tmp_path / "tree.dot"
        text = transformations.expression_to_dot(cycle, str(out))
        assert text.startswith("digraph")
        assert "Cycle" in text and "->" in text
        assert out.read_text() == text
