"""Per-field block-shape terminals + block-solve-plan lattice correctness.

Reference parity: the grammar enumerates independent block shapes per field
(reference grammar/multigrid.py:388-407), so a 2-field system may smooth
field u with (1,2) blocks and field v with (2,1) blocks.  The executor's
batched plan must then use a lattice that tiles EVERY entry's period
exactly (per-axis lcm) — a max-based lattice cuts couplings of a period
that does not divide it and silently inverts the wrong operator.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from evostencils_tpu.compiler.lower import _Lowering, dense_inverse
from evostencils_tpu.grammar import gp
from evostencils_tpu.grammar.multigrid import generate_primitive_set
from evostencils_tpu.ir import smoother
from evostencils_tpu.problems.elasticity import linear_elasticity_2d
from evostencils_tpu.problems.poisson import poisson_2d


def _fields_of(problem, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal(tuple(g.size)))
                 for g in problem.finest_grid)


def _local_inverse_matches_dense(problem, block_shapes):
    bd = smoother.generate_collective_block_jacobi(
        problem.level_contexts[0].operator, block_shapes)
    fields = _fields_of(problem)
    out = _Lowering(None, None, None)._system_local_inverse(bd, fields)
    inv = dense_inverse(bd)
    x = np.concatenate([np.asarray(f).reshape(-1) for f in fields])
    y = inv @ x
    off = 0
    for f, o in zip(fields, out):
        n = int(np.prod(f.shape))
        np.testing.assert_allclose(np.asarray(o).reshape(-1),
                                   y[off:off + n], atol=1e-10)
        off += n


class TestPerFieldBlockShapes:
    def test_mixed_shapes_match_dense_inverse(self):
        # (2,1) and (3,1): 2 does not divide 3, so the plan lattice must
        # be the lcm (6,1) — the max (3,1) would drop (2,1) couplings
        problem = linear_elasticity_2d(max_level=3, min_level=2)
        _local_inverse_matches_dense(problem, [(2, 1), (3, 1)])

    def test_mixed_anisotropic_shapes_match_dense_inverse(self):
        problem = linear_elasticity_2d(max_level=3, min_level=2)
        _local_inverse_matches_dense(problem, [(1, 2), (2, 1)])

    def test_uniform_shapes_still_match(self):
        problem = linear_elasticity_2d(max_level=3, min_level=2)
        _local_inverse_matches_dense(problem, [(2, 2), (2, 2)])

    def test_grammar_enumerates_per_field_terminals(self):
        problem = linear_elasticity_2d(max_level=4, min_level=3)
        pset, _ = generate_primitive_set(
            problem.approximation, problem.rhs_entity,
            problem.level_contexts, problem.coarsest_operator,
            maximum_local_system_size=8)
        names = set(pset.mapping)
        assert "bs_1x2_2x1" in names        # mixed per-field combination
        assert "bs_2x2" in names            # uniform keeps the compact name
        # every enumerated combination respects the size bound
        for name, payload in pset.context.items():
            if name.startswith("bs_"):
                total = sum(int(np.prod(s)) for s in payload)
                assert 2 < total <= 8

    def test_scalar_grammar_names_unchanged(self):
        problem = poisson_2d(max_level=4, min_level=3)
        pset, _ = generate_primitive_set(
            problem.approximation, problem.rhs_entity,
            problem.level_contexts, problem.coarsest_operator,
            maximum_local_system_size=8)
        names = {n for n in pset.mapping if n.startswith("bs_")}
        assert "bs_2x2" in names and "bs_1x2" in names
        assert not any("_" in n[3:] for n in names)   # no mixed for 1 field

    def test_evolution_uses_mixed_block_smoother(self):
        """A tree carrying a mixed per-field block shape must compile and
        evaluate to finite fitness on the system problem."""
        from evostencils_tpu.evaluation.evaluator import CycleEvaluator
        problem = linear_elasticity_2d(max_level=4, min_level=3)
        pset, _ = generate_primitive_set(
            problem.approximation, problem.rhs_entity,
            problem.level_contexts, problem.coarsest_operator,
            maximum_local_system_size=8)
        rng = random.Random(5)
        mixed = None
        for _ in range(400):
            ind = gp.genGrow(pset, 2, 40, rng=rng)
            if any("_" in n.name[3:] for n in ind
                   if n.name.startswith("bs_")):
                mixed = ind
                break
        assert mixed is not None, "no tree sampled a mixed block shape"
        evaluator = CycleEvaluator(problem)
        res = evaluator.evaluate_population([mixed], pset)[0]
        assert np.isfinite(res.convergence_factor)
