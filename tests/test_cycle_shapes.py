"""F-/W-cycle builders and batched population evaluation at scale.

BASELINE.json north-star configs: evolved V/F-cycles (Helmholtz target)
and "64 evolved cycles batch-evaluated on 3D Poisson".
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from evostencils_tpu.compiler.cycles import v_cycle, f_cycle
from evostencils_tpu.compiler.lower import lower_cycle
from evostencils_tpu.compiler.solve import measure_solve
from evostencils_tpu.ir import partitioning as part
from evostencils_tpu.grammar import gp
from evostencils_tpu.grammar.multigrid import generate_primitive_set
from evostencils_tpu.evaluation.evaluator import CycleEvaluator
from evostencils_tpu.problems.poisson import poisson_2d, poisson_3d


def _solve_with(builder, problem, **kwargs):
    cyc = builder(problem.level_contexts, problem.rhs_entity,
                  pre_smoothing=2, post_smoothing=1, omega=1.15,
                  partitioning=part.RedBlack,
                  coarse_operator=problem.coarsest_operator, **kwargs)
    low = lower_cycle(cyc, problem.approximation, problem.rhs_entity)
    return measure_solve(low, problem.build_rhs(), max_iterations=50,
                         target_reduction=1e-12)


class TestCycleShapes:
    def test_f_cycle_converges_at_least_as_fast_as_v(self):
        problem = poisson_2d(max_level=7, min_level=3)
        res_v = _solve_with(v_cycle, problem)
        res_f = _solve_with(f_cycle, problem)
        assert res_f.convergence_factor < 0.25
        assert res_f.iterations <= res_v.iterations

    def test_w_cycle_converges(self):
        problem = poisson_2d(max_level=6, min_level=3)
        res_w = _solve_with(v_cycle, problem, gamma=2)
        assert res_w.convergence_factor < 0.25
        assert res_w.iterations < 15


class TestPopulationBatch:
    def test_64_individuals_batch_evaluate_on_3d_poisson(self):
        """BASELINE.json config 5 (single-host slice of it): 64 evolved
        cycles, grouped by structure, vmapped over relaxation factors."""
        problem = poisson_3d(max_level=3, min_level=2)
        pset, _ = generate_primitive_set(
            problem.approximation, problem.rhs_entity,
            problem.level_contexts, problem.coarsest_operator)
        rng = random.Random(42)
        individuals = [gp.genGrow(pset, 0, 40, rng=rng) for _ in range(64)]
        evaluator = CycleEvaluator(problem)
        results = evaluator.evaluate_population(individuals, pset)
        assert len(results) == 64
        finite = [r for r in results
                  if r.convergence_factor < evaluator.infinity]
        # a healthy share of random trees must actually solve the problem
        assert len(finite) >= 16
        # structure grouping means far fewer compilations than individuals
        assert evaluator.compilations < 64
