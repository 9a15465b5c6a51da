"""FAS grammar seed parity (round 5): the grammar-built hand-tuned FAS
V(2,2) must match the library ``fas_v_cycle`` — which requires the
coarse level to be seeded with the restricted solution exactly as the
reference's FAS backend does (exastencils_FAS.py:118-133 assigns the
coarse solution field from the restriction before smoothing)."""

import numpy as np
import jax
import pytest

from evostencils_tpu.problems.fas import fas_2d_basic
from evostencils_tpu.grammar.multigrid import generate_primitive_set
from evostencils_tpu.grammar.seeds import fas_v_cycle_string
from evostencils_tpu.grammar import gp
from evostencils_tpu.ir import transformations
from evostencils_tpu.compiler.lower import lower_cycle
from evostencils_tpu.compiler.cycles import fas_v_cycle
from evostencils_tpu.compiler.solve import measure_solve


def _measure(problem, cycle):
    transformations.assign_cycle_ids(cycle)
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    return measure_solve(lowered, problem.build_rhs(), max_iterations=60,
                         target_reduction=1e-10, samples=1)


def test_fas_seed_matches_library_cycle():
    problem = fas_2d_basic(max_level=7, min_level=4)
    problem.dtype = np.float64
    pset, _ = generate_primitive_set(
        problem.approximation, problem.rhs_entity, problem.level_contexts,
        problem.coarsest_operator, FAS=True)
    tree = gp.parse_tree(fas_v_cycle_string(3, 7), pset)
    expr = gp.compile_tree(tree, pset)[0]
    res_grammar = _measure(problem, expr)
    assert res_grammar.converged
    # textbook nonlinear FAS contraction, not the zero-start 0.95
    assert res_grammar.convergence_factor < 0.2

    lib = fas_v_cycle(problem.level_contexts, problem.rhs_entity,
                      coarse_operator=problem.coarsest_operator)
    res_lib = _measure(problem, lib)
    assert res_grammar.iterations == res_lib.iterations
    assert res_grammar.convergence_factor == pytest.approx(
        res_lib.convergence_factor, rel=1e-6)


def test_fas_picard_seed_parses_and_converges():
    problem = fas_2d_basic(max_level=6, min_level=4)
    problem.dtype = np.float64
    pset, _ = generate_primitive_set(
        problem.approximation, problem.rhs_entity, problem.level_contexts,
        problem.coarsest_operator, FAS=True)
    tree = gp.parse_tree(
        fas_v_cycle_string(2, 6, smoother="jacobi_picard", omega=0.8), pset)
    expr = gp.compile_tree(tree, pset)[0]
    res = _measure(problem, expr)
    assert res.converged
