"""The hand-assembled reference cycles (ir/reference_cycles.py) behave like
textbook multigrid — the same role the reference's module plays as
executable documentation + known-good fixture."""

import numpy as np
import jax.numpy as jnp

from evostencils_tpu.ir import reference_cycles
from evostencils_tpu.compiler.lower import lower_cycle
from evostencils_tpu.compiler.solve import make_solver, measure_solve
from evostencils_tpu.problems.poisson import poisson_2d
from evostencils_tpu.problems.fas import fas_2d_basic


def _solve(problem, cycle, max_iterations=60, target=1e-12):
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    b = problem.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(lowered.default_omegas)
    run = make_solver(lowered, max_iterations=max_iterations,
                      target_reduction=target)
    u, k, hist = run(u0, b, om)
    k = int(k)
    hist = np.asarray(hist)
    return hist[k] / hist[0], (hist[k] / hist[0]) ** (1.0 / max(k, 1)), k


def test_v22_two_grid_textbook_rho():
    problem = poisson_2d(max_level=6, min_level=5)
    cycle = reference_cycles.generate_v_22_cycle_two_grid(
        problem.level_contexts[0], problem.coarsest_operator,
        problem.rhs_entity)
    reduction, rho, k = _solve(problem, cycle)
    assert reduction <= 1e-12
    # RB-GS V(2,2) two-grid on Poisson: rho well under 0.1
    assert rho < 0.1


def test_v22_three_grid_matches_two_grid_quality():
    problem = poisson_2d(max_level=6, min_level=4)
    cycle = reference_cycles.generate_v_22_cycle_three_grid(
        problem.level_contexts[0], problem.level_contexts[1],
        problem.coarsest_operator, problem.rhs_entity)
    reduction, rho, k = _solve(problem, cycle)
    assert reduction <= 1e-12
    assert rho < 0.12


def test_fas_v22_two_grid_converges():
    problem = fas_2d_basic(max_level=5, min_level=4)
    cycle = reference_cycles.generate_fas_v_22_cycle_two_grid(
        problem.level_contexts[0], problem.coarsest_operator,
        problem.rhs_entity)
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    result = measure_solve(lowered, problem.build_rhs(), max_iterations=80,
                           target_reduction=1e-10, samples=1)
    assert result.converged


def test_fas_v22_three_grid_converges():
    problem = fas_2d_basic(max_level=5, min_level=3)
    cycle = reference_cycles.generate_fas_v_22_cycle_three_grid(
        problem.level_contexts[0], problem.level_contexts[1],
        problem.coarsest_operator, problem.rhs_entity)
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    result = measure_solve(lowered, problem.build_rhs(), max_iterations=80,
                           target_reduction=1e-10, samples=1)
    assert result.converged
