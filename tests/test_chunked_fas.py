"""Level-chunked runs for FAS nonlinear problems.

Round-2 gap: FAS + levels_per_run < levels raised NotImplementedError.
The chunk boundary now carries the restricted-solution initial guess into
the spliced coarser chunk (lower.make_chain_applier initial_guess /
apply_coarse_solver), matching the reference's generator-agnostic
chunking with its FAS backend (reference optimization/program.py:810-899,
code_generation/exastencils_FAS.py:440-446).
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from evostencils_tpu.compiler.cycles import fas_v_cycle
from evostencils_tpu.compiler.lower import (ChainLink, lower_composed,
                                            lower_cycle,
                                            make_chain_applier,
                                            operator_applier)
from evostencils_tpu.compiler.solve import make_solver
from evostencils_tpu.ir import base, system, transformations
from evostencils_tpu.optimization.program import Optimizer
from evostencils_tpu.problems.fas import fas_2d_basic


def _solve(lowered, b, max_iterations=40, target=1e-8):
    u0 = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(lowered.default_omegas)
    run = make_solver(lowered, max_iterations, target)
    u, k, hist = run(u0, b, om)
    return u, int(k), np.asarray(hist)


class TestChunkedFASComposition:
    def test_composed_chunks_equal_full_hierarchy(self):
        """fas_v_cycle(levels 0..1) spliced over fas_v_cycle(level 2) IS
        the 3-level fas_v_cycle: the composed program must reproduce the
        full-hierarchy residual stream (same algorithm, same numbers up to
        float reassociation)."""
        problem = fas_2d_basic(max_level=6, min_level=3)
        problem.dtype = np.float64
        contexts = problem.level_contexts
        b = problem.build_rhs()

        full = fas_v_cycle(contexts, problem.rhs_entity,
                           coarse_operator=problem.coarsest_operator)
        lowered_full = lower_cycle(full, problem.approximation,
                                   problem.rhs_entity)
        u_f, k_f, hist_f = _solve(lowered_full, b)
        assert hist_f[k_f] <= 1e-8 * hist_f[0]

        # chunk 1: finest two levels, coarse op = level below
        chunk1 = fas_v_cycle(contexts[0:2], problem.rhs_entity,
                             coarse_operator=contexts[2].operator)
        # chunk 2: the remaining level, bound to fresh chunk entities
        g2 = contexts[2].grid
        rhs2 = system.RightHandSide(
            "b_c", [base.RightHandSide("b_c", g) for g in g2])
        approx2 = contexts[2].approximation
        chunk2 = fas_v_cycle(contexts[2:3], rhs2,
                             coarse_operator=problem.coarsest_operator)
        chain = [ChainLink(chunk1, problem.approximation,
                           problem.rhs_entity)]
        lowered_comp = lower_composed(chain, chunk2, approx2, rhs2)
        u_c, k_c, hist_c = _solve(lowered_comp, b)

        assert k_c == k_f
        np.testing.assert_allclose(hist_c[:k_c + 1], hist_f[:k_f + 1],
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(u_c[0]), np.asarray(u_f[0]),
                                   rtol=1e-7, atol=1e-12)

    def test_chain_applier_initial_guess_reaches_coarse_solve(self):
        """The spliced chunk must start from the provided initial guess,
        not zero: seeded at the exact solution the cycle keeps the
        nonlinear residual tiny relative to the zero-start residual."""
        problem = fas_2d_basic(max_level=5, min_level=3)
        cycle = fas_v_cycle(problem.level_contexts, problem.rhs_entity,
                            coarse_operator=problem.coarsest_operator)
        transformations.assign_cycle_ids(cycle)
        omegas = jnp.asarray(
            [float(c.relaxation_factor) for c in
             transformations.find_nodes(cycle, base.Cycle)])
        applier = make_chain_applier(cycle, problem.approximation,
                                     problem.rhs_entity)
        b = problem.build_rhs()
        exact = tuple(jnp.asarray(x) for x in problem.exact_solution())
        mv = operator_applier(problem.level_contexts[0].operator)

        out_seeded = applier(b, omegas, initial_guess=exact)
        r_seeded = float(jnp.abs(b[0] - mv(out_seeded)[0]).max())
        r_zero_initial = float(jnp.abs(b[0]).max())
        assert r_seeded < 1e-3 * r_zero_initial
        out_zero = applier(b, omegas)
        assert np.isfinite(float(jnp.abs(out_zero[0]).max()))


class TestChunkedFASEvolution:
    """The optimizer-level plumbing: chunked FAS runs execute end to end
    (chain built, grammar strings stored, re-evaluation parses) — small
    FAS evolutions rarely FIND converging cycles in a few generations, so
    fitness finiteness is not asserted here (the composition test above
    pins the numerics)."""

    kwargs = dict(mu_=4, lambda_=4, population_initialization_factor=2,
                  generations=2, levels_per_run=2, verbose=False)

    def test_chunked_fas_run_builds_chain(self, tmp_path):
        opt = Optimizer(fas_2d_basic(max_level=5, min_level=2),
                        rng=random.Random(11),
                        checkpoint_directory_path=str(tmp_path))
        result = opt.evolutionary_optimization(**self.kwargs)
        assert len(result["chunk_grammar_strings"]) == 2
        assert len(result["chain"]) == 1
        # re-evaluation machinery parses and rebuilds the same program
        expr, res = opt.evaluate_chunked_program(
            result["chunk_grammar_strings"], levels_per_run=2)
        assert res is not None
