"""End-to-end cycle executor tests: textbook multigrid behavior
(SURVEY.md §4: V(2,2)/V(2,1) on Poisson must hit 1e-12 with textbook rho)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evostencils_tpu.compiler.cycles import v_cycle
from evostencils_tpu.compiler.lower import lower_cycle
from evostencils_tpu.compiler.solve import measure_solve
from evostencils_tpu.ir import partitioning as part
from evostencils_tpu.ir import smoother
from evostencils_tpu.problems.poisson import poisson_2d, poisson_3d


def build_and_solve(problem, *, pre=2, post=1, omega=1.15,
                    partitioning=part.RedBlack, max_iterations=100,
                    smoother_factory=smoother.generate_collective_jacobi):
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=pre, post_smoothing=post, omega=omega,
                    partitioning=partitioning,
                    smoother_factory=smoother_factory,
                    coarse_operator=problem.coarsest_operator)
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    b = problem.build_rhs()
    return measure_solve(lowered, b, max_iterations=max_iterations,
                         target_reduction=problem.target_reduction, samples=1)


class TestPoisson2D:
    def test_reference_vcycle_converges_to_1em12(self):
        # reference default solver: RB-GS omega=1.15, 2 pre / 1 post
        problem = poisson_2d(max_level=7, min_level=3)
        result = build_and_solve(problem)
        assert result.converged
        assert result.iterations <= 10  # textbook MG: ~7-9 iterations
        assert result.convergence_factor < 0.1

    def test_weighted_jacobi_vcycle(self):
        # V(1,1) with omega=0.8 weighted Jacobi: rho ~ 0.3-0.5
        problem = poisson_2d(max_level=6, min_level=3)
        result = build_and_solve(problem, pre=1, post=1, omega=0.8,
                                 partitioning=part.Single)
        assert result.converged
        assert result.convergence_factor < 0.6

    def test_rbgs_v22_textbook_rho(self):
        # V(2,2) RB-GS omega=1.0: rho well below 0.1 for 2D Poisson
        problem = poisson_2d(max_level=6, min_level=3)
        result = build_and_solve(problem, pre=2, post=2, omega=1.0)
        assert result.converged
        assert result.convergence_factor < 0.06

    def test_discretization_error_second_order(self):
        # the solve must reproduce u = cos(pi x) - sin(2 pi y) to O(h^2)
        errs = []
        for lvl in (5, 6):
            problem = poisson_2d(max_level=lvl, min_level=3)
            result = build_and_solve(problem)
            exact = problem.exact_solution()[0]
            errs.append(np.abs(np.asarray(result.solution[0]) - exact).max())
        assert errs[0] / errs[1] == pytest.approx(4.0, rel=0.2)  # O(h^2)

    def test_3d_quadratic_solution_exact(self):
        # FD Laplacian is exact on quadratics: discrete == analytic solution
        problem = poisson_3d(max_level=4, min_level=2)
        result = build_and_solve(problem)
        exact = problem.exact_solution()[0]
        assert np.abs(np.asarray(result.solution[0]) - exact).max() < 1e-9

    def test_mesh_independence(self):
        rhos = []
        for lvl in (5, 6, 7):
            problem = poisson_2d(max_level=lvl, min_level=3)
            result = build_and_solve(problem)
            rhos.append(result.convergence_factor)
        assert max(rhos) < 0.1
        assert max(rhos) - min(rhos) < 0.05  # h-independent convergence


class TestPoisson3D:
    def test_vcycle_converges(self):
        problem = poisson_3d(max_level=4, min_level=2)
        result = build_and_solve(problem)
        assert result.converged
        assert result.convergence_factor < 0.15


class TestSmootherVariants:
    def test_block_jacobi_smoother(self):
        problem = poisson_2d(max_level=5, min_level=3)

        def factory(op):
            return smoother.generate_collective_block_jacobi(op, [(2, 2)])

        # like point Jacobi, unweighted block Jacobi does not smooth;
        # omega=0.8 gives a proper smoother
        result = build_and_solve(problem, pre=1, post=1, omega=0.8,
                                 partitioning=part.Single,
                                 smoother_factory=factory)
        assert result.converged
        assert result.convergence_factor < 0.4

    def test_decoupled_jacobi_equals_collective_for_scalar(self):
        problem = poisson_2d(max_level=5, min_level=3)
        r1 = build_and_solve(problem, pre=1, post=1, omega=0.8,
                             partitioning=part.Single,
                             smoother_factory=smoother.generate_decoupled_jacobi)
        r2 = build_and_solve(problem, pre=1, post=1, omega=0.8,
                             partitioning=part.Single,
                             smoother_factory=smoother.generate_collective_jacobi)
        assert abs(r1.convergence_factor - r2.convergence_factor) < 1e-10


class TestOmegaVector:
    def test_traced_omegas_change_convergence(self):
        problem = poisson_2d(max_level=5, min_level=3)
        cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                        pre_smoothing=1, post_smoothing=1, omega=0.8,
                        partitioning=part.Single,
                        coarse_operator=problem.coarsest_operator)
        from evostencils_tpu.compiler.lower import lower_cycle
        lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
        b = problem.build_rhs()
        from evostencils_tpu.compiler.solve import measure_solve
        base_res = measure_solve(lowered, b, samples=1)
        # same compiled structure, different omegas
        bad = measure_solve(lowered, b,
                            omegas=jnp.full((lowered.n_omegas,), 0.3),
                            samples=1)
        assert bad.convergence_factor > base_res.convergence_factor
