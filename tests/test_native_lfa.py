"""Native (C++) LFA engine vs the numpy backend: identical spectral radii
across the problem families (the native engine is this build's counterpart
of the reference's C++ LFA Lab, SURVEY.md §2.3)."""

import numpy as np
import pytest

from evostencils_tpu.native import lfa_engine_available
from evostencils_tpu.prediction.convergence import ConvergenceEvaluator
from evostencils_tpu.compiler.cycles import v_cycle
from evostencils_tpu.ir import partitioning as part
from evostencils_tpu.problems.poisson import poisson_2d
from evostencils_tpu.problems.elasticity import linear_elasticity_2d

pytestmark = pytest.mark.skipif(not lfa_engine_available(),
                                reason="native LFA engine not built")


def _cycle(problem, partitioning, omega=1.0, pre=2, post=1):
    return v_cycle(problem.level_contexts, problem.rhs_entity,
                   pre_smoothing=pre, post_smoothing=post, omega=omega,
                   partitioning=partitioning,
                   coarse_operator=problem.coarsest_operator)


@pytest.mark.parametrize("partitioning,omega", [
    (part.RedBlack, 1.15),
    (part.Single, 0.8),
])
def test_poisson_native_matches_numpy(partitioning, omega):
    problem = poisson_2d(max_level=8, min_level=5)
    cycle = _cycle(problem, partitioning, omega)
    r_np = ConvergenceEvaluator(2, backend="numpy").compute_spectral_radius(
        cycle)
    r_nat = ConvergenceEvaluator(2, backend="native").compute_spectral_radius(
        cycle)
    assert r_np > 0
    np.testing.assert_allclose(r_nat, r_np, rtol=1e-6)


def test_elasticity_block_system_native_matches_numpy():
    problem = linear_elasticity_2d(max_level=6, min_level=5)
    cycle = _cycle(problem, part.RedBlack, 1.0)
    r_np = ConvergenceEvaluator(2, backend="numpy").compute_spectral_radius(
        cycle)
    r_nat = ConvergenceEvaluator(2, backend="native").compute_spectral_radius(
        cycle)
    assert r_np > 0
    np.testing.assert_allclose(r_nat, r_np, rtol=1e-6)


def test_auto_backend_prefers_native():
    ev = ConvergenceEvaluator(2, backend="auto")
    assert ev.backend_name == "native"
