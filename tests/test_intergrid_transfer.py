"""CMA-ES transfer-weight tuning (reference optimization/intergrid_transfer.py).

The tuned two-grid CGC must beat the same cycle with default full-weighting
/ multilinear transfers, and the returned IR nodes must slot into a level
context and still converge.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from evostencils_tpu.problems.poisson import poisson_2d
from evostencils_tpu.optimization import intergrid_transfer
from evostencils_tpu.optimization.cma import CMAES
from evostencils_tpu.ops.transfer_weights import (restrict_weighted,
                                                  prolong_weighted)
from evostencils_tpu.ops import apply as ops_apply
from evostencils_tpu.stencils import gallery


def test_cma_minimizes_sphere():
    es = CMAES([3.0] * 6, sigma=1.0, seed=1)
    for _ in range(100):
        pop = es.ask()
        es.tell(pop, (pop ** 2).sum(axis=1))
    assert float((es.mean ** 2).sum()) < 1e-6


def test_weighted_transfers_match_stencil_path():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((31, 31)))
    R = gallery.FullWeightingRestrictionGenerator((2, 2)).generate_stencil(None)
    P = gallery.MultilinearInterpolationGenerator((2, 2)).generate_stencil(None)
    wr = jnp.asarray([[0.25 * 0.25, 0.5 * 0.25, 0.25 * 0.25],
                      [0.25 * 0.5, 0.25, 0.5 * 0.25],
                      [0.25 * 0.25, 0.5 * 0.25, 0.25 * 0.25]])
    # full-weighting kernel = outer((1/4,1/2,1/4),(1/4,1/2,1/4))
    wr = jnp.outer(jnp.asarray([0.25, 0.5, 0.25]),
                   jnp.asarray([0.25, 0.5, 0.25]))
    got = restrict_weighted(u, wr)
    want = ops_apply.restrict(R, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)

    uc = jnp.asarray(rng.standard_normal((15, 15)))
    wp = jnp.outer(jnp.asarray([0.5, 1.0, 0.5]), jnp.asarray([0.5, 1.0, 0.5]))
    got_p = prolong_weighted(uc, wp, (31, 31))
    want_p = ops_apply.prolong(P, uc, (31, 31))
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-12, atol=1e-12)


def test_tuned_transfers_beat_default():
    problem = poisson_2d(max_level=5, min_level=4)
    result = intergrid_transfer.optimize(
        problem, generations=15, operator_range=1, smoothing_steps=1,
        measure_iterations=8, seed=2)
    # never worse than the textbook full-weighting/bilinear pair (the
    # default transfers are the tuner's starting incumbent)
    assert result.convergence_factor <= result.default_convergence_factor
    assert result.convergence_factor < 0.7
    assert len(result.history) == 15
    # returned IR nodes are well-formed stencils
    st = result.restriction.entries[0][0].generate_stencil()
    assert st.dimension == 2 and st.number_of_entries == 9
