"""Column-fused transfer kernels (ops/pallas/transfer.py lane-transfer
section) against the split row-kernel + dense banded GEMM path they
replace, and end-to-end cycle equivalence under the lowering knob.

The lane-axis 2:1 decimation rides the MXU in 128-lane chunks and the
1:2 expansion uses pltpu.repeat; both must reproduce the dense
`_col_restrict`/`_col_prolong` contraction up to float reassociation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evostencils_tpu.ops.pallas import transfer as pt
from evostencils_tpu.compiler.lower import _col_restrict, _col_prolong
from evostencils_tpu.config import config

VALS = (4.0, -1.0, -1.0, -1.0, -1.0)
R_TAPS = ((0.25, 0.5, 0.25), (0.25, 0.5, 0.25))
P_TAPS = ((0.5, 1.0, 0.5), (0.5, 1.0, 0.5))
SHAPES = [(131, 131), (259, 515), (131, 259)]


@pytest.fixture(autouse=True)
def _matmul_mode():
    old = config.column_transfers
    config.column_transfers = "matmul"
    yield
    config.column_transfers = old


def _data(n, m, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    e = jnp.asarray(rng.standard_normal(((n - 1) // 2, (m - 1) // 2)),
                    jnp.float32)
    return u, b, e


@pytest.mark.parametrize("shape", SHAPES)
def test_presmooth_residual_restrict(shape):
    n, m = shape
    u, b, _ = _data(n, m)
    oms = [1.15, 1.15]
    us0, rr = pt.presmooth_residual_rowrestrict(u, b, oms, VALS, R_TAPS[0],
                                                interpret=True)
    rc0 = _col_restrict(rr, R_TAPS[1], m)
    us1, rc1 = pt.presmooth_residual_restrict(u, b, oms, VALS, R_TAPS,
                                              interpret=True)
    np.testing.assert_allclose(us1, us0, atol=1e-6)
    np.testing.assert_allclose(rc1, rc0, atol=1e-5)


@pytest.mark.parametrize("shape", SHAPES)
def test_prolong_correct_postsmooth_col(shape):
    n, m = shape
    u, b, e = _data(n, m)
    oms = [1.0, 1.15]
    ch = _col_prolong(e, P_TAPS[1], m)
    o0 = pt.prolong_correct_postsmooth(u, ch, b, oms, VALS, P_TAPS[0],
                                       interpret=True)
    o1 = pt.prolong_correct_postsmooth_col(u, e, b, oms, VALS, P_TAPS,
                                           interpret=True)
    np.testing.assert_allclose(o1, o0, atol=1e-5)


@pytest.mark.parametrize("shape", SHAPES)
def test_upleg_downleg_col(shape):
    n, m = shape
    u, b, e = _data(n, m)
    oms = [1.0, 1.15, 1.15, 1.15]
    ch = _col_prolong(e, P_TAPS[1], m)
    v0, rr = pt.upleg_downleg_fused(u, ch, b, oms, VALS, P_TAPS[0],
                                    R_TAPS[0], interpret=True)
    rc0 = _col_restrict(rr, R_TAPS[1], m)
    v1, rc1 = pt.upleg_downleg_col(u, e, b, oms, VALS, P_TAPS, R_TAPS,
                                   interpret=True)
    np.testing.assert_allclose(v1, v0, atol=1e-5)
    np.testing.assert_allclose(rc1, rc0, atol=1e-4)


def test_cycle_step_equivalence_under_knob():
    """The full lowered V-cycle step produces the same result with fused
    and unfused column transfers (forcing the Pallas fusion paths in
    interpret mode on CPU)."""
    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part

    problem = poisson_2d(max_level=8, min_level=5)
    problem.dtype = np.float32
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=1, omega=1.15,
                    partitioning=part.RedBlack,
                    coarse_operator=problem.coarsest_operator)
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    b = problem.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    omegas = jnp.asarray(lowered.default_omegas, dtype=jnp.float32)

    old_pallas = config.use_pallas_kernels
    old_fused = config.fused_column_transfers
    config.use_pallas_kernels = True   # interpret mode off-TPU
    try:
        config.fused_column_transfers = False
        ref = lowered.step(u0, b, omegas)
        config.fused_column_transfers = True
        out = lowered.step(u0, b, omegas)
    finally:
        config.use_pallas_kernels = old_pallas
        config.fused_column_transfers = old_fused
    np.testing.assert_allclose(out[0], ref[0], atol=1e-5)
    assert float(jnp.abs(out[0]).max()) > 0
