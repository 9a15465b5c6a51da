"""Variable-coefficient leg super-fusion (rbgs_var super kernels +
lower.py var5 fusion signature): the fused V-cycle step must match the
generic lowering for both Jacobi (Single) and red-black partitionings."""

import numpy as np
import jax.numpy as jnp
import pytest

from evostencils_tpu.compiler.cycles import v_cycle
from evostencils_tpu.compiler.lower import lower_cycle
from evostencils_tpu.config import config
from evostencils_tpu.ir import partitioning as part
from evostencils_tpu.problems.poisson import poisson_2d_variable


@pytest.mark.parametrize("partitioning,omega", [(part.Single, 0.8),
                                                (part.RedBlack, 1.0)])
def test_var_cycle_step_fused_equals_generic(partitioning, omega):
    problem = poisson_2d_variable(max_level=8, min_level=5)
    problem.dtype = np.float32
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=1, omega=omega,
                    partitioning=partitioning,
                    coarse_operator=problem.coarsest_operator)
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    b = problem.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(lowered.default_omegas, dtype=jnp.float32)

    old = config.use_pallas_kernels
    try:
        config.use_pallas_kernels = False
        ref = lowered.step(u0, b, om)
        config.use_pallas_kernels = True   # interpret mode off-TPU
        out = lowered.step(u0, b, om)
    finally:
        config.use_pallas_kernels = old
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=3e-5)
    assert float(jnp.abs(out[0]).max()) > 0


def test_var_super_plan_matches(monkeypatch):
    """The var5 signature actually fires: the super-fusion planner finds
    the pre-smooth chain of the variable-coefficient cycle."""
    from evostencils_tpu.compiler import lower as L
    problem = poisson_2d_variable(max_level=7, min_level=5)
    problem.dtype = np.float32
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=1, omega=0.8,
                    partitioning=part.Single,
                    coarse_operator=problem.coarsest_operator)
    by_smoother, by_mult = L._plan_super_fusions(cycle)
    assert by_mult, "no var5 super-fusion plan found"
    assert all(p["sig"][0] == "var5" for p in by_mult.values())
    posts = L._plan_post_fusions(cycle)
    assert posts and all(p["sig"][0] == "var5" for p in posts.values())
