"""Block-system leg super-fusion (rbgs_sys super kernels + lower.py sys9
fusion signature): the fused elasticity V-cycle step must match the
generic lowering."""

import numpy as np
import jax.numpy as jnp
import pytest

from evostencils_tpu.compiler.cycles import v_cycle
from evostencils_tpu.compiler.lower import lower_cycle
from evostencils_tpu.config import config
from evostencils_tpu.ir import partitioning as part
from evostencils_tpu.ir import smoother
from evostencils_tpu.problems.elasticity import linear_elasticity_2d


@pytest.mark.parametrize("partitioning,factory", [
    (part.RedBlack, smoother.generate_collective_jacobi),
    (part.Single, smoother.generate_collective_jacobi),
    (part.RedBlack, smoother.generate_decoupled_jacobi),
])
def test_sys_cycle_step_fused_equals_generic(partitioning, factory):
    problem = linear_elasticity_2d(max_level=8, min_level=5)
    problem.dtype = np.float32
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=1, omega=1.25,
                    partitioning=partitioning, smoother_factory=factory,
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
    scale = max(float(jnp.abs(r).max()) for r in ref) or 1.0
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=3e-5 * scale)
    assert float(jnp.abs(out[0]).max()) > 0


def test_sys_super_plan_matches():
    from evostencils_tpu.compiler import lower as L
    problem = linear_elasticity_2d(max_level=7, min_level=5)
    problem.dtype = np.float32
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=1, omega=1.25,
                    partitioning=part.RedBlack,
                    coarse_operator=problem.coarsest_operator)
    by_smoother, by_mult = L._plan_super_fusions(cycle)
    assert by_mult, "no sys9 super-fusion plan found"
    assert all(p["sig"][0] == "sys9" for p in by_mult.values())
    posts = L._plan_post_fusions(cycle)
    assert posts and all(p["sig"][0] == "sys9" for p in posts.values())
