"""Variable-coefficient Pallas sweep kernels vs the generic StencilField
path (interpret mode on the CPU test platform).

The fused kernels (ops/pallas/rbgs_var.py) must match the masked
half-sweep math the generic lower.py path implements through
StencilField.apply (reference semantics: color-with RB sweeps over a
variable-coefficient operator, /root/reference
code_generation/exastencils.py:659-682 + stencils/gallery.py:87-185)."""

import numpy as np
import jax.numpy as jnp
import pytest

from evostencils_tpu.ops.apply import StencilField
from evostencils_tpu.ops.pallas import rbgs_var


def _random_field(n, m, seed):
    """Diagonally dominant variable-coefficient 5-point StencilField."""
    rng = np.random.default_rng(seed)
    offsets = list(rbgs_var.FIVE_POINT_OFFSETS)
    center = 4.0 + rng.uniform(0.0, 2.0, (n, m))
    neigh = [-1.0 + rng.uniform(-0.2, 0.2, (n, m)) for _ in range(4)]
    return StencilField(offsets, [center] + neigh)


def _ref_half(sf, u, b, om, parity):
    au = sf.apply(u).astype(u.dtype)
    d = jnp.asarray(np.asarray(sf.diagonal_field()), u.dtype)
    upd = om * (b - au) / d
    if parity < 0:
        return u + upd
    n, m = u.shape
    ii = jnp.arange(n)[:, None] + jnp.arange(m)[None, :]
    return u + jnp.where((ii % 2) == parity, upd, 0.0)


@pytest.mark.parametrize("n,m", [(257, 255), (129, 130), (96, 140),
                                 (300, 200)])
def test_fused_var_rbgs_matches_masked_halfsweeps(n, m):
    sf = _random_field(n, m, 1)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    om = jnp.asarray(1.15, jnp.float32)
    want = _ref_half(sf, _ref_half(sf, u, b, om, 0), b, om, 1)
    stack = rbgs_var.five_point_stack(sf, jnp.float32)
    got = rbgs_var.fused_rbgs_sweep_var(u, b, om, stack, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-6)


@pytest.mark.parametrize("n,m", [(257, 255), (96, 140)])
def test_fused_var_jacobi_matches_full_update(n, m):
    sf = _random_field(n, m, 3)
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    om = jnp.asarray(0.8, jnp.float32)
    want = _ref_half(sf, u, b, om, -1)
    stack = rbgs_var.five_point_stack(sf, jnp.float32)
    got = rbgs_var.jacobi_sweep_var(u, b, om, stack, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-6)


def test_five_point_stack_rejects_other_shapes():
    # 9-point offsets -> None
    sf9 = StencilField([(0, 0), (1, 1)],
                       [np.ones((8, 8)), np.ones((8, 8))])
    assert rbgs_var.five_point_stack(sf9, jnp.float32) is None
    # complex coefficients -> None
    sfc = StencilField([(0, 0)], [np.ones((8, 8), complex)])
    assert rbgs_var.five_point_stack(sfc, jnp.float32) is None
    # missing offsets are zero-filled
    sf3 = StencilField([(0, 0), (-1, 0)],
                       [4 * np.ones((8, 8)), -np.ones((8, 8))])
    stack = rbgs_var.five_point_stack(sf3, jnp.float32)
    assert stack.shape == (5, 8, 8)
    np.testing.assert_array_equal(np.asarray(stack[2]), 0.0)


def test_var_lowering_fused_matches_generic():
    """Full variable-coefficient V-cycle through lower_cycle with the
    Pallas gate forced on (interpret mode) must match the generic path."""
    from evostencils_tpu.problems.poisson import poisson_2d_variable
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu import config as cfgmod

    def run(partitioning):
        p = poisson_2d_variable(max_level=8, min_level=5)
        p.dtype = np.float32
        cyc = v_cycle(p.level_contexts, p.rhs_entity, pre_smoothing=2,
                      post_smoothing=1, omega=1.0,
                      partitioning=partitioning,
                      coarse_operator=p.coarsest_operator)
        low = lower_cycle(cyc, p.approximation, p.rhs_entity)
        b = p.build_rhs()
        u = tuple(jnp.zeros_like(x) for x in b)
        om = jnp.asarray(low.default_omegas, jnp.float32)
        for _ in range(3):
            u = low.step(u, b, om)
        return np.asarray(u[0])

    old = cfgmod.config.use_pallas_kernels
    for partitioning in (part.RedBlack, part.Single):
        try:
            cfgmod.config.use_pallas_kernels = False
            ref = run(partitioning)
            cfgmod.config.use_pallas_kernels = True
            got = run(partitioning)
        finally:
            cfgmod.config.use_pallas_kernels = old
        np.testing.assert_allclose(got, ref, rtol=0,
                                   atol=1e-4 * np.max(np.abs(ref)))
