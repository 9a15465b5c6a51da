"""3D Pallas smoother kernels vs the XLA reference path (interpret mode).

The fused 7-point red-black kernel (ops/pallas/rbgs3d.py) must match the
masked half-sweep math of lower.py's generic path — node-parity coloring
(i+1)+(j+1)+(k+1) as in the reference's generated 3D solvers
(/root/reference example_problems/Poisson/3D_FD_Poisson_fromL2.exa2:11-20,
code_generation/exastencils.py:659-682)."""

import numpy as np
import jax.numpy as jnp
import pytest

from evostencils_tpu.ops.pallas import rbgs3d

VALS = (6.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0)
DINV = 1.0 / 6.0


def _ref_half(u, b, om, parity):
    n0, n1, n2 = u.shape
    up = jnp.pad(u, 1)
    au = sum(v * up[1 + o0:1 + o0 + n0, 1 + o1:1 + o1 + n1,
                    1 + o2:1 + o2 + n2]
             for v, (o0, o1, o2) in zip(VALS, rbgs3d.SEVEN_OFFSETS))
    upd = om * DINV * (b - au)
    if parity < 0:
        return u + upd
    ii = (jnp.arange(n0)[:, None, None] + jnp.arange(n1)[None, :, None]
          + jnp.arange(n2)[None, None, :])
    # red = even node parity = odd interior-index sum (3 axes, origin 1)
    mask = (ii % 2) == (1 - parity)
    return u + jnp.where(mask, upd, 0.0)


@pytest.mark.parametrize("shape", [(31, 31, 129), (16, 33, 130),
                                   (37, 9, 140), (4, 8, 128)])
def test_fused_rb3d_matches_reference(shape):
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    om = jnp.asarray(1.15, jnp.float32)
    want = _ref_half(_ref_half(u, b, om, 0), b, om, 1)
    got = rbgs3d.fused_rbgs_sweep_3d(u, b, om, VALS, DINV, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-6)


@pytest.mark.parametrize("shape", [(31, 31, 129), (12, 40, 200)])
def test_jacobi3d_matches_reference(shape):
    rng = np.random.default_rng(6)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    om = jnp.asarray(0.8, jnp.float32)
    want = _ref_half(u, b, om, -1)
    got = rbgs3d.jacobi_sweep_3d(u, b, om, VALS, DINV, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-6)


def test_anisotropic_coefficients():
    """Distinct per-direction coefficients route to the right neighbors."""
    vals = (7.0, -0.5, -1.5, -0.25, -2.0, -0.75, -1.0)
    rng = np.random.default_rng(7)
    shape = (10, 16, 128)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    om = jnp.asarray(1.0, jnp.float32)
    n0, n1, n2 = shape
    up = jnp.pad(u, 1)
    au = sum(v * up[1 + o0:1 + o0 + n0, 1 + o1:1 + o1 + n1,
                    1 + o2:1 + o2 + n2]
             for v, (o0, o1, o2) in zip(vals, rbgs3d.SEVEN_OFFSETS))
    want = u + om * (1.0 / 7.0) * (b - au)
    got = rbgs3d.jacobi_sweep_3d(u, b, om, vals, 1.0 / 7.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-6)


def test_fused_3d_lowering_matches_generic_path():
    """3D Poisson V-cycle with the Pallas gate forced on (interpret mode)
    must match the generic XLA lowering."""
    from evostencils_tpu.problems.poisson import poisson_3d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu import config as cfgmod

    def run():
        # level 6 = 63^3: wide enough for the fused gate (supports())
        p = poisson_3d(max_level=6, min_level=3)
        p.dtype = np.float32
        cyc = v_cycle(p.level_contexts, p.rhs_entity, pre_smoothing=2,
                      post_smoothing=1, omega=1.0,
                      partitioning=part.RedBlack,
                      coarse_operator=p.coarsest_operator)
        low = lower_cycle(cyc, p.approximation, p.rhs_entity)
        b = p.build_rhs()
        u = tuple(jnp.zeros_like(x) for x in b)
        om = jnp.asarray(low.default_omegas, jnp.float32)
        for _ in range(2):
            u = low.step(u, b, om)
        return np.asarray(u[0])

    old = cfgmod.config.use_pallas_kernels
    try:
        cfgmod.config.use_pallas_kernels = False
        ref = run()
        cfgmod.config.use_pallas_kernels = True
        got = run()
    finally:
        cfgmod.config.use_pallas_kernels = old
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=1e-5 * max(np.max(np.abs(ref)), 1e-30))
