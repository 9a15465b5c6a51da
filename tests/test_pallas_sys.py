"""Block-system Pallas sweep kernels vs the generic coupled path
(interpret mode on the CPU test platform).

The fused system kernels (ops/pallas/rbgs_sys.py) must match the masked
coupled half-sweep math of lower.py's generic path (reference semantics:
coupled RB-GS over the elasticity (u, v) system, /root/reference
example_problems/LinearElasticity/2D_FD_LinearElasticity_fromL2.exa3
:2-16)."""

import numpy as np
import jax.numpy as jnp
import pytest

from evostencils_tpu.ops.pallas import rbgs_sys
from evostencils_tpu.stencils.constant import Stencil

# elasticity-like blocks: 5-point stars on the diagonal, corner
# cross-derivative couplings off it
C00 = (5.0, -1.0, -1.0, -1.2, -1.2, 0.0, 0.0, 0.0, 0.0)
C11 = (6.0, -1.3, -1.3, -1.0, -1.0, 0.0, 0.0, 0.0, 0.0)
C01 = (0.0, 0.0, 0.0, 0.0, 0.0, 0.3, -0.3, -0.3, 0.3)
C10 = C01
COEFFS = ((C00, C01), (C10, C11))
MINV = ((1 / 5.0, 0.0), (0.0, 1 / 6.0))


def _apply9(c, u):
    n, m = u.shape
    up = jnp.pad(u, 1)
    return sum(v * up[1 + o0:1 + o0 + n, 1 + o1:1 + o1 + m]
               for v, (o0, o1) in zip(c, rbgs_sys.NINE_OFFSETS) if v != 0.0)


def _ref_half(us, bs, om, parity):
    n, m = us[0].shape
    rs = [bs[i] - sum(_apply9(COEFFS[i][j], us[j]) for j in range(2))
          for i in range(2)]
    upds = [om * sum(MINV[i][j] * rs[j] for j in range(2) if MINV[i][j])
            for i in range(2)]
    if parity < 0:
        return [u + d for u, d in zip(us, upds)]
    ii = jnp.arange(n)[:, None] + jnp.arange(m)[None, :]
    mask = (ii % 2) == parity
    return [u + jnp.where(mask, d, 0.0) for u, d in zip(us, upds)]


def _random_fields(n, m, seed):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
            for _ in range(2)]


@pytest.mark.parametrize("n,m", [(257, 255), (129, 130), (96, 140)])
def test_fused_sys_rbgs_matches_masked_halfsweeps(n, m):
    us = _random_fields(n, m, 1)
    bs = _random_fields(n, m, 2)
    om = jnp.asarray(1.25, jnp.float32)
    want = _ref_half(_ref_half(us, bs, om, 0), bs, om, 1)
    got = rbgs_sys.fused_rbgs_sweep_sys(us, bs, om, COEFFS, MINV,
                                        interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=0, atol=5e-6)


def test_fused_sys_jacobi_matches_full_update():
    n, m = 257, 255
    us = _random_fields(n, m, 3)
    bs = _random_fields(n, m, 4)
    om = jnp.asarray(0.8, jnp.float32)
    want = _ref_half(us, bs, om, -1)
    got = rbgs_sys.jacobi_sweep_sys(us, bs, om, COEFFS, MINV,
                                    interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=0, atol=5e-6)


def test_nine_point_coeffs():
    st = Stencil([((0, 0), 4.0), ((-1, 1), -0.5), ((1, -1), 0.5)])
    c = rbgs_sys.nine_point_coeffs(st)
    assert c[0] == 4.0
    assert c[rbgs_sys.NINE_OFFSETS.index((-1, 1))] == -0.5
    # outside the 3x3 box -> None
    st_far = Stencil([((0, 0), 4.0), ((2, 0), 1.0)])
    assert rbgs_sys.nine_point_coeffs(st_far) is None
    # complex -> None
    st_cx = Stencil([((0, 0), 4.0 - 1j)])
    assert rbgs_sys.nine_point_coeffs(st_cx) is None


def test_elasticity_lowering_fused_matches_generic():
    """Coupled elasticity V-cycle through lower_cycle with the Pallas
    gate forced on (interpret mode) must match the generic system path."""
    from evostencils_tpu.problems.elasticity import linear_elasticity_2d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu import config as cfgmod

    def run():
        p = linear_elasticity_2d(max_level=8, min_level=5)
        p.dtype = np.float32
        cyc = v_cycle(p.level_contexts, p.rhs_entity, pre_smoothing=2,
                      post_smoothing=1, omega=1.25,
                      partitioning=part.RedBlack,
                      coarse_operator=p.coarsest_operator)
        low = lower_cycle(cyc, p.approximation, p.rhs_entity)
        b = p.build_rhs()
        u = tuple(jnp.zeros_like(x) for x in b)
        om = jnp.asarray(low.default_omegas, jnp.float32)
        for _ in range(3):
            u = low.step(u, b, om)
        return np.asarray(u[0]), np.asarray(u[1])

    old = cfgmod.config.use_pallas_kernels
    try:
        cfgmod.config.use_pallas_kernels = False
        ref = run()
        cfgmod.config.use_pallas_kernels = True
        got = run()
    finally:
        cfgmod.config.use_pallas_kernels = old
    assert any(np.max(np.abs(g - r)) > 0 for g, r in zip(got, ref)), \
        "fused system path did not engage"
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=0,
                                   atol=2e-4 * max(np.max(np.abs(r)), 1e-30))
