"""Wavefront 3D down-leg (ops/pallas/wavefront3d.py) equals the
two-axis-blocked leg sequence in interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evostencils_tpu.ops.pallas import leg3d, wavefront3d


STENCIL = (6.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0)   # 7-point Laplacian
DINV = 1.0 / 6.0
TAPS = ((0.25, 0.5, 0.25),) * 3


@pytest.mark.parametrize("shape", [(31, 31, 31), (33, 31, 35)])
def test_wavefront_downleg_matches_leg3d(shape):
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    om1, om2 = 1.15, 0.9

    # reference: two separate fused sweeps, then the residual by hand
    u_ref = leg3d.fused_rbgs_sweep_3d2(u, b, jnp.float32(om1), STENCIL,
                                       DINV, interpret=True)
    u_ref = leg3d.fused_rbgs_sweep_3d2(u_ref, b, jnp.float32(om2), STENCIL,
                                       DINV, interpret=True)
    pad = jnp.pad(u_ref, 1)
    au = (STENCIL[0] * u_ref
          + STENCIL[1] * pad[:-2, 1:-1, 1:-1]
          + STENCIL[2] * pad[2:, 1:-1, 1:-1]
          + STENCIL[3] * pad[1:-1, :-2, 1:-1]
          + STENCIL[4] * pad[1:-1, 2:, 1:-1]
          + STENCIL[5] * pad[1:-1, 1:-1, :-2]
          + STENCIL[6] * pad[1:-1, 1:-1, 2:])
    r_ref = np.asarray(b - au)
    # half-restriction reference: 3-tap decimation over axes 0 and 1
    nc = tuple((s - 1) // 2 for s in shape)
    t = TAPS[0]
    ra = (t[0] * r_ref[0:2 * nc[0]:2] + t[1] * r_ref[1:2 * nc[0] + 1:2]
          + t[2] * r_ref[2:2 * nc[0] + 2:2])
    t = TAPS[1]
    rb_ref = (t[0] * ra[:, 0:2 * nc[1]:2] + t[1] * ra[:, 1:2 * nc[1] + 1:2]
              + t[2] * ra[:, 2:2 * nc[1] + 2:2])
    # r5: the lane (axis 2) contraction runs in-kernel too — the kernel
    # returns the FULL restriction
    t = TAPS[2]
    rc_ref = (t[0] * rb_ref[:, :, 0:2 * nc[2]:2]
              + t[1] * rb_ref[:, :, 1:2 * nc[2] + 1:2]
              + t[2] * rb_ref[:, :, 2:2 * nc[2] + 2:2])

    u_wf, rc = wavefront3d.downleg_wavefront_3d(
        u, b, (om1, om2), STENCIL, DINV, TAPS, interpret=True)

    assert u_wf.shape == u.shape
    np.testing.assert_allclose(np.asarray(u_wf), np.asarray(u_ref),
                               rtol=0, atol=2e-5)
    assert rc.shape == nc
    np.testing.assert_allclose(np.asarray(rc), rc_ref,
                               rtol=0, atol=2e-5)


def test_3d_cycle_step_wavefront_equivalence(monkeypatch):
    """The lowered 3D V(2,1) step with the wavefront legs enabled equals
    the generic-XLA step, and the wavefront kernels actually run."""
    from evostencils_tpu.problems.poisson import poisson_3d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu.config import config

    problem = poisson_3d(max_level=6, min_level=3)     # 63^3 fine grid
    problem.dtype = np.float32
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=1, omega=1.15,
                    partitioning=part.RedBlack,
                    coarse_operator=problem.coarsest_operator)
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    b = problem.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(lowered.default_omegas, dtype=jnp.float32)

    calls = {"down": 0, "up": 0}
    orig_down = wavefront3d.downleg_wavefront_3d
    orig_up = wavefront3d.upleg_wavefront_3d

    def spy_down(*a, **k):
        calls["down"] += 1
        return orig_down(*a, **k)

    def spy_up(*a, **k):
        calls["up"] += 1
        return orig_up(*a, **k)

    monkeypatch.setattr(wavefront3d, "downleg_wavefront_3d", spy_down)
    monkeypatch.setattr(wavefront3d, "upleg_wavefront_3d", spy_up)

    old_pallas = config.use_pallas_kernels
    try:
        config.use_pallas_kernels = False
        ref = lowered.step(u0, b, om)
        config.use_pallas_kernels = True
        out = lowered.step(u0, b, om)
    finally:
        config.use_pallas_kernels = old_pallas
    assert calls["down"] >= 1 and calls["up"] >= 1
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=2e-5)
    assert float(jnp.abs(out[0]).max()) > 0


@pytest.mark.parametrize("shape", [(31, 31, 31)])
def test_wavefront_upleg_matches_leg3d(shape):
    rng = np.random.default_rng(9)
    nc = tuple((s - 1) // 2 for s in shape)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    e = jnp.asarray(rng.standard_normal(nc), jnp.float32)
    om_c, om_s = 0.9, 1.15

    u_ref = leg3d.prolong_correct_3d(u, e, jnp.float32(om_c), TAPS,
                                     interpret=True)
    u_ref = leg3d.fused_rbgs_sweep_3d2(u_ref, b, jnp.float32(om_s),
                                       STENCIL, DINV, interpret=True)

    u_wf = wavefront3d.upleg_wavefront_3d(
        u, e, b, om_c, om_s, STENCIL, DINV, TAPS, interpret=True)
    assert u_wf.shape == u.shape
    np.testing.assert_allclose(np.asarray(u_wf), np.asarray(u_ref),
                               rtol=0, atol=2e-5)


def test_wavefront_downleg_b4_matches_b2():
    """B=4 (half the sequential grid steps) computes the same down-leg
    as the shipped B=2 to f32 rounding (block-boundary masked-update
    order differs, so not bitwise)."""
    rng = np.random.default_rng(5)
    shape = (33, 31, 35)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    u2, rc2 = wavefront3d.downleg_wavefront_3d(
        u, b, (1.15, 0.9), STENCIL, DINV, TAPS, interpret=True)
    u4, rc4 = wavefront3d.downleg_wavefront_3d(
        u, b, (1.15, 0.9), STENCIL, DINV, TAPS, interpret=True, block=4)
    np.testing.assert_allclose(np.asarray(u4), np.asarray(u2),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(rc4), np.asarray(rc2),
                               rtol=0, atol=2e-6)


def test_wavefront_upleg_b4_matches_b2():
    rng = np.random.default_rng(9)
    shape = (33, 31, 35)
    nc = tuple((s - 1) // 2 for s in shape)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    e = jnp.asarray(rng.standard_normal(nc), jnp.float32)
    u2 = wavefront3d.upleg_wavefront_3d(u, e, b, 0.9, 1.15, STENCIL, DINV,
                                        TAPS, interpret=True, block=2)
    u4 = wavefront3d.upleg_wavefront_3d(u, e, b, 0.9, 1.15, STENCIL, DINV,
                                        TAPS, interpret=True, block=4)
    np.testing.assert_allclose(np.asarray(u4), np.asarray(u2),
                               rtol=0, atol=2e-6)
