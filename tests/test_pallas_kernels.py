"""Pallas smoother kernels vs the XLA reference path (interpret mode).

The TPU kernels (ops/pallas/rbgs.py) run in Pallas interpret mode on the
CPU test platform; they must match the masked half-sweep math that
lower.py's generic path implements (reference semantics:
exastencils color-with RB sweeps, /root/reference
code_generation/exastencils.py:659-682)."""

import numpy as np
import jax.numpy as jnp
import pytest

from evostencils_tpu.ops.pallas import rbgs

VALS = (4.0, -1.0, -1.0, -1.0, -1.0)
DINV = 0.25


def _ref_half(u, b, om, parity, n, m):
    up = jnp.pad(u, 1)
    au = sum(v * up[1 + o0:1 + o0 + n, 1 + o1:1 + o1 + m]
             for v, (o0, o1) in zip(
                 VALS, [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]))
    upd = om * DINV * (b - au)
    if parity < 0:
        return u + upd
    ii = jnp.arange(n)[:, None] + jnp.arange(m)[None, :]
    return u + jnp.where((ii % 2) == parity, upd, 0.0)


@pytest.mark.parametrize("n,m", [(257, 255), (129, 130), (96, 140)])
def test_rbgs_matches_reference(n, m):
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    om = jnp.asarray(1.15, jnp.float32)
    want = _ref_half(_ref_half(u, b, om, 0, n, m), b, om, 1, n, m)
    got = rbgs.rbgs_sweep(u, b, om, VALS, DINV, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("n,m", [(257, 255), (256, 128), (300, 200),
                                 (129, 130), (96, 140)])
def test_fused_rbgs_matches_two_pass(n, m):
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    om = jnp.asarray(1.15, jnp.float32)
    want = rbgs.rbgs_sweep(u, b, om, VALS, DINV, interpret=True)
    got = rbgs.fused_rbgs_sweep(u, b, om, VALS, DINV, interpret=True)
    # different block decompositions reassociate the stencil sum -> 1 ulp
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


def test_jacobi_matches_reference():
    n, m = 200, 133
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    om = jnp.asarray(0.8, jnp.float32)
    want = _ref_half(u, b, om, -1, n, m)
    got = rbgs.jacobi_sweep(u, b, om, VALS, DINV, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


# ---------------------------------------------------------------------------
# fused transfer kernels (ops/pallas/transfer.py)
# ---------------------------------------------------------------------------

from evostencils_tpu.ops.pallas import transfer


def _ref_residual(u, b):
    n, m = u.shape
    up = jnp.pad(u, 1)
    au = sum(v * up[1 + o0:1 + o0 + n, 1 + o1:1 + o1 + m]
             for v, (o0, o1) in zip(
                 VALS, [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]))
    return b - au


@pytest.mark.parametrize("n,m", [(513, 511), (511, 513), (521, 300)])
def test_residual_rowrestrict_matches_reference(n, m):
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    taps = (0.25, 0.5, 0.25)
    r = _ref_residual(u, b)
    nc = (n - 1) // 2
    want = (taps[0] * r[0:2 * nc:2] + taps[1] * r[1:2 * nc + 1:2]
            + taps[2] * r[2:2 * nc + 2:2])
    got = transfer.residual_rowrestrict(u, b, VALS, taps, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-6)


@pytest.mark.parametrize("n,m", [(513, 511), (511, 513), (521, 300)])
def test_prolong_row_correct_matches_reference(n, m):
    rng = np.random.default_rng(8)
    nc = (n - 1) // 2
    u = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((nc, m)), jnp.float32)
    taps = (0.5, 1.0, 0.5)
    om = 0.8
    # reference: scatter c to odd fine rows, apply row taps, add
    emb = jnp.zeros((n, m), jnp.float32).at[1::2].set(c)
    ep = jnp.pad(emb, ((1, 1), (0, 0)))
    pe = taps[0] * ep[2:] + taps[1] * ep[1:-1] + taps[2] * ep[:-2]
    want = u + om * pe
    got = transfer.prolong_row_correct(u, c, om, taps, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-6)


def test_fused_lowering_matches_generic_path():
    """Full V-cycle through lower_cycle with the Pallas fusion gate forced
    on (interpret mode on CPU) must match the generic XLA path."""
    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu import config as cfgmod

    def run():
        p = poisson_2d(max_level=9, min_level=6)
        p.dtype = np.float32
        cyc = v_cycle(p.level_contexts, p.rhs_entity, pre_smoothing=2,
                      post_smoothing=1, omega=1.15,
                      partitioning=part.RedBlack,
                      coarse_operator=p.coarsest_operator)
        low = lower_cycle(cyc, p.approximation, p.rhs_entity)
        b = p.build_rhs()
        u = tuple(jnp.zeros_like(x) for x in b)
        om = jnp.asarray(low.default_omegas, jnp.float32)
        for _ in range(3):
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
                               atol=1e-4 * np.max(np.abs(ref)))


@pytest.mark.parametrize("n,m", [(513, 511), (511, 513), (521, 300),
                                 (255, 255), (129, 140)])
@pytest.mark.parametrize("n_sweeps", [1, 2, 3])
def test_presmooth_residual_rowrestrict_matches_sequential(n, m, n_sweeps):
    """Super-kernel == S sequential fused RB sweeps + residual + row
    restriction."""
    rng = np.random.default_rng(9)
    u = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    omegas = [jnp.asarray(w, jnp.float32)
              for w in (1.15, 0.8, 1.3)[:n_sweeps]]
    taps = (0.25, 0.5, 0.25)
    us = u
    for om in omegas:
        us = rbgs.rbgs_sweep(us, b, om, VALS, DINV, interpret=True)
    want_rr = transfer.residual_rowrestrict(us, b, VALS, taps,
                                            interpret=True)
    got_us, got_rr = transfer.presmooth_residual_rowrestrict(
        u, b, omegas, VALS, taps, interpret=True)
    np.testing.assert_allclose(np.asarray(got_us), np.asarray(us),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_rr), np.asarray(want_rr),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("n,m", [(513, 511), (511, 513), (255, 255)])
@pytest.mark.parametrize("n_sweeps", [1, 2])
def test_prolong_correct_postsmooth_matches_sequential(n, m, n_sweeps):
    """Up-leg super-kernel == prolong-correct + S sequential RB sweeps."""
    rng = np.random.default_rng(11)
    nc = (n - 1) // 2
    u = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((nc, m)), jnp.float32)
    taps = (0.5, 1.0, 0.5)
    omegas = [jnp.asarray(w, jnp.float32)
              for w in (0.9, 1.15, 0.8)[:n_sweeps + 1]]
    want = transfer.prolong_row_correct(u, c, omegas[0], taps,
                                        interpret=True)
    for om in omegas[1:]:
        want = rbgs.rbgs_sweep(want, b, om, VALS, DINV, interpret=True)
    got = transfer.prolong_correct_postsmooth(u, c, b, omegas, VALS, taps,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)
