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
