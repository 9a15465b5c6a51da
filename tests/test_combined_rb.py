"""Combined red+black update form (config.combined_rb) is exactly the
two masked half-sweeps for 5-point operators."""

import numpy as np
import jax.numpy as jnp
import pytest

from evostencils_tpu.config import config
from evostencils_tpu.ops.pallas import transfer as ptransfer


VALS = (4.0, -1.0, -1.0, -1.0, -1.0)
TAPS = ((0.25, 0.5, 0.25), (0.25, 0.5, 0.25))


@pytest.fixture
def rb_flag():
    old = config.combined_rb
    yield
    config.combined_rb = old


def test_combined_rb_equals_masked(rb_flag):
    rng = np.random.default_rng(3)
    n, m = 63, 63
    u = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    omegas = [jnp.float32(1.15), jnp.float32(0.9)]
    outs = {}
    for flag in (False, True):
        config.combined_rb = flag
        us, rc = ptransfer.presmooth_residual_restrict(
            u, b, omegas, VALS, TAPS, interpret=True)
        outs[flag] = (np.asarray(us), np.asarray(rc))
    # exact identity up to fp reassociation
    np.testing.assert_allclose(outs[True][0], outs[False][0],
                               rtol=0, atol=5e-6)
    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               rtol=0, atol=5e-6)


def test_combined_rb_upleg_equals_masked(rb_flag):
    rng = np.random.default_rng(4)
    n, m = 63, 63
    nc, mc = 31, 31
    u = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    e = jnp.asarray(rng.standard_normal((nc, mc)), jnp.float32)
    omegas = [jnp.float32(0.8), jnp.float32(1.15)]
    outs = {}
    for flag in (False, True):
        config.combined_rb = flag
        out = ptransfer.prolong_correct_postsmooth_col(
            u, e, b, omegas, VALS, TAPS, interpret=True)
        outs[flag] = np.asarray(out)
    np.testing.assert_allclose(outs[True], outs[False], rtol=0, atol=5e-6)
