"""Pallas TPU kernels for complex-valued smoothing sweeps (Helmholtz).

The shifted-Laplace preconditioner M = -Lap - k^2 (1 + 0.5i) (reference
example_problems/Helmholtz/2D_FD_Helmholtz_fromL3.exa3:55-77) is a
constant COMPLEX 5-point stencil; its RB-GS sweeps dominate every
preconditioner application inside the outer BiCGStab iteration.  TPUs
have no native complex vector arithmetic, so the kernel carries the real
and imaginary planes as one stacked (2, n, m) f32 array and expands the
complex multiply-adds explicitly:

    (cr + i ci)(ur + i ui) = (cr ur - ci ui) + i (cr ui + ci ur)

Window/halo scheme identical to the constant-coefficient kernel
(ops/pallas/rbgs.py): row-block tiling with two halo rows per side so the
black half-sweep recomputes post-red edge neighbors locally; u and b are
streamed exactly once per full sweep.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 64


def complex_five_point_values(stencil) -> Optional[Tuple[complex, ...]]:
    """(center, north, south, west, east) of a constant 5-point 2D stencil
    with at least one complex entry, as python complex; None otherwise."""
    entries = dict(stencil.entries)
    wanted = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]
    if set(entries) - set(wanted):
        return None
    if not any(isinstance(v, complex) for v in entries.values()):
        return None
    return tuple(complex(entries.get(o, 0.0)) for o in wanted)


def supports(u, vals) -> bool:
    return (vals is not None and u.ndim == 2
            and u.dtype == jnp.complex64
            and u.shape[0] >= 8 and u.shape[1] >= 128
            and u.shape[0] > _BLOCK_ROWS)


def _fused_cx_kernel(u_prev_ref, u_curr_ref, u_next_ref, b_prev_ref,
                     b_curr_ref, b_next_ref, omega_ref, out_ref, *,
                     cr, ci, dr, di, block_rows, n_rows, n_half_sweeps):
    """Red AND black half-sweeps (or one Jacobi sweep) of a complex
    5-point stencil over a row block, on stacked (2, rows, m) re/im
    planes.  Same discarded-edge-rows exactness argument as
    rbgs._fused_rb_kernel."""
    i = pl.program_id(0)
    R = block_rows
    m = u_curr_ref.shape[2]
    r0 = i * R
    omega = omega_ref[0, 0]
    W = R + 4

    def window(prev_ref, curr_ref, next_ref, k):
        return jnp.concatenate([prev_ref[k, 6:8, :], curr_ref[k, :, :],
                                next_ref[k, 0:2, :]], axis=0)      # (W, m)

    gid = jax.lax.broadcasted_iota(jnp.int32, (W, m), 0) + r0 - 2
    valid = (gid >= 0) & (gid < n_rows)
    ur = jnp.where(valid, window(u_prev_ref, u_curr_ref, u_next_ref, 0), 0.0)
    ui = jnp.where(valid, window(u_prev_ref, u_curr_ref, u_next_ref, 1), 0.0)
    br = window(b_prev_ref, b_curr_ref, b_next_ref, 0)
    bi = window(b_prev_ref, b_curr_ref, b_next_ref, 1)

    col = jax.lax.broadcasted_iota(jnp.int32, (W, m), 1)
    checker = ((gid + col) % 2) == 0
    if n_half_sweeps == 1:
        masks = (valid,)
    else:
        masks = (checker & valid, (~checker) & valid)
    zr = jnp.zeros((1, m), ur.dtype)
    zc = jnp.zeros((W, 1), ur.dtype)

    def shifts(u):
        up = jnp.concatenate([zr, u[:-1, :]], axis=0)
        dn = jnp.concatenate([u[1:, :], zr], axis=0)
        left = jnp.concatenate([zc, u[:, :-1]], axis=1)
        right = jnp.concatenate([u[:, 1:], zc], axis=1)
        return (u, up, dn, left, right)

    def halfsweep(ur, ui, parity):
        sr = shifts(ur)
        si = shifts(ui)
        aur = sum(cr[k] * sr[k] - ci[k] * si[k] for k in range(5))
        aui = sum(cr[k] * si[k] + ci[k] * sr[k] for k in range(5))
        rr = br - aur
        ri = bi - aui
        upr = omega * (dr * rr - di * ri)
        upi = omega * (dr * ri + di * rr)
        mask = masks[parity]
        return (ur + jnp.where(mask, upr, 0.0),
                ui + jnp.where(mask, upi, 0.0))

    for parity in range(n_half_sweeps):
        ur, ui = halfsweep(ur, ui, parity)
    out_ref[0, :, :] = ur[2:R + 2]
    out_ref[1, :, :] = ui[2:R + 2]


def _cx_sweep_call(u, b, omega, vals, *, n_half_sweeps, interpret=False):
    n, m = u.shape
    R = _BLOCK_ROWS
    grid = (pl.cdiv(n, R),)
    cr = tuple(float(v.real) for v in vals)
    ci = tuple(float(v.imag) for v in vals)
    dinv = 1.0 / vals[0]
    kernel = functools.partial(
        _fused_cx_kernel, cr=cr, ci=ci, dr=float(dinv.real),
        di=float(dinv.imag), block_rows=R, n_rows=n,
        n_half_sweeps=n_half_sweeps)

    real = jnp.float32
    us = jnp.stack([jnp.real(u).astype(real), jnp.imag(u).astype(real)])
    bs = jnp.stack([jnp.real(b).astype(real), jnp.imag(b).astype(real)])

    H = 8
    n8 = pl.cdiv(n, H)
    spec_prev = pl.BlockSpec(
        (2, H, m), lambda i: (0, jnp.maximum((i * R) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((2, R, m), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (2, H, m), lambda i: (0, jnp.minimum((i * R + R) // H, n8 - 1), 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((2, R, m), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n, m), real),
        interpret=interpret,
    )(us, us, us, bs, bs, bs,
      jnp.asarray(omega).real.reshape(1, 1).astype(real))
    return jax.lax.complex(out[0], out[1]).astype(u.dtype)


def fused_rbgs_sweep_cx(u, b, omega, vals, interpret=False):
    """Full complex red-black sweep in one fused pass (u, b streamed
    once as stacked re/im planes)."""
    return _cx_sweep_call(u, b, omega, vals, n_half_sweeps=2,
                          interpret=interpret)


def jacobi_sweep_cx(u, b, omega, vals, interpret=False):
    """Complex damped-Jacobi sweep in one fused pass."""
    return _cx_sweep_call(u, b, omega, vals, n_half_sweeps=1,
                          interpret=interpret)
