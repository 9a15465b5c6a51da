"""Pallas TPU kernels for variable-coefficient smoothing sweeps.

Variable-coefficient operators (reference gallery.py:87-185: Poisson with
exp(kappa)-coefficients) execute as a ``StencilField`` — one coefficient
field per offset.  The generic XLA path pads u, materializes five
coefficient*shift products, the residual and the per-cell diagonal division
as full-grid intermediates per half-sweep; this kernel fuses a FULL
red-black (or Jacobi) sweep into one pass that streams u, b and the
coefficient stack exactly once.

Same window/halo scheme as the constant-coefficient kernel
(ops/pallas/rbgs.py): row-block tiling, two extra halo rows on each side so
the black half can recompute the post-red values of its edge neighbors
locally instead of re-reading them from HBM.  The five coefficient fields
travel as ONE stacked (5, n, m) array so each needs just three block views
(prev-halo / main / next-halo).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: offset order of the stacked coefficient planes
#: (center, north(row-1), south(row+1), west(col-1), east(col+1))
FIVE_POINT_OFFSETS = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))

# smaller blocks than the constant kernel: the coefficient stack adds
# 5 window-sized streams to the live set, and halo overhead is 4/R rows
_BLOCK_ROWS = 32


def five_point_stack(sf, dtype) -> Optional[jnp.ndarray]:
    """Stack a 2D 5-point ``StencilField`` into a (5, n, m) array in
    FIVE_POINT_OFFSETS order, or None if the field has any other shape
    (different offsets, complex coefficients, non-2D)."""
    offsets = tuple(sf.offsets)
    if set(offsets) - set(FIVE_POINT_OFFSETS) or len(offsets[0]) != 2:
        return None
    by_offset = {tuple(o): np.asarray(f) for o, f in zip(sf.offsets, sf.fields)}
    if any(np.iscomplexobj(f) for f in by_offset.values()):
        return None
    if (0, 0) not in by_offset:
        return None
    shape = by_offset[(0, 0)].shape
    planes = [by_offset.get(o, np.zeros(shape)) for o in FIVE_POINT_OFFSETS]
    return jnp.asarray(np.stack(planes), dtype=dtype)


def supports(u, c_stack) -> bool:
    return (c_stack is not None and u.ndim == 2
            and u.dtype in (jnp.float32, jnp.bfloat16)
            and u.shape[0] >= 8 and u.shape[1] >= 128
            and u.shape[0] > _BLOCK_ROWS)


def _fused_var_kernel(u_prev_ref, u_curr_ref, u_next_ref, b_prev_ref,
                      b_curr_ref, b_next_ref, c_prev_ref, c_curr_ref,
                      c_next_ref, omega_ref, out_ref, *, block_rows, n_rows,
                      n_half_sweeps):
    """Red AND black half-sweeps (or one Jacobi sweep) over a row block of a
    variable-coefficient 5-point operator, in one HBM pass.

    Window rows r0-2 .. r0+R+1; edge-row updates use zero out-of-window
    neighbors, and their (wrong) values are only ever neighbors of rows
    whose output is itself discarded, so the final out slice is exact
    (same argument as rbgs._fused_rb_kernel)."""
    i = pl.program_id(0)
    R = block_rows
    m = u_curr_ref.shape[1]
    r0 = i * R
    omega = omega_ref[0, 0]
    W = R + 4

    u_full = jnp.concatenate([u_prev_ref[6:8, :], u_curr_ref[:],
                              u_next_ref[0:2, :]], axis=0)         # (W, m)
    gid = jax.lax.broadcasted_iota(jnp.int32, (W, m), 0) + r0 - 2
    valid = (gid >= 0) & (gid < n_rows)
    u_full = jnp.where(valid, u_full, 0.0)
    b_full = jnp.concatenate([b_prev_ref[6:8, :], b_curr_ref[:],
                              b_next_ref[0:2, :]], axis=0)         # (W, m)

    def cplane(k):
        return jnp.concatenate([c_prev_ref[k, 6:8, :], c_curr_ref[k, :, :],
                                c_next_ref[k, 0:2, :]], axis=0)    # (W, m)

    cc, cn, cs, cw, ce = (cplane(k) for k in range(5))
    # halo views are clamped block repeats: out-of-grid rows may carry an
    # arbitrary (even zero) center coefficient — guard the division
    dinv = jnp.where(valid, omega / jnp.where(valid, cc, 1.0), 0.0)

    col = jax.lax.broadcasted_iota(jnp.int32, (W, m), 1)
    checker = ((gid + col) % 2) == 0
    if n_half_sweeps == 1:  # plain Jacobi: update everything at once
        masks = (valid,)
    else:
        masks = (checker & valid, (~checker) & valid)
    zr = jnp.zeros((1, m), u_full.dtype)
    zc = jnp.zeros((W, 1), u_full.dtype)

    def halfsweep(u, parity):
        up = jnp.concatenate([zr, u[:-1, :]], axis=0)
        dn = jnp.concatenate([u[1:, :], zr], axis=0)
        left = jnp.concatenate([zc, u[:, :-1]], axis=1)
        right = jnp.concatenate([u[:, 1:], zc], axis=1)
        au = cc * u + cn * up + cs * dn + cw * left + ce * right
        upd = dinv * (b_full - au)
        return u + jnp.where(masks[parity], upd, 0.0)

    u_blk = u_full
    for parity in range(n_half_sweeps):
        u_blk = halfsweep(u_blk, parity)
    out_ref[:] = u_blk[2:R + 2]


def _var_sweep_call(u, b, omega, c_stack, *, n_half_sweeps, interpret=False):
    n, m = u.shape
    R = _BLOCK_ROWS
    grid = (pl.cdiv(n, R),)
    kernel = functools.partial(_fused_var_kernel, block_rows=R, n_rows=n,
                               n_half_sweeps=n_half_sweeps)
    H = 8
    n8 = pl.cdiv(n, H)
    spec_prev = pl.BlockSpec(
        (H, m), lambda i: (jnp.maximum((i * R) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((R, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (H, m), lambda i: (jnp.minimum((i * R + R) // H, n8 - 1), 0),
        memory_space=pltpu.VMEM)
    cspec_prev = pl.BlockSpec(
        (5, H, m), lambda i: (0, jnp.maximum((i * R) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    cspec_main = pl.BlockSpec((5, R, m), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    cspec_next = pl.BlockSpec(
        (5, H, m), lambda i: (0, jnp.minimum((i * R + R) // H, n8 - 1), 0),
        memory_space=pltpu.VMEM)
    c = c_stack.astype(u.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  cspec_prev, cspec_main, cspec_next,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((R, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        interpret=interpret,
    )(u, u, u, b, b, b, c, c, c,
      jnp.asarray(omega).reshape(1, 1).astype(u.dtype))


def fused_rbgs_sweep_var(u, b, omega, c_stack, interpret=False):
    """Full variable-coefficient red-black sweep in one fused pass."""
    return _var_sweep_call(u, b, omega, c_stack, n_half_sweeps=2,
                           interpret=interpret)


def jacobi_sweep_var(u, b, omega, c_stack, interpret=False):
    """Variable-coefficient damped-Jacobi sweep in one fused pass."""
    return _var_sweep_call(u, b, omega, c_stack, n_half_sweeps=1,
                           interpret=interpret)
