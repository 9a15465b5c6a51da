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


# ---------------------------------------------------------------------------
# Super kernels: S sweeps + residual + FULL restriction / prolongation +
# correction + S post-sweeps, variable coefficients.
# ---------------------------------------------------------------------------
# Same leg structure as the constant-coefficient col-fused kernels
# (ops/pallas/transfer.py): 8-row halos cover S <= 3 sweeps plus the
# residual; the coefficient stack streams ONCE for the whole leg instead
# of once per sweep — the dominant saving for variable-coefficient
# problems, whose HBM floor is coefficient-stream-bound (5 extra arrays).

from .transfer import (_lane_restrict_block, _lane_prolong_block,
                       restrict_lane_matrix, prolong_lane_matrices,
                       _ROW_BLOCK_COARSE, _ROW_BLOCK_FINE)


def _var_windows(u_refs, b_refs, c_refs, f0, n_rows, W, m):
    u = jnp.concatenate([u_refs[0][:], u_refs[1][:], u_refs[2][:]],
                        axis=0).astype(jnp.float32)
    b = jnp.concatenate([b_refs[0][:], b_refs[1][:], b_refs[2][:]],
                        axis=0).astype(jnp.float32)
    gid = jax.lax.broadcasted_iota(jnp.int32, (W, m), 0) + f0 - 8
    col = jax.lax.broadcasted_iota(jnp.int32, (W, m), 1)
    valid = (gid >= 0) & (gid < n_rows)
    u = jnp.where(valid, u, 0.0)

    def cplane(k):
        return jnp.concatenate(
            [c_refs[0][k], c_refs[1][k], c_refs[2][k]],
            axis=0).astype(jnp.float32)

    cc, cn, cs, cw, ce = (cplane(k) for k in range(5))
    return u, b, (cc, cn, cs, cw, ce), gid, col, valid


def _var_halfsweeps(u, b, coeffs, masks, valid, omega_ref, om0, n_sweeps):
    """masks: (red, black) for RB sweeps or (valid,) for Jacobi."""
    cc, cn, cs, cw, ce = coeffs
    W, m = u.shape
    zr = jnp.zeros((1, m), u.dtype)
    zc = jnp.zeros((W, 1), u.dtype)
    dinv = jnp.where(valid, 1.0 / jnp.where(valid, cc, 1.0), 0.0)
    for k in range(n_sweeps):
        omega = omega_ref[0, om0 + k]
        for parity in range(len(masks)):
            up = jnp.concatenate([zr, u[:-1, :]], axis=0)
            dn = jnp.concatenate([u[1:, :], zr], axis=0)
            left = jnp.concatenate([zc, u[:, :-1]], axis=1)
            right = jnp.concatenate([u[:, 1:], zc], axis=1)
            au = cc * u + cn * up + cs * dn + cw * left + ce * right
            upd = omega * dinv * (b - au)
            u = u + jnp.where(masks[parity], upd, 0.0)
    return u


def _var_residual(u, b, coeffs, valid):
    cc, cn, cs, cw, ce = coeffs
    W, m = u.shape
    zr = jnp.zeros((1, m), u.dtype)
    zc = jnp.zeros((W, 1), u.dtype)
    up = jnp.concatenate([zr, u[:-1, :]], axis=0)
    dn = jnp.concatenate([u[1:, :], zr], axis=0)
    left = jnp.concatenate([zc, u[:, :-1]], axis=1)
    right = jnp.concatenate([u[:, 1:], zc], axis=1)
    au = cc * u + cn * up + cs * dn + cw * left + ce * right
    return jnp.where(valid, b - au, 0.0)


def _var_smooth_rr_kernel(u_p, u_c, u_n, b_p, b_c, b_n, c_p, c_c, c_n_,
                          omega_ref, rm_ref, us_ref, rc_ref, *, wm1, w0,
                          wp1, block_rows_c, n_rows, n_sweeps, red_black):
    i = pl.program_id(0)
    Rc = block_rows_c
    m = u_c.shape[1]
    W = 2 * Rc + 16
    f0 = i * (2 * Rc)
    u, b, coeffs, gid, col, valid = _var_windows(
        (u_p, u_c, u_n), (b_p, b_c, b_n), (c_p, c_c, c_n_), f0, n_rows,
        W, m)
    if red_black:
        checker = ((gid + col) % 2) == 0
        masks = (checker & valid, (~checker) & valid)
    else:
        masks = (valid,)
    u = _var_halfsweeps(u, b, coeffs, masks, valid, omega_ref, 0, n_sweeps)
    r = _var_residual(u, b, coeffs, valid)

    us_ref[:] = u[8:8 + 2 * Rc].astype(us_ref.dtype)
    body = r[8:8 + 2 * Rc].reshape(Rc, 2, m)
    ev = body[:, 0, :]
    od = body[:, 1, :]
    ev_next = jnp.concatenate([ev[1:], r[8 + 2 * Rc:9 + 2 * Rc]], axis=0)
    rr = wm1 * ev + w0 * od + wp1 * ev_next
    rc_ref[:] = _lane_restrict_block(rr, rm_ref, m).astype(rc_ref.dtype)


def presmooth_residual_restrict_var(u, b, c_stack, omegas, taps,
                                    red_black=True, interpret=False):
    """(u_smoothed, rc): S red-black sweeps of a variable-coefficient
    5-point operator + residual + FULL 2:1 restriction, one HBM pass over
    u, b and the coefficient stack."""
    n, m = u.shape
    nc, mc = (n - 1) // 2, (m - 1) // 2
    S = len(omegas)
    assert 1 <= S <= 3
    Rc = _ROW_BLOCK_COARSE
    kernel = functools.partial(
        _var_smooth_rr_kernel, wm1=taps[0][0], w0=taps[0][1],
        wp1=taps[0][2], block_rows_c=Rc, n_rows=n, n_sweeps=S,
        red_black=red_black)
    H = 8
    RF = 2 * Rc
    n8 = pl.cdiv(n, H)
    nblk = pl.cdiv(n, RF)
    spec_prev = pl.BlockSpec(
        (H, m), lambda i: (jnp.maximum((i * RF) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((RF, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (H, m), lambda i: (jnp.minimum((i * RF + RF) // H, n8 - 1), 0),
        memory_space=pltpu.VMEM)
    cspec_prev = pl.BlockSpec(
        (5, H, m), lambda i: (0, jnp.maximum((i * RF) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    cspec_main = pl.BlockSpec((5, RF, m), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    cspec_next = pl.BlockSpec(
        (5, H, m), lambda i: (0, jnp.minimum((i * RF + RF) // H, n8 - 1), 0),
        memory_space=pltpu.VMEM)
    spec_mat = pl.BlockSpec((384, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    om = jnp.stack([jnp.asarray(o, jnp.float32)
                    for o in omegas]).reshape(1, S)
    rmat = jnp.asarray(restrict_lane_matrix(taps[1]))
    c = c_stack.astype(u.dtype)
    u_s, rc = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  cspec_prev, cspec_main, cspec_next,
                  pl.BlockSpec(memory_space=pltpu.SMEM), spec_mat],
        out_specs=[pl.BlockSpec((RF, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((Rc, mc), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nblk * RF, m), u.dtype),
                   jax.ShapeDtypeStruct((nblk * Rc, mc), u.dtype)],
        interpret=interpret,
    )(u, u, u, b, b, b, c, c, c, om, rmat)
    return u_s[:n], rc[:nc]


def _var_pc_smooth_kernel(u_p, u_c, u_n, b_p, b_c, b_n, c_p, c_c, c_n_,
                          e_p, e_c, e_n, omega_ref, pm_ref, out_ref, *,
                          pm1, p0, pp1, block_rows_f, n_rows, nc_rows,
                          n_sweeps, red_black):
    i = pl.program_id(0)
    R = block_rows_f
    m = u_c.shape[1]
    W = R + 16
    f0 = i * R
    Rc = R // 2
    i0 = i * Rc
    u, b, coeffs, gid, col, valid = _var_windows(
        (u_p, u_c, u_n), (b_p, b_c, b_n), (c_p, c_c, c_n_), f0, n_rows,
        W, m)

    Rcw = Rc + 8
    mc = e_c.shape[1]
    e = jnp.concatenate([e_p[4:8, :], e_c[:], e_n[0:4, :]],
                        axis=0).astype(jnp.float32)
    cgid = jax.lax.broadcasted_iota(jnp.int32, (Rcw, mc), 0) + i0 - 4
    e = jnp.where((cgid >= 0) & (cgid < nc_rows), e, 0.0)
    c_half = _lane_prolong_block(e, pm_ref, m)
    zc1 = jnp.zeros((1, m), c_half.dtype)
    c_shift = jnp.concatenate([zc1, c_half[:-1, :]], axis=0)
    evn = pp1 * c_shift + pm1 * c_half
    odd = p0 * c_half
    corr = jnp.stack([evn, odd], axis=1).reshape(2 * Rcw, m)
    omega0 = omega_ref[0, 0]
    u = u + omega0 * jnp.where(valid, corr, 0.0)

    if red_black:
        checker = ((gid + col) % 2) == 0
        masks = (checker & valid, (~checker) & valid)
    else:
        masks = (valid,)
    u = _var_halfsweeps(u, b, coeffs, masks, valid, omega_ref, 1, n_sweeps)
    out_ref[:] = u[8:8 + R].astype(out_ref.dtype)


def prolong_correct_postsmooth_var(u, e, b, c_stack, omegas, taps,
                                   red_black=True, interpret=False):
    """u + omega0 * P(e) (full in-kernel 1:2 interpolation), then
    ``len(omegas)-1`` red-black sweeps of the variable-coefficient
    operator — one HBM pass over u, b, e and the coefficient stack."""
    n, m = u.shape
    nc, mc = e.shape
    assert m == 2 * mc + 1 and n == 2 * nc + 1
    S = len(omegas) - 1
    assert 1 <= S <= 3
    R = _ROW_BLOCK_FINE
    Rc = R // 2
    kernel = functools.partial(
        _var_pc_smooth_kernel, pm1=taps[0][0], p0=taps[0][1],
        pp1=taps[0][2], block_rows_f=R, n_rows=n, nc_rows=nc, n_sweeps=S,
        red_black=red_black)
    H = 8
    n8 = pl.cdiv(n, H)
    n8c = pl.cdiv(nc, H)
    cblk_max = pl.cdiv(nc, Rc) - 1
    nblk = pl.cdiv(n, R)
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
    espec_prev = pl.BlockSpec(
        (H, mc), lambda i: (jnp.clip((i * Rc) // H - 1, 0, n8c - 1), 0),
        memory_space=pltpu.VMEM)
    espec_main = pl.BlockSpec(
        (Rc, mc), lambda i: (jnp.minimum(i, cblk_max), 0),
        memory_space=pltpu.VMEM)
    espec_next = pl.BlockSpec(
        (H, mc), lambda i: (jnp.minimum((i * Rc + Rc) // H, n8c - 1), 0),
        memory_space=pltpu.VMEM)
    spec_pmat = pl.BlockSpec((2, 128, 256), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    om = jnp.stack([jnp.asarray(o, jnp.float32)
                    for o in omegas]).reshape(1, S + 1)
    pmat = jnp.asarray(prolong_lane_matrices(taps[1]))
    c = c_stack.astype(u.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  cspec_prev, cspec_main, cspec_next,
                  espec_prev, espec_main, espec_next,
                  pl.BlockSpec(memory_space=pltpu.SMEM), spec_pmat],
        out_specs=pl.BlockSpec((R, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk * R, m), u.dtype),
        interpret=interpret,
    )(u, u, u, b, b, b, c, c, c, e, e, e, om, pmat)
    return out[:n]
