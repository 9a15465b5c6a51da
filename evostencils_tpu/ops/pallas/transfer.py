"""Pallas TPU kernels fusing the V-cycle's transfer boundaries.

Profiling on v5e shows the smoother sweeps (rbgs.py) already run at the
HBM roofline; the remaining fine-level cost is the residual (an XLA
shifted-slice stencil that re-reads u once per tap, ~6x roofline) and the
intergrid transfers.  Mosaic on TPU cannot restructure the lane (last)
dimension in-kernel (stride-2 slices / lane reshapes are rejected), so the
2x coarsening factors split per axis:

* the **row** (sublane) direction is fused into Pallas kernels here via
  sublane reshapes ``(2R, m) -> (R, 2, m)``, which Mosaic supports;
* the **column** (lane) direction stays a banded-matrix contraction on the
  MXU (ops/apply._restriction_axis_matrix), which measures at matmul peak.

Kernels:
* ``residual_rowrestrict``: r = b - A u (constant 5-point A) fused with
  the row-direction 3-tap restriction — u, b are streamed exactly once
  and only the half-height row-restricted residual is written back;
* ``prolong_row_correct``: fine-row 3-tap interpolation of the (already
  column-prolonged) coarse correction fused with ``u += omega * P e`` —
  replaces a scatter + stencil + add pipeline with one pass over u.

Both preserve the XLA path's semantics bit-for-reassociation (tested in
interpret mode against ops/apply.py dense-matrix transfers).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_ROW_BLOCK_COARSE = 32   # coarse rows per grid step (fine window 68 rows)
_ROW_BLOCK_FINE = 64     # fine rows per grid step for prolong-correct


def three_tap(vectors, radii) -> Optional[Tuple[Tuple[float, ...], ...]]:
    """Per-axis (w[-1], w[0], w[+1]) taps of a separable transfer stencil
    with radius 1 per axis, else None."""
    taps = []
    for v, r in zip(vectors, radii):
        if r != 1 or len(v) != 3:
            return None
        if any(isinstance(x, complex) for x in v):
            return None
        taps.append(tuple(float(x) for x in v))
    return tuple(taps)


# ---------------------------------------------------------------------------
# fused residual + row restriction
# ---------------------------------------------------------------------------

def _rr_kernel(u_prev_ref, u_curr_ref, u_next_ref, b_prev_ref, b_curr_ref,
               b_next_ref, out_ref, *, c_center, c_w, c_e, c_n, c_s,
               wm1, w0, wp1, block_rows_c, n_rows):
    """Coarse row block ic0..ic0+Rc-1 of the row-restricted residual.

    Fine window rows 2*ic0-2 .. 2*ic0+2Rc+1 (W = 2Rc+4); coarse row ic
    samples fine residual rows 2ic, 2ic+1, 2ic+2 with taps (wm1, w0, wp1)
    (ops/apply._restriction_axis_matrix convention: fine j = 2i+1+o)."""
    i = pl.program_id(0)
    Rc = block_rows_c
    m = u_curr_ref.shape[1]
    W = 2 * Rc + 4
    f0 = i * (2 * Rc)          # first fine row of the main block

    # f32 compute regardless of storage dtype (bf16 in-kernel arithmetic
    # diverges on hardware — BASELINE.md 2026-08-21; identity for f32)
    u_full = jnp.concatenate([u_prev_ref[6:8, :], u_curr_ref[:],
                              u_next_ref[0:2, :]],
                             axis=0).astype(jnp.float32)          # (W, m)
    b_full = jnp.concatenate([b_prev_ref[6:8, :], b_curr_ref[:],
                              b_next_ref[0:2, :]],
                             axis=0).astype(jnp.float32)
    gid = jax.lax.broadcasted_iota(jnp.int32, (W, m), 0) + f0 - 2
    valid = (gid >= 0) & (gid < n_rows)
    u_full = jnp.where(valid, u_full, 0.0)

    zr = jnp.zeros((1, m), u_full.dtype)
    zc = jnp.zeros((W, 1), u_full.dtype)
    up = jnp.concatenate([zr, u_full[:-1, :]], axis=0)
    dn = jnp.concatenate([u_full[1:, :], zr], axis=0)
    left = jnp.concatenate([zc, u_full[:, :-1]], axis=1)
    right = jnp.concatenate([u_full[:, 1:], zc], axis=1)
    au = (c_center * u_full + c_w * up + c_e * dn
          + c_n * left + c_s * right)
    r = jnp.where(valid, b_full - au, 0.0)

    # fine rows 2ic0 .. 2ic0+2Rc live at window rows 2 .. 2Rc+2
    body = r[2:2 + 2 * Rc].reshape(Rc, 2, m)
    ev = body[:, 0, :]                       # fine rows 2ic
    od = body[:, 1, :]                       # fine rows 2ic+1
    ev_next = jnp.concatenate([ev[1:], r[2 + 2 * Rc:3 + 2 * Rc]], axis=0)
    out_ref[:] = (wm1 * ev + w0 * od + wp1 * ev_next).astype(out_ref.dtype)


def residual_rowrestrict(u, b, stencil_vals, row_taps, interpret=False):
    """(nc, m) row-restricted residual of a constant 5-point operator:
    out[ic] = wm1*r[2ic] + w0*r[2ic+1] + wp1*r[2ic+2], r = b - A u."""
    n, m = u.shape
    nc = (n - 1) // 2
    Rc = _ROW_BLOCK_COARSE
    c_center, c_w, c_e, c_n, c_s = stencil_vals
    wm1, w0, wp1 = row_taps
    kernel = functools.partial(
        _rr_kernel, c_center=c_center, c_w=c_w, c_e=c_e, c_n=c_n, c_s=c_s,
        wm1=wm1, w0=w0, wp1=wp1, block_rows_c=Rc, n_rows=n)

    H = 8
    RF = 2 * Rc
    n8 = pl.cdiv(n, H)
    grid = (pl.cdiv(nc, Rc),)
    spec_prev = pl.BlockSpec(
        (H, m), lambda i: (jnp.maximum((i * RF) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((RF, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (H, m), lambda i: (jnp.minimum((i * RF + RF) // H, n8 - 1), 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next],
        out_specs=pl.BlockSpec((Rc, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc, m), u.dtype),
        interpret=interpret,
    )(u, u, u, b, b, b)


# ---------------------------------------------------------------------------
# fused row prolongation + correction
# ---------------------------------------------------------------------------

def _pc_kernel(u_ref, c_prev_ref, c_curr_ref, omega_ref, out_ref, *,
               wm1, w0, wp1, block_rows_f, nc_rows):
    """u[f] += omega * (row-interpolated c)[f] on fine row block f0..f0+R-1.

    Fine row 2i+1 <- w0 * c[i]; fine row 2i <- wp1 * c[i-1] + wm1 * c[i]
    (ops/apply._prolongation_axis_matrix convention: fine j = 2i+1+o)."""
    i = pl.program_id(0)
    R = block_rows_f
    m = u_ref.shape[1]
    Rc = R // 2
    i0 = i * Rc                              # first coarse row

    # compute in f32 regardless of storage dtype (bf16 in-kernel
    # arithmetic/SMEM scalars diverge on hardware — BASELINE.md 2026-08-21;
    # for f32 inputs every astype below is an identity at trace time)
    cm = c_curr_ref[:].astype(jnp.float32)   # (Rc, m) coarse rows i0..
    cgid = jax.lax.broadcasted_iota(jnp.int32, (Rc, m), 0) + i0
    cm = jnp.where(cgid < nc_rows, cm, 0.0)
    cprev = jnp.concatenate(
        [c_prev_ref[7:8, :].astype(jnp.float32), cm[:-1, :]], axis=0)
    cprev = jnp.where(cgid - 1 >= 0, cprev, 0.0)

    evn = wp1 * cprev + wm1 * cm             # fine rows 2(i0+t)
    odd = w0 * cm                            # fine rows 2(i0+t)+1
    corr = jnp.stack([evn, odd], axis=1).reshape(R, m)
    omega = omega_ref[0, 0]
    out = u_ref[:].astype(jnp.float32) + omega * corr
    out_ref[:] = out.astype(out_ref.dtype)


def prolong_row_correct(u, c_half, omega, row_taps, interpret=False):
    """u + omega * P_row(c_half): c_half is the column-prolonged coarse
    correction, shape (nc, m) against fine u of shape (n, m), n = 2nc+1."""
    n, m = u.shape
    nc = c_half.shape[0]
    R = _ROW_BLOCK_FINE
    wm1, w0, wp1 = row_taps
    kernel = functools.partial(_pc_kernel, wm1=wm1, w0=w0, wp1=wp1,
                               block_rows_f=R, nc_rows=nc)
    H = 8
    Rc = R // 2
    grid = (pl.cdiv(n, R),)
    # the last fine block can map to an entirely out-of-range coarse
    # block; clamp the index (contents are then masked via cgid)
    cblk_max = pl.cdiv(nc, Rc) - 1
    spec_u = pl.BlockSpec((R, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_prev = pl.BlockSpec(
        (H, m), lambda i: (jnp.maximum(
            jnp.minimum((i * Rc) // H - 1, (nc - 1) // H), 0), 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((Rc, m), lambda i: (jnp.minimum(i, cblk_max), 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_u, spec_prev, spec_main,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=spec_u,
        out_shape=jax.ShapeDtypeStruct((n, m), u.dtype),
        interpret=interpret,
    )(u, c_half, c_half,
      # f32 SMEM scalar regardless of storage dtype: bf16 SMEM scalars /
      # in-kernel arithmetic diverge on hardware (BASELINE.md 2026-08-21)
      jnp.asarray(omega, jnp.float32).reshape(1, 1))


# ---------------------------------------------------------------------------
# super-kernel: S red-black pre-smooth sweeps + residual + row restriction
# ---------------------------------------------------------------------------

def _smooth_rr_kernel(u_prev_ref, u_curr_ref, u_next_ref, b_prev_ref,
                      b_curr_ref, b_next_ref, omega_ref, us_ref, out_ref, *,
                      c_center, c_w, c_e, c_n, c_s, dinv, wm1, w0, wp1,
                      block_rows_c, n_rows, n_sweeps):
    """S fused red-black sweeps, then residual + row restriction, all in
    one pass: u and b are streamed once for the whole pre-smoothing leg.

    Window = main block + full 8-row halos each side (W = 2Rc+16); each
    half-sweep corrupts one more window-edge row, so S <= 3 sweeps plus
    the residual stay exact on the written rows (corruption depth 2S+1
    <= 8).  Writes the smoothed u (consumed later by the coarse-grid
    correction) and the row-restricted residual."""
    i = pl.program_id(0)
    Rc = block_rows_c
    m = u_curr_ref.shape[1]
    W = 2 * Rc + 16
    f0 = i * (2 * Rc)

    # f32 compute regardless of storage dtype (bf16 in-kernel arithmetic
    # diverges on hardware — BASELINE.md 2026-08-21; identity for f32)
    u = jnp.concatenate([u_prev_ref[:], u_curr_ref[:], u_next_ref[:]],
                        axis=0).astype(jnp.float32)               # (W, m)
    b = jnp.concatenate([b_prev_ref[:], b_curr_ref[:], b_next_ref[:]],
                        axis=0).astype(jnp.float32)
    gid = jax.lax.broadcasted_iota(jnp.int32, (W, m), 0) + f0 - 8
    col = jax.lax.broadcasted_iota(jnp.int32, (W, m), 1)
    valid = (gid >= 0) & (gid < n_rows)
    u = jnp.where(valid, u, 0.0)
    checker = ((gid + col) % 2) == 0
    masks = (checker & valid, (~checker) & valid)   # hoisted out of sweeps

    zr = jnp.zeros((1, m), u.dtype)
    zc = jnp.zeros((W, 1), u.dtype)

    def a_of(v):
        up = jnp.concatenate([zr, v[:-1, :]], axis=0)
        dn = jnp.concatenate([v[1:, :], zr], axis=0)
        left = jnp.concatenate([zc, v[:, :-1]], axis=1)
        right = jnp.concatenate([v[:, 1:], zc], axis=1)
        return (c_center * v + c_w * up + c_e * dn
                + c_n * left + c_s * right)

    # Jacobi form u + w*m*dinv*(b - Au) = u + w*m*(bd - u - offdiag'(u))
    # with dinv folded into the off-diagonal coefficients at trace time
    # and bd = dinv*b hoisted out of the sweeps (VPU-bound kernel).
    dw, de, dn_, ds = (c_w * dinv, c_e * dinv, c_n * dinv, c_s * dinv)
    bd = dinv * b
    u = _rb_sweep_loop(u, bd, omega_ref, 0, n_sweeps, masks,
                       (dw, de, dn_, ds), zr, zc)

    r = jnp.where(valid, b - a_of(u), 0.0)

    us_ref[:] = u[8:8 + 2 * Rc].astype(us_ref.dtype)
    body = r[8:8 + 2 * Rc].reshape(Rc, 2, m)
    ev = body[:, 0, :]
    od = body[:, 1, :]
    ev_next = jnp.concatenate([ev[1:], r[8 + 2 * Rc:9 + 2 * Rc]], axis=0)
    out_ref[:] = (wm1 * ev + w0 * od + wp1 * ev_next).astype(out_ref.dtype)


def presmooth_residual_rowrestrict(u, b, omegas, stencil_vals, row_taps,
                                   interpret=False):
    """(u_smoothed, rr): ``len(omegas)`` damped red-black Gauss-Seidel
    sweeps followed by the row-restricted residual, one HBM pass.

    ``omegas`` is a sequence of (traced) relaxation factors, one per
    sweep, applied innermost-first; must have 1 <= len <= 3."""
    n, m = u.shape
    nc = (n - 1) // 2
    S = len(omegas)
    assert 1 <= S <= 3
    Rc = _ROW_BLOCK_COARSE
    c_center, c_w, c_e, c_n, c_s = stencil_vals
    wm1, w0, wp1 = row_taps
    kernel = functools.partial(
        _smooth_rr_kernel, c_center=c_center, c_w=c_w, c_e=c_e, c_n=c_n,
        c_s=c_s, dinv=1.0 / c_center, wm1=wm1, w0=w0, wp1=wp1,
        block_rows_c=Rc, n_rows=n, n_sweeps=S)

    H = 8
    RF = 2 * Rc
    n8 = pl.cdiv(n, H)
    # grid over FINE row blocks (covers the odd last fine row n-1 = 2nc);
    # outputs are padded to whole blocks and sliced afterwards so no out
    # block is ever fully out of bounds
    nblk = pl.cdiv(n, RF)
    grid = (nblk,)
    spec_prev = pl.BlockSpec(
        (H, m), lambda i: (jnp.maximum((i * RF) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((RF, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (H, m), lambda i: (jnp.minimum((i * RF + RF) // H, n8 - 1), 0),
        memory_space=pltpu.VMEM)
    om = jnp.stack([jnp.asarray(o, jnp.float32)
                for o in omegas]).reshape(1, S)
    u_s, rr = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((RF, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((Rc, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nblk * RF, m), u.dtype),
                   jax.ShapeDtypeStruct((nblk * Rc, m), u.dtype)],
        interpret=interpret,
    )(u, u, u, b, b, b, om)
    return u_s[:n], rr[:nc]


# ---------------------------------------------------------------------------
# super-kernel: prolongation + correction + S red-black post-smooth sweeps
# ---------------------------------------------------------------------------

def _pc_smooth_kernel(u_prev_ref, u_curr_ref, u_next_ref, b_prev_ref,
                      b_curr_ref, b_next_ref, c_prev_ref, c_curr_ref,
                      c_next_ref, omega_ref, out_ref, *, c_center, c_w, c_e,
                      c_n, c_s, dinv, wm1, w0, wp1, block_rows_f, n_rows,
                      nc_rows, n_sweeps):
    """u += omega0 * P(c) followed by S fused red-black sweeps, one pass.

    Window = fine main block + full 8-row halos (W = R+16); the row
    interpolation corrupts one window-edge row, each half-sweep one more,
    so S <= 3 post-sweeps stay exact on the written rows."""
    i = pl.program_id(0)
    R = block_rows_f
    m = u_curr_ref.shape[1]
    W = R + 16
    f0 = i * R
    Rc = R // 2
    i0 = i * Rc

    # f32 compute regardless of storage dtype (bf16 in-kernel arithmetic
    # diverges on hardware — BASELINE.md 2026-08-21; identity for f32)
    u = jnp.concatenate([u_prev_ref[:], u_curr_ref[:], u_next_ref[:]],
                        axis=0).astype(jnp.float32)                # (W, m)
    b = jnp.concatenate([b_prev_ref[:], b_curr_ref[:], b_next_ref[:]],
                        axis=0).astype(jnp.float32)
    gid = jax.lax.broadcasted_iota(jnp.int32, (W, m), 0) + f0 - 8
    col = jax.lax.broadcasted_iota(jnp.int32, (W, m), 1)
    valid = (gid >= 0) & (gid < n_rows)
    u = jnp.where(valid, u, 0.0)

    # coarse window rows i0-4 .. i0+Rc+3
    Rcw = Rc + 8
    c = jnp.concatenate([c_prev_ref[4:8, :], c_curr_ref[:],
                         c_next_ref[0:4, :]],
                        axis=0).astype(jnp.float32)                # (Rcw, m)
    cgid = jax.lax.broadcasted_iota(jnp.int32, (Rcw, m), 0) + i0 - 4
    c = jnp.where((cgid >= 0) & (cgid < nc_rows), c, 0.0)
    zc1 = jnp.zeros((1, m), c.dtype)
    c_shift = jnp.concatenate([zc1, c[:-1, :]], axis=0)
    evn = wp1 * c_shift + wm1 * c                # fine rows 2*(i0-4+t)
    odd = w0 * c                                 # fine rows 2*(i0-4+t)+1
    # pair t -> fine rows 2*(i0-4+t) and +1, i.e. rows f0-8 .. f0+R+7:
    # already aligned with the fine window (both start at f0-8)
    corr = jnp.stack([evn, odd], axis=1).reshape(2 * Rcw, m)
    omega0 = omega_ref[0, 0]
    u = u + omega0 * jnp.where(valid, corr, 0.0)

    zr = jnp.zeros((1, m), u.dtype)
    zc = jnp.zeros((W, 1), u.dtype)
    checker = ((gid + col) % 2) == 0
    masks = (checker & valid, (~checker) & valid)   # hoisted out of sweeps
    dw, de, dn_, ds = (c_w * dinv, c_e * dinv, c_n * dinv, c_s * dinv)
    bd = dinv * b
    u = _rb_sweep_loop(u, bd, omega_ref, 1, n_sweeps, masks,
                       (dw, de, dn_, ds), zr, zc)

    out_ref[:] = u[8:8 + R].astype(out_ref.dtype)


def prolong_correct_postsmooth(u, c_half, b, omegas, stencil_vals, row_taps,
                               interpret=False):
    """u + omega0 * P_row(c_half), then ``len(omegas)-1`` damped red-black
    Gauss-Seidel sweeps, one HBM pass over u/b/c_half.

    ``omegas[0]`` is the coarse-grid-correction factor; the rest are the
    post-smoothing factors in application order (1 <= S <= 3)."""
    n, m = u.shape
    nc = c_half.shape[0]
    S = len(omegas) - 1
    assert 1 <= S <= 3
    R = _ROW_BLOCK_FINE
    Rc = R // 2
    c_center, c_w, c_e, c_n, c_s = stencil_vals
    wm1, w0, wp1 = row_taps
    kernel = functools.partial(
        _pc_smooth_kernel, c_center=c_center, c_w=c_w, c_e=c_e, c_n=c_n,
        c_s=c_s, dinv=1.0 / c_center, wm1=wm1, w0=w0, wp1=wp1,
        block_rows_f=R, n_rows=n, nc_rows=nc, n_sweeps=S)

    H = 8
    n8 = pl.cdiv(n, H)
    n8c = pl.cdiv(nc, H)
    cblk_max = pl.cdiv(nc, Rc) - 1
    nblk = pl.cdiv(n, R)
    grid = (nblk,)
    spec_prev = pl.BlockSpec(
        (H, m), lambda i: (jnp.maximum((i * R) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((R, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (H, m), lambda i: (jnp.minimum((i * R + R) // H, n8 - 1), 0),
        memory_space=pltpu.VMEM)
    spec_cprev = pl.BlockSpec(
        (H, m), lambda i: (jnp.clip((i * Rc) // H - 1, 0, n8c - 1), 0),
        memory_space=pltpu.VMEM)
    spec_cmain = pl.BlockSpec(
        (Rc, m), lambda i: (jnp.minimum(i, cblk_max), 0),
        memory_space=pltpu.VMEM)
    spec_cnext = pl.BlockSpec(
        (H, m), lambda i: (jnp.minimum((i * Rc + Rc) // H, n8c - 1), 0),
        memory_space=pltpu.VMEM)
    om = jnp.stack([jnp.asarray(o, jnp.float32)
                for o in omegas]).reshape(1, S + 1)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  spec_cprev, spec_cmain, spec_cnext,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((R, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk * R, m), u.dtype),
        interpret=interpret,
    )(u, u, u, b, b, b, c_half, c_half, c_half, om)
    return out[:n]


# ---------------------------------------------------------------------------
# inter-iteration super-kernel: up-leg of cycle k fused with the down-leg
# of cycle k+1 (prolong + correct + post-smooth + pre-smooth + residual +
# row restriction) — u and b are streamed ONCE for both legs.  Used by the
# fused solve loop (compiler/solve.make_cycle_loop); the reference's
# generated solver makes two full memory sweeps for the same sequence.
# ---------------------------------------------------------------------------

def _vleg_kernel(u_prev_ref, u_curr_ref, u_next_ref, b_prev_ref, b_curr_ref,
                 b_next_ref, c_prev_ref, c_curr_ref, c_next_ref, omega_ref,
                 us_ref, rr_ref, *, c_center, c_w, c_e, c_n, c_s, dinv,
                 pm1, p0, pp1, wm1, w0, wp1, block_rows_f, n_rows, nc_rows,
                 n_sweeps):
    """Window = fine block + 16-row halos (W = R+32).  Corruption depth:
    1 (row interpolation) + 2*n_sweeps (half-sweeps) + 1 (residual)
    <= 16 for n_sweeps <= 6, so the written block and the one extra
    residual row the restriction samples stay exact."""
    i = pl.program_id(0)
    R = block_rows_f
    m = u_curr_ref.shape[1]
    W = R + 32
    f0 = i * R
    Rc = R // 2
    i0 = i * Rc

    # f32 compute regardless of storage dtype (bf16 in-kernel arithmetic
    # diverges on hardware — BASELINE.md 2026-08-21; identity for f32)
    u = jnp.concatenate([u_prev_ref[:], u_curr_ref[:], u_next_ref[:]],
                        axis=0).astype(jnp.float32)              # (W, m)
    b = jnp.concatenate([b_prev_ref[:], b_curr_ref[:], b_next_ref[:]],
                        axis=0).astype(jnp.float32)
    gid = jax.lax.broadcasted_iota(jnp.int32, (W, m), 0) + f0 - 16
    col = jax.lax.broadcasted_iota(jnp.int32, (W, m), 1)
    valid = (gid >= 0) & (gid < n_rows)
    u = jnp.where(valid, u, 0.0)

    # coarse window rows i0-8 .. i0+Rc+7 -> fine rows f0-16 .. f0+R+15
    Rcw = Rc + 16
    c = jnp.concatenate([c_prev_ref[:], c_curr_ref[:], c_next_ref[:]],
                        axis=0).astype(jnp.float32)              # (Rcw, m)
    cgid = jax.lax.broadcasted_iota(jnp.int32, (Rcw, m), 0) + i0 - 8
    c = jnp.where((cgid >= 0) & (cgid < nc_rows), c, 0.0)
    zc1 = jnp.zeros((1, m), c.dtype)
    c_shift = jnp.concatenate([zc1, c[:-1, :]], axis=0)
    evn = pp1 * c_shift + pm1 * c
    odd = p0 * c
    corr = jnp.stack([evn, odd], axis=1).reshape(2 * Rcw, m)     # (W, m)
    omega0 = omega_ref[0, 0]
    u = u + omega0 * jnp.where(valid, corr, 0.0)

    zr = jnp.zeros((1, m), u.dtype)
    zc = jnp.zeros((W, 1), u.dtype)
    checker = ((gid + col) % 2) == 0
    masks = (checker & valid, (~checker) & valid)
    dw, de, dn_, ds = (c_w * dinv, c_e * dinv, c_n * dinv, c_s * dinv)
    bd = dinv * b
    u = _rb_sweep_loop(u, bd, omega_ref, 1, n_sweeps, masks,
                       (dw, de, dn_, ds), zr, zc)

    up = jnp.concatenate([zr, u[:-1, :]], axis=0)
    dn = jnp.concatenate([u[1:, :], zr], axis=0)
    left = jnp.concatenate([zc, u[:, :-1]], axis=1)
    right = jnp.concatenate([u[:, 1:], zc], axis=1)
    au = c_center * u + _offdiag_sum(up, dn, left, right,
                                     c_w, c_e, c_n, c_s)
    r = jnp.where(valid, b - au, 0.0)

    us_ref[:] = u[16:16 + R].astype(us_ref.dtype)
    body = r[16:16 + R].reshape(Rc, 2, m)
    ev = body[:, 0, :]
    od = body[:, 1, :]
    ev_next = jnp.concatenate([ev[1:], r[16 + R:17 + R]], axis=0)
    rr_ref[:] = (wm1 * ev + w0 * od + wp1 * ev_next).astype(rr_ref.dtype)


def upleg_downleg_fused(u, c_half, b, omegas, stencil_vals, p_taps, r_taps,
                        interpret=False, block_rows=None):
    """(u_next, rr): apply ``u += omegas[0] * P_row(c_half)``, then all the
    remaining ``omegas`` as damped red-black Gauss-Seidel sweeps (the
    post-smooth sweeps of cycle k followed by the pre-smooth sweeps of
    cycle k+1), then the row-restricted residual — one HBM pass over
    u/b/c_half for what is otherwise two full fine-level leg kernels."""
    n, m = u.shape
    nc = (n - 1) // 2
    S = len(omegas) - 1
    assert 1 <= S <= 6
    R = block_rows or _ROW_BLOCK_FINE
    assert R % 16 == 0
    Rc = R // 2
    c_center, c_w, c_e, c_n, c_s = stencil_vals
    kernel = functools.partial(
        _vleg_kernel, c_center=c_center, c_w=c_w, c_e=c_e, c_n=c_n, c_s=c_s,
        dinv=1.0 / c_center, pm1=p_taps[0], p0=p_taps[1], pp1=p_taps[2],
        wm1=r_taps[0], w0=r_taps[1], wp1=r_taps[2], block_rows_f=R,
        n_rows=n, nc_rows=nc, n_sweeps=S)

    H = 16
    Hc = 8
    nH = pl.cdiv(n, H)
    nHc = pl.cdiv(nc, Hc)
    cblk_max = pl.cdiv(nc, Rc) - 1
    nblk = pl.cdiv(n, R)
    grid = (nblk,)
    spec_prev = pl.BlockSpec(
        (H, m), lambda i: (jnp.maximum((i * R) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((R, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (H, m), lambda i: (jnp.minimum((i * R + R) // H, nH - 1), 0),
        memory_space=pltpu.VMEM)
    spec_cprev = pl.BlockSpec(
        (Hc, m), lambda i: (jnp.clip((i * Rc) // Hc - 1, 0, nHc - 1), 0),
        memory_space=pltpu.VMEM)
    spec_cmain = pl.BlockSpec(
        (Rc, m), lambda i: (jnp.minimum(i, cblk_max), 0),
        memory_space=pltpu.VMEM)
    spec_cnext = pl.BlockSpec(
        (Hc, m), lambda i: (jnp.minimum((i * Rc + Rc) // Hc, nHc - 1), 0),
        memory_space=pltpu.VMEM)
    om = jnp.stack([jnp.asarray(o, jnp.float32)
                for o in omegas]).reshape(1, S + 1)
    u_s, rr = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  spec_cprev, spec_cmain, spec_cnext,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((R, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((Rc, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nblk * R, m), u.dtype),
                   jax.ShapeDtypeStruct((nblk * Rc, m), u.dtype)],
        interpret=interpret,
    )(u, u, u, b, b, b, c_half, c_half, c_half, om)
    return u_s[:n], rr[:nc]


def supports(u, stencil_vals=None) -> bool:
    """Shape/dtype gate shared by the transfer kernels (scalar 2D
    f32/bf16 grids spanning at least two row blocks)."""
    return (u.ndim == 2 and u.dtype in (jnp.float32, jnp.bfloat16)
            and u.shape[0] >= 4 * _ROW_BLOCK_COARSE + 1
            and u.shape[1] >= 128 and u.shape[0] % 2 == 1)


# ---------------------------------------------------------------------------
# In-kernel lane-axis (column) transfers
# ---------------------------------------------------------------------------
# Mosaic cannot restructure the lane (last) dimension with strided slices,
# but two lane-tile-aligned forms cover both transfer directions:
#
# * 2:1 decimation (restriction) is a banded matmul on the MXU.  Chunked
#   into 128-lane output tiles, every operand slice is lane-aligned:
#   out[:, 128t+j] = sum_d taps[d] * r[:, 256t + 2j + d], i.e. each output
#   chunk contracts three aligned 128-wide input chunks with the three row
#   blocks of one shared constant (384, 128) matrix.
# * 1:2 expansion (prolongation) is the transpose: each 256-lane output
#   chunk is fed by coarse lanes [128q-1, 128q+127], i.e. two aligned
#   128-wide input chunks contracted with two shared constant (128, 256)
#   matrices.  (pltpu.repeat cannot do this: it is tile, not interleave,
#   and Mosaic rejects lane-interleaving reshapes.)
#
# Fusing these into the leg kernels removes the separate dense banded
# GEMMs (~0.39 ms/cycle on the 4095^2 headline, BASELINE.md per-leg table)
# AND halves the HBM traffic of the leg<->tail intermediates: the
# restricted residual is written at (nc, mc) instead of (nc, m), the
# coarse correction read at (nc, mc).

def _offdiag_sum(up, dn, left, right, dw, de, dn_, ds):
    """Weighted 4-neighbor sum.  NOTE: an isotropic factoring
    dw*((up+dn)+(left+right)) was A/B'd on v5e 2026-08-21 and measured
    NET-SLOWER (1.279 -> 1.396 ms/cycle on the 4095^2 headline): the
    serialized adds break Mosaic's FMA chains, so the 4-FMA form stays."""
    return dw * up + de * dn + dn_ * left + ds * right


def _rb_sweep_loop(u, bd, omega_ref, om0, n_sweeps, masks, dco, zr, zc):
    """n_sweeps red-black (or single-mask Jacobi) sweeps over a window.

    ``config.combined_rb`` switches to the COMBINED update form: for a
    5-point operator every neighbor of a black node is red, so the black
    half-sweep's residual change is exactly the off-diagonal apply of the
    red update g — one residual evaluation per sweep plus a black-only
    correction, algebraically identical to the two masked half-sweeps
    while masking half the updates away only once (round-4 masked-update
    -waste item; measured A/B decides the default)."""
    dw, de, dn_, ds = dco

    def offdiag(v):
        up = jnp.concatenate([zr, v[:-1, :]], axis=0)
        dn = jnp.concatenate([v[1:, :], zr], axis=0)
        left = jnp.concatenate([zc, v[:, :-1]], axis=1)
        right = jnp.concatenate([v[:, 1:], zc], axis=1)
        return _offdiag_sum(up, dn, left, right, dw, de, dn_, ds)

    from ...config import config
    combined = getattr(config, "combined_rb", False) and len(masks) == 2
    if combined:
        valid = masks[0] | masks[1]
        for k in range(n_sweeps):
            omega = omega_ref[0, om0 + k]
            g = jnp.where(valid, omega * (bd - u - offdiag(u)), 0.0)
            u = u + g - jnp.where(masks[1], omega * offdiag(g), 0.0)
        return u
    for k in range(n_sweeps):
        omega = omega_ref[0, om0 + k]
        for parity in range(len(masks)):
            upd = omega * (bd - u - offdiag(u))
            u = u + jnp.where(masks[parity], upd, 0.0)
    return u


def restrict_lane_matrix(taps) -> np.ndarray:
    """(384, 128) f32 matrix M with M[2j+d, j] = taps[d] — the shared
    per-chunk operand of the 2:1 lane decimation (see module note)."""
    m = np.zeros((384, 128), np.float32)
    for j in range(128):
        for d in range(3):
            m[2 * j + d, j] = taps[d]
    return m


def _lane_restrict_block(r, rm_ref, m):
    """Contract the lane axis of value ``r`` (R, m) 2:1 with the banded
    3-tap matrix held in ``rm_ref`` (restrict_lane_matrix).  Returns
    (R, (m-1)//2) in f32."""
    r = r.astype(jnp.float32)
    R = r.shape[0]
    mc = (m - 1) // 2
    nT = (mc + 127) // 128
    chunks = []
    for t in range(nT):
        acc = None
        for s in range(3):
            lo = 256 * t + 128 * s
            if lo >= m:
                break
            hi = min(lo + 128, m)
            w = r[:, lo:hi]
            if hi - lo < 128:
                w = jnp.concatenate(
                    [w, jnp.zeros((R, 128 - (hi - lo)), r.dtype)], axis=1)
            d = jnp.dot(w, rm_ref[128 * s:128 * (s + 1), :],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        chunks.append(acc)
    out = jnp.concatenate(chunks, axis=1)
    return out[:, :mc]


def prolong_lane_matrices(taps) -> np.ndarray:
    """(2, 128, 256) f32 [main, prev] operands of the 1:2 lane expansion:
    output chunk q (fine lanes 256q+j, j<256) = c[:, 128q:128q+128] @ main
    + c[:, 128(q-1):128q] @ prev.  Fine lane 2i+1+o gets taps[o+1]*c[i]:
    main[k, 2k+1+o] = taps[o+1] (i = 128q+k), prev[127, 0] = taps[2]
    (the carry from i = 128q-1 into fine lane 256q)."""
    pm1, p0, pp1 = (float(t) for t in taps)
    main = np.zeros((128, 256), np.float32)
    for k in range(128):
        main[k, 2 * k] = pm1
        main[k, 2 * k + 1] = p0
        if 2 * k + 2 < 256:
            main[k, 2 * k + 2] = pp1
    prev = np.zeros((128, 256), np.float32)
    prev[127, 0] = pp1
    return np.stack([main, prev])


def _chunk_pad(c, lo, width):
    """Aligned lane window [lo, lo+width) of value ``c``, zero-padded past
    the logical lane count; None if fully out of range."""
    W, mc = c.shape
    hi = min(lo + width, mc)
    if lo >= mc:
        return None
    w = c[:, lo:hi]
    if hi - lo < width:
        w = jnp.concatenate(
            [w, jnp.zeros((W, width - (hi - lo)), c.dtype)], axis=1)
    return w


def _lane_prolong_block(c, pm_ref, m):
    """Expand the lane axis of value ``c`` (W, mc) 1:2 via chunked MXU
    dots with the matrices in ``pm_ref`` (prolong_lane_matrices): fine
    lane 2i+1+o accumulates taps[o+1] * c[:, i].  Returns (W, m) f32
    (m = 2*mc+1)."""
    W, mc = c.shape
    c = c.astype(jnp.float32)
    nQ = (m + 255) // 256
    chunks = []
    for q in range(nQ):
        acc = None
        wmain = _chunk_pad(c, 128 * q, 128)
        if wmain is not None:
            acc = jnp.dot(wmain, pm_ref[0],
                          preferred_element_type=jnp.float32)
        if q > 0:
            wprev = _chunk_pad(c, 128 * (q - 1), 128)
            if wprev is not None:
                d = jnp.dot(wprev, pm_ref[1],
                            preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
        if acc is None:
            acc = jnp.zeros((W, 256), jnp.float32)
        chunks.append(acc)
    out = jnp.concatenate(chunks, axis=1)
    return out[:, :m]


def _smooth_rr_col_kernel(u_prev_ref, u_curr_ref, u_next_ref, b_prev_ref,
                          b_curr_ref, b_next_ref, omega_ref, rm_ref, us_ref,
                          rc_ref, *, c_center, c_w, c_e, c_n, c_s, dinv,
                          wm1, w0, wp1, block_rows_c, n_rows, n_sweeps):
    """_smooth_rr_kernel with the column restriction fused in-kernel:
    writes the smoothed u and the FULLY restricted residual (Rc, mc)."""
    i = pl.program_id(0)
    Rc = block_rows_c
    m = u_curr_ref.shape[1]
    W = 2 * Rc + 16
    f0 = i * (2 * Rc)

    u = jnp.concatenate([u_prev_ref[:], u_curr_ref[:], u_next_ref[:]],
                        axis=0).astype(jnp.float32)
    b = jnp.concatenate([b_prev_ref[:], b_curr_ref[:], b_next_ref[:]],
                        axis=0).astype(jnp.float32)
    gid = jax.lax.broadcasted_iota(jnp.int32, (W, m), 0) + f0 - 8
    col = jax.lax.broadcasted_iota(jnp.int32, (W, m), 1)
    valid = (gid >= 0) & (gid < n_rows)
    u = jnp.where(valid, u, 0.0)
    checker = ((gid + col) % 2) == 0
    masks = (checker & valid, (~checker) & valid)

    zr = jnp.zeros((1, m), u.dtype)
    zc = jnp.zeros((W, 1), u.dtype)
    dw, de, dn_, ds = (c_w * dinv, c_e * dinv, c_n * dinv, c_s * dinv)
    bd = dinv * b
    u = _rb_sweep_loop(u, bd, omega_ref, 0, n_sweeps, masks,
                       (dw, de, dn_, ds), zr, zc)

    up = jnp.concatenate([zr, u[:-1, :]], axis=0)
    dn = jnp.concatenate([u[1:, :], zr], axis=0)
    left = jnp.concatenate([zc, u[:, :-1]], axis=1)
    right = jnp.concatenate([u[:, 1:], zc], axis=1)
    au = c_center * u + _offdiag_sum(up, dn, left, right,
                                     c_w, c_e, c_n, c_s)
    r = jnp.where(valid, b - au, 0.0)

    us_ref[:] = u[8:8 + 2 * Rc].astype(us_ref.dtype)
    body = r[8:8 + 2 * Rc].reshape(Rc, 2, m)
    ev = body[:, 0, :]
    od = body[:, 1, :]
    ev_next = jnp.concatenate([ev[1:], r[8 + 2 * Rc:9 + 2 * Rc]], axis=0)
    rr = wm1 * ev + w0 * od + wp1 * ev_next
    rc_ref[:] = _lane_restrict_block(rr, rm_ref, m).astype(rc_ref.dtype)


def presmooth_residual_restrict(u, b, omegas, stencil_vals, taps,
                                interpret=False):
    """(u_smoothed, rc): like presmooth_residual_rowrestrict but with the
    column (lane) restriction fused in-kernel — rc is the FULLY restricted
    residual of shape (nc, mc).  ``taps`` is the (row, col) 3-tap pair."""
    n, m = u.shape
    nc, mc = (n - 1) // 2, (m - 1) // 2
    S = len(omegas)
    assert 1 <= S <= 3
    Rc = _ROW_BLOCK_COARSE
    c_center, c_w, c_e, c_n, c_s = stencil_vals
    wm1, w0, wp1 = taps[0]
    kernel = functools.partial(
        _smooth_rr_col_kernel, c_center=c_center, c_w=c_w, c_e=c_e, c_n=c_n,
        c_s=c_s, dinv=1.0 / c_center, wm1=wm1, w0=w0, wp1=wp1,
        block_rows_c=Rc, n_rows=n, n_sweeps=S)

    H = 8
    RF = 2 * Rc
    n8 = pl.cdiv(n, H)
    nblk = pl.cdiv(n, RF)
    grid = (nblk,)
    spec_prev = pl.BlockSpec(
        (H, m), lambda i: (jnp.maximum((i * RF) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((RF, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (H, m), lambda i: (jnp.minimum((i * RF + RF) // H, n8 - 1), 0),
        memory_space=pltpu.VMEM)
    spec_mat = pl.BlockSpec((384, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    om = jnp.stack([jnp.asarray(o, jnp.float32)
                    for o in omegas]).reshape(1, S)
    rmat = jnp.asarray(restrict_lane_matrix(taps[1]))
    u_s, rc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  pl.BlockSpec(memory_space=pltpu.SMEM), spec_mat],
        out_specs=[pl.BlockSpec((RF, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((Rc, mc), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nblk * RF, m), u.dtype),
                   jax.ShapeDtypeStruct((nblk * Rc, mc), u.dtype)],
        interpret=interpret,
    )(u, u, u, b, b, b, om, rmat)
    return u_s[:n], rc[:nc]


def _pc_smooth_col_kernel(u_prev_ref, u_curr_ref, u_next_ref, b_prev_ref,
                          b_curr_ref, b_next_ref, e_prev_ref, e_curr_ref,
                          e_next_ref, omega_ref, pm_ref, out_ref, *,
                          c_center, c_w, c_e, c_n, c_s, dinv, pm1, p0, pp1,
                          block_rows_f, n_rows, nc_rows, n_sweeps):
    """_pc_smooth_kernel with the column prolongation fused in-kernel:
    takes the raw coarse correction e (lane width mc) instead of the
    pre-expanded c_half.  (pm1, p0, pp1) are the ROW (sublane) taps; the
    COLUMN (lane) taps live in pm_ref (prolong_lane_matrices)."""
    i = pl.program_id(0)
    R = block_rows_f
    m = u_curr_ref.shape[1]
    W = R + 16
    f0 = i * R
    Rc = R // 2
    i0 = i * Rc

    u = jnp.concatenate([u_prev_ref[:], u_curr_ref[:], u_next_ref[:]],
                        axis=0).astype(jnp.float32)
    b = jnp.concatenate([b_prev_ref[:], b_curr_ref[:], b_next_ref[:]],
                        axis=0).astype(jnp.float32)
    gid = jax.lax.broadcasted_iota(jnp.int32, (W, m), 0) + f0 - 8
    col = jax.lax.broadcasted_iota(jnp.int32, (W, m), 1)
    valid = (gid >= 0) & (gid < n_rows)
    u = jnp.where(valid, u, 0.0)

    # coarse window rows i0-4 .. i0+Rc+3, lane width mc
    Rcw = Rc + 8
    mc = e_curr_ref.shape[1]
    e = jnp.concatenate([e_prev_ref[4:8, :], e_curr_ref[:],
                         e_next_ref[0:4, :]],
                        axis=0).astype(jnp.float32)               # (Rcw, mc)
    cgid = jax.lax.broadcasted_iota(jnp.int32, (Rcw, mc), 0) + i0 - 4
    e = jnp.where((cgid >= 0) & (cgid < nc_rows), e, 0.0)
    c = _lane_prolong_block(e, pm_ref, m)                        # (Rcw, m)
    zc1 = jnp.zeros((1, m), c.dtype)
    c_shift = jnp.concatenate([zc1, c[:-1, :]], axis=0)
    evn = pp1 * c_shift + pm1 * c
    odd = p0 * c
    corr = jnp.stack([evn, odd], axis=1).reshape(2 * Rcw, m)
    omega0 = omega_ref[0, 0]
    u = u + omega0 * jnp.where(valid, corr, 0.0)

    zr = jnp.zeros((1, m), u.dtype)
    zc = jnp.zeros((W, 1), u.dtype)
    checker = ((gid + col) % 2) == 0
    masks = (checker & valid, (~checker) & valid)
    dw, de, dn_, ds = (c_w * dinv, c_e * dinv, c_n * dinv, c_s * dinv)
    bd = dinv * b
    u = _rb_sweep_loop(u, bd, omega_ref, 1, n_sweeps, masks,
                       (dw, de, dn_, ds), zr, zc)

    out_ref[:] = u[8:8 + R].astype(out_ref.dtype)


def prolong_correct_postsmooth_col(u, e, b, omegas, stencil_vals, taps,
                                   interpret=False):
    """Like prolong_correct_postsmooth but taking the raw coarse
    correction ``e`` of shape (nc, mc) — the column (lane) prolongation
    runs in-kernel.  ``taps`` is the (row, col) 3-tap pair; the row taps
    feed the sublane interpolation, the col taps the lane expansion."""
    n, m = u.shape
    nc, mc = e.shape
    assert m == 2 * mc + 1 and n == 2 * nc + 1
    S = len(omegas) - 1
    assert 1 <= S <= 3
    R = _ROW_BLOCK_FINE
    Rc = R // 2
    c_center, c_w, c_e, c_n, c_s = stencil_vals
    kernel = functools.partial(
        _pc_smooth_col_kernel, c_center=c_center, c_w=c_w, c_e=c_e, c_n=c_n,
        c_s=c_s, dinv=1.0 / c_center, pm1=taps[0][0], p0=taps[0][1],
        pp1=taps[0][2], block_rows_f=R, n_rows=n, nc_rows=nc, n_sweeps=S)

    H = 8
    n8 = pl.cdiv(n, H)
    n8c = pl.cdiv(nc, H)
    cblk_max = pl.cdiv(nc, Rc) - 1
    nblk = pl.cdiv(n, R)
    grid = (nblk,)
    spec_prev = pl.BlockSpec(
        (H, m), lambda i: (jnp.maximum((i * R) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((R, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (H, m), lambda i: (jnp.minimum((i * R + R) // H, n8 - 1), 0),
        memory_space=pltpu.VMEM)
    spec_cprev = pl.BlockSpec(
        (H, mc), lambda i: (jnp.clip((i * Rc) // H - 1, 0, n8c - 1), 0),
        memory_space=pltpu.VMEM)
    spec_cmain = pl.BlockSpec(
        (Rc, mc), lambda i: (jnp.minimum(i, cblk_max), 0),
        memory_space=pltpu.VMEM)
    spec_cnext = pl.BlockSpec(
        (H, mc), lambda i: (jnp.minimum((i * Rc + Rc) // H, n8c - 1), 0),
        memory_space=pltpu.VMEM)
    om = jnp.stack([jnp.asarray(o, jnp.float32)
                    for o in omegas]).reshape(1, S + 1)
    pmat = jnp.asarray(prolong_lane_matrices(taps[1]))
    spec_pmat = pl.BlockSpec((2, 128, 256), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  spec_cprev, spec_cmain, spec_cnext,
                  pl.BlockSpec(memory_space=pltpu.SMEM), spec_pmat],
        out_specs=pl.BlockSpec((R, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk * R, m), u.dtype),
        interpret=interpret,
    )(u, u, u, b, b, b, e, e, e, om, pmat)
    return out[:n]


def _vleg_col_kernel(u_prev_ref, u_curr_ref, u_next_ref, b_prev_ref,
                     b_curr_ref, b_next_ref, e_prev_ref, e_curr_ref,
                     e_next_ref, omega_ref, rm_ref, pm_ref, us_ref, rc_ref,
                     *, c_center, c_w, c_e, c_n, c_s, dinv, pm1, p0, pp1,
                     wm1, w0, wp1, block_rows_f, n_rows, nc_rows, n_sweeps):
    """_vleg_kernel with both column transfers fused in-kernel: takes the
    raw coarse correction e (lane width mc) and writes the fully
    restricted residual (Rc, mc)."""
    i = pl.program_id(0)
    R = block_rows_f
    m = u_curr_ref.shape[1]
    W = R + 32
    f0 = i * R
    Rc = R // 2
    i0 = i * Rc

    u = jnp.concatenate([u_prev_ref[:], u_curr_ref[:], u_next_ref[:]],
                        axis=0).astype(jnp.float32)
    b = jnp.concatenate([b_prev_ref[:], b_curr_ref[:], b_next_ref[:]],
                        axis=0).astype(jnp.float32)
    gid = jax.lax.broadcasted_iota(jnp.int32, (W, m), 0) + f0 - 16
    col = jax.lax.broadcasted_iota(jnp.int32, (W, m), 1)
    valid = (gid >= 0) & (gid < n_rows)
    u = jnp.where(valid, u, 0.0)

    Rcw = Rc + 16
    mc = e_curr_ref.shape[1]
    e = jnp.concatenate([e_prev_ref[:], e_curr_ref[:], e_next_ref[:]],
                        axis=0).astype(jnp.float32)              # (Rcw, mc)
    cgid = jax.lax.broadcasted_iota(jnp.int32, (Rcw, mc), 0) + i0 - 8
    e = jnp.where((cgid >= 0) & (cgid < nc_rows), e, 0.0)
    c = _lane_prolong_block(e, pm_ref, m)                        # (Rcw, m)
    zc1 = jnp.zeros((1, m), c.dtype)
    c_shift = jnp.concatenate([zc1, c[:-1, :]], axis=0)
    evn = pp1 * c_shift + pm1 * c
    odd = p0 * c
    corr = jnp.stack([evn, odd], axis=1).reshape(2 * Rcw, m)     # (W, m)
    omega0 = omega_ref[0, 0]
    u = u + omega0 * jnp.where(valid, corr, 0.0)

    zr = jnp.zeros((1, m), u.dtype)
    zc = jnp.zeros((W, 1), u.dtype)
    checker = ((gid + col) % 2) == 0
    masks = (checker & valid, (~checker) & valid)
    dw, de, dn_, ds = (c_w * dinv, c_e * dinv, c_n * dinv, c_s * dinv)
    bd = dinv * b
    u = _rb_sweep_loop(u, bd, omega_ref, 1, n_sweeps, masks,
                       (dw, de, dn_, ds), zr, zc)

    up = jnp.concatenate([zr, u[:-1, :]], axis=0)
    dn = jnp.concatenate([u[1:, :], zr], axis=0)
    left = jnp.concatenate([zc, u[:, :-1]], axis=1)
    right = jnp.concatenate([u[:, 1:], zc], axis=1)
    au = c_center * u + _offdiag_sum(up, dn, left, right,
                                     c_w, c_e, c_n, c_s)
    r = jnp.where(valid, b - au, 0.0)

    us_ref[:] = u[16:16 + R].astype(us_ref.dtype)
    body = r[16:16 + R].reshape(Rc, 2, m)
    ev = body[:, 0, :]
    od = body[:, 1, :]
    ev_next = jnp.concatenate([ev[1:], r[16 + R:17 + R]], axis=0)
    rr = wm1 * ev + w0 * od + wp1 * ev_next
    rc_ref[:] = _lane_restrict_block(rr, rm_ref, m).astype(rc_ref.dtype)


def upleg_downleg_col(u, e, b, omegas, stencil_vals, p_taps, r_taps,
                      interpret=False, block_rows=None):
    """(u_next, rc): upleg_downleg_fused with both column transfers fused
    in-kernel — takes the raw coarse correction ``e`` (nc, mc), returns
    the fully restricted residual (nc, mc).  ``p_taps``/``r_taps`` are
    (row, col) 3-tap pairs."""
    n, m = u.shape
    nc, mc = e.shape
    assert m == 2 * mc + 1 and n == 2 * nc + 1
    S = len(omegas) - 1
    assert 1 <= S <= 6
    R = block_rows or _ROW_BLOCK_FINE
    assert R % 16 == 0
    Rc = R // 2
    c_center, c_w, c_e, c_n, c_s = stencil_vals
    kernel = functools.partial(
        _vleg_col_kernel, c_center=c_center, c_w=c_w, c_e=c_e, c_n=c_n,
        c_s=c_s, dinv=1.0 / c_center, pm1=p_taps[0][0], p0=p_taps[0][1],
        pp1=p_taps[0][2], wm1=r_taps[0][0], w0=r_taps[0][1],
        wp1=r_taps[0][2], block_rows_f=R, n_rows=n, nc_rows=nc, n_sweeps=S)

    H = 16
    Hc = 8
    nH = pl.cdiv(n, H)
    nHc = pl.cdiv(nc, Hc)
    cblk_max = pl.cdiv(nc, Rc) - 1
    nblk = pl.cdiv(n, R)
    grid = (nblk,)
    spec_prev = pl.BlockSpec(
        (H, m), lambda i: (jnp.maximum((i * R) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((R, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (H, m), lambda i: (jnp.minimum((i * R + R) // H, nH - 1), 0),
        memory_space=pltpu.VMEM)
    spec_cprev = pl.BlockSpec(
        (Hc, mc), lambda i: (jnp.clip((i * Rc) // Hc - 1, 0, nHc - 1), 0),
        memory_space=pltpu.VMEM)
    spec_cmain = pl.BlockSpec(
        (Rc, mc), lambda i: (jnp.minimum(i, cblk_max), 0),
        memory_space=pltpu.VMEM)
    spec_cnext = pl.BlockSpec(
        (Hc, mc), lambda i: (jnp.minimum((i * Rc + Rc) // Hc, nHc - 1), 0),
        memory_space=pltpu.VMEM)
    spec_mat = pl.BlockSpec((384, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    om = jnp.stack([jnp.asarray(o, jnp.float32)
                    for o in omegas]).reshape(1, S + 1)
    rmat = jnp.asarray(restrict_lane_matrix(r_taps[1]))
    pmat = jnp.asarray(prolong_lane_matrices(p_taps[1]))
    spec_pmat = pl.BlockSpec((2, 128, 256), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    u_s, rc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  spec_cprev, spec_cmain, spec_cnext,
                  pl.BlockSpec(memory_space=pltpu.SMEM), spec_mat,
                  spec_pmat],
        out_specs=[pl.BlockSpec((R, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((Rc, mc), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nblk * R, m), u.dtype),
                   jax.ShapeDtypeStruct((nblk * Rc, mc), u.dtype)],
        interpret=interpret,
    )(u, u, u, b, b, b, e, e, e, om, rmat, pmat)
    return u_s[:n], rc[:nc]
