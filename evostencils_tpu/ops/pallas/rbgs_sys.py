"""Pallas TPU kernels for block-system smoothing sweeps (linear elasticity).

The reference's coupled solvers (example_problems/LinearElasticity/
2D_FD_LinearElasticity_fromL2.exa3:2-16: ``generate solver for u in uEq
and v in vEq`` with RB-GS) smooth a PDE *system*: every point update needs
the residual of all F coupled fields.  The generic XLA path materializes
F² stencil applications, F residuals and F corrections as full-grid
intermediates per half-sweep; this kernel fuses a FULL red-black (or
Jacobi) system sweep into one pass that streams the stacked (F, n, m)
fields and right-hand sides exactly once.

Block entries may be any constant stencil inside the 3x3 offset box —
covers the elasticity operator ((lambda+mu) dxx/dyy + lambda Laplace on
the diagonal, (lambda+mu) dxy cross-derivative corners off it).  The point
solve is a constant FxF matrix: the inverse of the center-coefficient
matrix (collective / ElementwiseDiagonal smoothing) or of its diagonal
(decoupled Diagonal smoothing) — for the reference elasticity operator the
two coincide because dxy has no center entry.

Almost-uniform row exceptions (``exc`` / ``exc_minv``): operators whose
CENTER coefficient differs by a constant on a handful of axis-0 rows —
the split-complex Helmholtz Robin fold (reference
Helmholtz/2D_FD_Helmholtz_fromL3.exa4:24-40 folds the Sommerfeld ghost
relation into the first/last interior row's diagonal) — are handled with
pure scalar fixups selected by the in-kernel global-row iota: ``exc`` is
a tuple of ``(row, FxF center-coefficient deltas)``, ``exc_minv`` of
``(row, FxF point-inverse deltas)``.  Zero extra memory traffic.

Window/halo scheme identical to ops/pallas/rbgs.py: row-block tiling with
two halo rows per side so the black half recomputes post-red edge
neighbors locally.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: offset order of the per-block coefficient vectors
NINE_OFFSETS = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1),
                (-1, -1), (-1, 1), (1, -1), (1, 1))

_BLOCK_ROWS = 32


def nine_point_coeffs(stencil) -> Optional[Tuple[float, ...]]:
    """Coefficients of a constant 2D stencil in NINE_OFFSETS order, or
    None if it reaches outside the 3x3 box or is complex."""
    entries = dict(stencil.entries)
    if set(entries) - set(NINE_OFFSETS):
        return None
    if any(isinstance(v, complex) for v in entries.values()):
        return None
    return tuple(float(entries.get(o, 0.0)) for o in NINE_OFFSETS)


def supports(fields, coeffs) -> bool:
    u = fields[0]
    return (coeffs is not None and len(fields) >= 2 and u.ndim == 2
            and all(f.shape == u.shape and f.dtype == u.dtype
                    for f in fields)
            and u.dtype in (jnp.float32, jnp.bfloat16)
            and u.shape[0] >= 8 and u.shape[1] >= 128
            and u.shape[0] > _BLOCK_ROWS)


def _exc_center_terms(au, fi, us, gid, exc):
    """Add the exceptional-row center-coefficient contributions of row
    ``fi`` of the block operator to the accumulated ``A u`` terms."""
    for row, dmat in exc:
        for fj in range(len(us)):
            d = dmat[fi][fj]
            if d != 0.0:
                term = jnp.where(gid == row, d * us[fj], 0.0)
                au = term if au is None else au + term
    return au


def _exc_minv_terms(upd, fi, rs, gid, exc_minv):
    """Add the exceptional-row point-inverse contributions to an update."""
    for row, dmat in exc_minv:
        for fj in range(len(rs)):
            d = dmat[fi][fj]
            if d != 0.0:
                term = jnp.where(gid == row, d * rs[fj], 0.0)
                upd = term if upd is None else upd + term
    return upd


def _fused_sys_kernel(u_prev_ref, u_curr_ref, u_next_ref, b_prev_ref,
                      b_curr_ref, b_next_ref, omega_ref, out_ref, *,
                      coeffs, minv, n_fields, block_rows, n_rows,
                      n_half_sweeps, exc=(), exc_minv=()):
    """Red AND black half-sweeps (or one Jacobi sweep) of an FxF
    block-stencil system over a row block, on stacked (F, rows, m)
    fields.  coeffs[i][j][k] is block (i,j)'s coefficient at
    NINE_OFFSETS[k]; minv is the constant FxF point-solve matrix.  Same
    discarded-edge-rows exactness argument as rbgs._fused_rb_kernel."""
    i = pl.program_id(0)
    F = n_fields
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
    us = [jnp.where(valid, window(u_prev_ref, u_curr_ref, u_next_ref, k), 0.0)
          for k in range(F)]
    bs = [window(b_prev_ref, b_curr_ref, b_next_ref, k) for k in range(F)]

    col = jax.lax.broadcasted_iota(jnp.int32, (W, m), 1)
    checker = ((gid + col) % 2) == 0
    if n_half_sweeps == 1:
        masks = (valid,)
    else:
        masks = (checker & valid, (~checker) & valid)
    zr = jnp.zeros((1, m), us[0].dtype)
    zc = jnp.zeros((W, 1), us[0].dtype)

    def shifts(u):
        """Views of u at the NINE_OFFSETS (zero outside the window)."""
        up = jnp.concatenate([zr, u[:-1, :]], axis=0)
        dn = jnp.concatenate([u[1:, :], zr], axis=0)

        def left(v):
            return jnp.concatenate([zc, v[:, :-1]], axis=1)

        def right(v):
            return jnp.concatenate([v[:, 1:], zc], axis=1)

        return (u, up, dn, left(u), right(u),
                left(up), right(up), left(dn), right(dn))

    def halfsweep(us, parity):
        sh = [shifts(u) for u in us]
        rs = []
        for fi in range(F):
            au = None
            for fj in range(F):
                for k in range(9):
                    c = coeffs[fi][fj][k]
                    if c == 0.0:
                        continue
                    term = c * sh[fj][k]
                    au = term if au is None else au + term
            au = _exc_center_terms(au, fi, us, gid, exc)
            rs.append(bs[fi] - (au if au is not None else 0.0))
        mask = masks[parity]
        out = []
        for fi in range(F):
            upd = None
            for fj in range(F):
                if minv[fi][fj] == 0.0:
                    continue
                term = minv[fi][fj] * rs[fj]
                upd = term if upd is None else upd + term
            upd = _exc_minv_terms(upd, fi, rs, gid, exc_minv)
            upd = omega * upd if upd is not None else jnp.zeros_like(us[fi])
            out.append(us[fi] + jnp.where(mask, upd, 0.0))
        return out

    for parity in range(n_half_sweeps):
        us = halfsweep(us, parity)
    for k in range(F):
        out_ref[k, :, :] = us[k][2:R + 2]


def _sys_sweep_call(fields, b_fields, omega, coeffs, minv, *,
                    n_half_sweeps, exc=(), exc_minv=(), interpret=False):
    F = len(fields)
    n, m = fields[0].shape
    R = _BLOCK_ROWS
    grid = (pl.cdiv(n, R),)
    kernel = functools.partial(
        _fused_sys_kernel, coeffs=coeffs, minv=minv, n_fields=F,
        block_rows=R, n_rows=n, n_half_sweeps=n_half_sweeps,
        exc=exc, exc_minv=exc_minv)

    us = jnp.stack(list(fields))
    bs = jnp.stack(list(b_fields))

    H = 8
    n8 = pl.cdiv(n, H)
    spec_prev = pl.BlockSpec(
        (F, H, m), lambda i: (0, jnp.maximum((i * R) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((F, R, m), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (F, H, m), lambda i: (0, jnp.minimum((i * R + R) // H, n8 - 1), 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((F, R, m), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, n, m), fields[0].dtype),
        interpret=interpret,
    )(us, us, us, bs, bs, bs,
      jnp.asarray(omega).reshape(1, 1).astype(fields[0].dtype))
    return tuple(out[k] for k in range(F))


def fused_rbgs_sweep_sys(fields, b_fields, omega, coeffs, minv,
                         exc=(), exc_minv=(), interpret=False):
    """Full coupled red-black system sweep in one fused pass."""
    return _sys_sweep_call(fields, b_fields, omega, coeffs, minv,
                           n_half_sweeps=2, exc=exc, exc_minv=exc_minv,
                           interpret=interpret)


def jacobi_sweep_sys(fields, b_fields, omega, coeffs, minv,
                     exc=(), exc_minv=(), interpret=False):
    """Coupled damped-Jacobi system sweep in one fused pass."""
    return _sys_sweep_call(fields, b_fields, omega, coeffs, minv,
                           n_half_sweeps=1, exc=exc, exc_minv=exc_minv,
                           interpret=interpret)


# ---------------------------------------------------------------------------
# Super kernels: S system sweeps + residuals + FULL restriction /
# prolongation + correction + S post-sweeps (constant FxF 9-point blocks).
# ---------------------------------------------------------------------------
# Same leg structure as the scalar col-fused kernels
# (ops/pallas/transfer.py): 8-row halos cover S <= 3 sweeps plus the
# residual; all F fields and right-hand sides stream ONCE per leg.

from .transfer import (_lane_restrict_block, _lane_prolong_block,
                       restrict_lane_matrix, prolong_lane_matrices)

# smaller row blocks than the scalar kernels: the F-field windows double
# the live set (measured: Rc=32 OOMs scoped VMEM by 3.5M at 2047^2 F=2)
_SYS_BLOCK_COARSE = 16
_SYS_BLOCK_FINE = 32


def _sys_windows(u_refs, b_refs, F, f0, n_rows, halo, W, m):
    def window(refs, k):
        return jnp.concatenate([refs[0][k], refs[1][k], refs[2][k]],
                               axis=0).astype(jnp.float32)

    gid = jax.lax.broadcasted_iota(jnp.int32, (W, m), 0) + f0 - halo
    col = jax.lax.broadcasted_iota(jnp.int32, (W, m), 1)
    valid = (gid >= 0) & (gid < n_rows)
    us = [jnp.where(valid, window(u_refs, k), 0.0) for k in range(F)]
    bs = [window(b_refs, k) for k in range(F)]
    return us, bs, gid, col, valid


def _sys_shifts(u, zr, zc):
    up = jnp.concatenate([zr, u[:-1, :]], axis=0)
    dn = jnp.concatenate([u[1:, :], zr], axis=0)

    def left(v):
        return jnp.concatenate([zc, v[:, :-1]], axis=1)

    def right(v):
        return jnp.concatenate([v[:, 1:], zc], axis=1)

    return (u, up, dn, left(u), right(u),
            left(up), right(up), left(dn), right(dn))


def _sys_residuals(us, bs, coeffs, gid=None, exc=(), valid=None):
    F = len(us)
    W, m = us[0].shape
    zr = jnp.zeros((1, m), us[0].dtype)
    zc = jnp.zeros((W, 1), us[0].dtype)
    sh = [_sys_shifts(u, zr, zc) for u in us]
    rs = []
    for fi in range(F):
        au = None
        for fj in range(F):
            for k in range(9):
                c = coeffs[fi][fj][k]
                if c == 0.0:
                    continue
                term = c * sh[fj][k]
                au = term if au is None else au + term
        if exc:
            au = _exc_center_terms(au, fi, us, gid, exc)
        r = bs[fi] - (au if au is not None else 0.0)
        rs.append(jnp.where(valid, r, 0.0) if valid is not None else r)
    return rs


def _sys_halfsweeps(us, bs, coeffs, minv, masks, omega_ref, om0, n_sweeps,
                    gid=None, exc=(), exc_minv=()):
    F = len(us)
    for s in range(n_sweeps):
        omega = omega_ref[0, om0 + s]
        for parity in range(len(masks)):
            rs = _sys_residuals(us, bs, coeffs, gid, exc)
            mask = masks[parity]
            nxt = []
            for fi in range(F):
                upd = None
                for fj in range(F):
                    if minv[fi][fj] == 0.0:
                        continue
                    term = minv[fi][fj] * rs[fj]
                    upd = term if upd is None else upd + term
                upd = _exc_minv_terms(upd, fi, rs, gid, exc_minv)
                upd = omega * upd if upd is not None \
                    else jnp.zeros_like(us[fi])
                nxt.append(us[fi] + jnp.where(mask, upd, 0.0))
            us = nxt
    return us


def _sys_smooth_rr_kernel(u_p, u_c, u_n, b_p, b_c, b_n, omega_ref, rm_ref,
                          us_ref, rc_ref, *, coeffs, minv, n_fields, wm1,
                          w0, wp1, block_rows_c, n_rows, n_sweeps,
                          red_black, exc=(), exc_minv=()):
    i = pl.program_id(0)
    F = n_fields
    Rc = block_rows_c
    m = u_c.shape[2]
    W = 2 * Rc + 16
    f0 = i * (2 * Rc)
    us, bs, gid, col, valid = _sys_windows(
        (u_p, u_c, u_n), (b_p, b_c, b_n), F, f0, n_rows, 8, W, m)
    if red_black:
        checker = ((gid + col) % 2) == 0
        masks = (checker & valid, (~checker) & valid)
    else:
        masks = (valid,)
    us = _sys_halfsweeps(us, bs, coeffs, minv, masks, omega_ref, 0,
                         n_sweeps, gid, exc, exc_minv)
    rs = _sys_residuals(us, bs, coeffs, gid, exc, valid)
    for k in range(F):
        us_ref[k] = us[k][8:8 + 2 * Rc].astype(us_ref.dtype)
        body = rs[k][8:8 + 2 * Rc].reshape(Rc, 2, m)
        ev = body[:, 0, :]
        od = body[:, 1, :]
        ev_next = jnp.concatenate(
            [ev[1:], rs[k][8 + 2 * Rc:9 + 2 * Rc]], axis=0)
        rr = wm1 * ev + w0 * od + wp1 * ev_next
        rc_ref[k] = _lane_restrict_block(rr, rm_ref, m).astype(rc_ref.dtype)


def presmooth_residual_restrict_sys(fields, b_fields, omegas, coeffs, minv,
                                    taps, red_black=True, exc=(),
                                    exc_minv=(), interpret=False):
    """(smoothed fields, restricted residuals): S coupled sweeps of an
    FxF 9-point block system + residuals + FULL 2:1 restriction per
    field, one HBM pass over all fields and right-hand sides."""
    F = len(fields)
    n, m = fields[0].shape
    nc, mc = (n - 1) // 2, (m - 1) // 2
    S = len(omegas)
    assert 1 <= S <= 3
    Rc = _SYS_BLOCK_COARSE
    kernel = functools.partial(
        _sys_smooth_rr_kernel, coeffs=coeffs, minv=minv, n_fields=F,
        wm1=taps[0][0], w0=taps[0][1], wp1=taps[0][2], block_rows_c=Rc,
        n_rows=n, n_sweeps=S, red_black=red_black, exc=exc,
        exc_minv=exc_minv)
    H = 8
    RF = 2 * Rc
    n8 = pl.cdiv(n, H)
    nblk = pl.cdiv(n, RF)
    spec_prev = pl.BlockSpec(
        (F, H, m), lambda i: (0, jnp.maximum((i * RF) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((F, RF, m), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (F, H, m),
        lambda i: (0, jnp.minimum((i * RF + RF) // H, n8 - 1), 0),
        memory_space=pltpu.VMEM)
    spec_mat = pl.BlockSpec((384, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    om = jnp.stack([jnp.asarray(o, jnp.float32)
                    for o in omegas]).reshape(1, S)
    rmat = jnp.asarray(restrict_lane_matrix(taps[1]))
    us = jnp.stack(list(fields))
    bs = jnp.stack(list(b_fields))
    u_s, rc = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  pl.BlockSpec(memory_space=pltpu.SMEM), spec_mat],
        out_specs=[pl.BlockSpec((F, RF, m), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((F, Rc, mc), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((F, nblk * RF, m),
                                        fields[0].dtype),
                   jax.ShapeDtypeStruct((F, nblk * Rc, mc),
                                        fields[0].dtype)],
        interpret=interpret,
    )(us, us, us, bs, bs, bs, om, rmat)
    return (tuple(u_s[k, :n] for k in range(F)),
            tuple(rc[k, :nc] for k in range(F)))


def _sys_pc_smooth_kernel(u_p, u_c, u_n, b_p, b_c, b_n, e_p, e_c, e_n,
                          omega_ref, pm_ref, out_ref, *, coeffs, minv,
                          n_fields, pm1, p0, pp1, block_rows_f, n_rows,
                          nc_rows, n_sweeps, red_black, exc=(),
                          exc_minv=()):
    i = pl.program_id(0)
    F = n_fields
    R = block_rows_f
    m = u_c.shape[2]
    W = R + 16
    f0 = i * R
    Rc = R // 2
    i0 = i * Rc
    us, bs, gid, col, valid = _sys_windows(
        (u_p, u_c, u_n), (b_p, b_c, b_n), F, f0, n_rows, 8, W, m)

    Rcw = Rc + 8
    mc = e_c.shape[2]
    cgid = jax.lax.broadcasted_iota(jnp.int32, (Rcw, mc), 0) + i0 - 4
    omega0 = omega_ref[0, 0]
    nxt = []
    for k in range(F):
        e = jnp.concatenate([e_p[k, 4:8, :], e_c[k], e_n[k, 0:4, :]],
                            axis=0).astype(jnp.float32)
        e = jnp.where((cgid >= 0) & (cgid < nc_rows), e, 0.0)
        c_half = _lane_prolong_block(e, pm_ref, m)
        zc1 = jnp.zeros((1, m), c_half.dtype)
        c_shift = jnp.concatenate([zc1, c_half[:-1, :]], axis=0)
        evn = pp1 * c_shift + pm1 * c_half
        odd = p0 * c_half
        corr = jnp.stack([evn, odd], axis=1).reshape(2 * Rcw, m)
        nxt.append(us[k] + omega0 * jnp.where(valid, corr, 0.0))
    us = nxt

    if red_black:
        checker = ((gid + col) % 2) == 0
        masks = (checker & valid, (~checker) & valid)
    else:
        masks = (valid,)
    us = _sys_halfsweeps(us, bs, coeffs, minv, masks, omega_ref, 1,
                         n_sweeps, gid, exc, exc_minv)
    for k in range(F):
        out_ref[k] = us[k][8:8 + R].astype(out_ref.dtype)


def prolong_correct_postsmooth_sys(fields, e_fields, b_fields, omegas,
                                   coeffs, minv, taps, red_black=True,
                                   exc=(), exc_minv=(), interpret=False):
    """fields + omega0 * P(e) per field (full in-kernel 1:2
    interpolation), then ``len(omegas)-1`` coupled sweeps — one HBM pass
    over all fields, right-hand sides and coarse corrections."""
    F = len(fields)
    n, m = fields[0].shape
    nc, mc = e_fields[0].shape
    assert m == 2 * mc + 1 and n == 2 * nc + 1
    S = len(omegas) - 1
    assert 1 <= S <= 3
    R = _SYS_BLOCK_FINE
    Rc = R // 2
    kernel = functools.partial(
        _sys_pc_smooth_kernel, coeffs=coeffs, minv=minv, n_fields=F,
        pm1=taps[0][0], p0=taps[0][1], pp1=taps[0][2], block_rows_f=R,
        n_rows=n, nc_rows=nc, n_sweeps=S, red_black=red_black, exc=exc,
        exc_minv=exc_minv)
    H = 8
    n8 = pl.cdiv(n, H)
    n8c = pl.cdiv(nc, H)
    cblk_max = pl.cdiv(nc, Rc) - 1
    nblk = pl.cdiv(n, R)
    spec_prev = pl.BlockSpec(
        (F, H, m), lambda i: (0, jnp.maximum((i * R) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((F, R, m), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (F, H, m), lambda i: (0, jnp.minimum((i * R + R) // H, n8 - 1), 0),
        memory_space=pltpu.VMEM)
    espec_prev = pl.BlockSpec(
        (F, H, mc),
        lambda i: (0, jnp.clip((i * Rc) // H - 1, 0, n8c - 1), 0),
        memory_space=pltpu.VMEM)
    espec_main = pl.BlockSpec(
        (F, Rc, mc), lambda i: (0, jnp.minimum(i, cblk_max), 0),
        memory_space=pltpu.VMEM)
    espec_next = pl.BlockSpec(
        (F, H, mc),
        lambda i: (0, jnp.minimum((i * Rc + Rc) // H, n8c - 1), 0),
        memory_space=pltpu.VMEM)
    spec_pmat = pl.BlockSpec((2, 128, 256), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    om = jnp.stack([jnp.asarray(o, jnp.float32)
                    for o in omegas]).reshape(1, S + 1)
    pmat = jnp.asarray(prolong_lane_matrices(taps[1]))
    us = jnp.stack(list(fields))
    es = jnp.stack([e.astype(fields[0].dtype) for e in e_fields])
    bs = jnp.stack(list(b_fields))
    out = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  espec_prev, espec_main, espec_next,
                  pl.BlockSpec(memory_space=pltpu.SMEM), spec_pmat],
        out_specs=pl.BlockSpec((F, R, m), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, nblk * R, m), fields[0].dtype),
        interpret=interpret,
    )(us, us, us, bs, bs, bs, es, es, es, om, pmat)
    return tuple(out[k, :n] for k in range(F))
