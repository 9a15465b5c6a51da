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


def _fused_sys_kernel(u_prev_ref, u_curr_ref, u_next_ref, b_prev_ref,
                      b_curr_ref, b_next_ref, omega_ref, out_ref, *,
                      coeffs, minv, n_fields, block_rows, n_rows,
                      n_half_sweeps):
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
            upd = omega * upd if upd is not None else jnp.zeros_like(us[fi])
            out.append(us[fi] + jnp.where(mask, upd, 0.0))
        return out

    for parity in range(n_half_sweeps):
        us = halfsweep(us, parity)
    for k in range(F):
        out_ref[k, :, :] = us[k][2:R + 2]


def _sys_sweep_call(fields, b_fields, omega, coeffs, minv, *,
                    n_half_sweeps, interpret=False):
    F = len(fields)
    n, m = fields[0].shape
    R = _BLOCK_ROWS
    grid = (pl.cdiv(n, R),)
    kernel = functools.partial(
        _fused_sys_kernel, coeffs=coeffs, minv=minv, n_fields=F,
        block_rows=R, n_rows=n, n_half_sweeps=n_half_sweeps)

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
                         interpret=False):
    """Full coupled red-black system sweep in one fused pass."""
    return _sys_sweep_call(fields, b_fields, omega, coeffs, minv,
                           n_half_sweeps=2, interpret=interpret)


def jacobi_sweep_sys(fields, b_fields, omega, coeffs, minv,
                     interpret=False):
    """Coupled damped-Jacobi system sweep in one fused pass."""
    return _sys_sweep_call(fields, b_fields, omega, coeffs, minv,
                           n_half_sweeps=1, interpret=interpret)
