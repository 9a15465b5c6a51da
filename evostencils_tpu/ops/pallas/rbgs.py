"""Pallas TPU kernels for the hot smoothing sweeps.

The XLA path materializes several full-grid intermediates per half-sweep
(padded u, residual, correction); these kernels fuse one half-sweep into a
single read-u/read-b/write-u pass at HBM roofline — the per-chip
speed-of-light target of SURVEY.md §7.6.

Kernels operate on 2D f32/bf16 grids with a constant 5-point stencil and a
constant diagonal (scalar Poisson-class smoothers — the dominant benchmark
path).  Row-block tiling; the row halo is exchanged by shifting three
block-row views of u (BlockSpec index_map), the column halo is handled
in-register.  Everything else falls back to the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import apply as ops_apply

_DEFAULT_BLOCK_ROWS = 128


def _pick_block_rows(n: int) -> int:
    # main blocks must have row counts divisible by 8 (TPU sublane tiling)
    # or span the whole array
    return n if n <= _DEFAULT_BLOCK_ROWS else _DEFAULT_BLOCK_ROWS


def _sweep_kernel(u_prev_ref, u_curr_ref, u_next_ref, b_ref, omega_ref,
                  out_ref, *, c_center, c_w, c_e, c_n, c_s, dinv,
                  block_rows, n_rows, parity):
    """One masked damped-Jacobi half-sweep on a row block.

    u_prev/u_next are single-row halo views of the same array (the rows
    just outside this block); out-of-range halo rows are zeroed (Dirichlet),
    so u is streamed ~once per half-sweep.
    parity: 0 -> update even node-parity (red), 1 -> odd (black),
            -1 -> update everything (plain Jacobi sweep).
    """
    i = pl.program_id(0)
    R = block_rows
    m = u_curr_ref.shape[1]
    # f32 compute regardless of storage dtype (bf16 in-kernel arithmetic
    # diverges on hardware — BASELINE.md 2026-08-21; identity for f32)
    u = u_curr_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)

    # row neighbors: up[r] = u[global r-1], down[r] = u[global r+1];
    # the halo views are 8-row blocks (TPU tiling), the needed row is the
    # last/first row respectively
    up = jnp.concatenate([u_prev_ref[7:8, :].astype(jnp.float32),
                          u[:-1, :]], axis=0)
    down = jnp.concatenate([u[1:, :],
                            u_next_ref[0:1, :].astype(jnp.float32)], axis=0)
    row0 = i * R
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, m), 0) + row0

    # Dirichlet: zero the halo rows that fall outside the grid
    up = jnp.where(row_ids == 0, 0.0, up)
    down = jnp.where(row_ids == n_rows - 1, 0.0, down)
    # rows beyond the grid (ragged last block) contribute nothing
    valid = row_ids < n_rows

    # column neighbors with Dirichlet zeros
    zero_col = jnp.zeros((R, 1), u.dtype)
    left = jnp.concatenate([zero_col, u[:, :-1]], axis=1)
    right = jnp.concatenate([u[:, 1:], zero_col], axis=1)

    au = (c_center * u + c_w * up + c_e * down + c_n * left + c_s * right)
    r = b - au
    omega = omega_ref[0, 0]
    update = omega * dinv * r
    if parity >= 0:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, m), 1)
        # node parity: interior (i, j) is node (i+1, j+1)
        mask = ((row_ids + col_ids) % 2) == parity
        update = jnp.where(mask, update, 0.0)
    out_ref[:] = jnp.where(valid, u + update, u).astype(out_ref.dtype)


def _sweep_call(u, b, omega, *, stencil_vals, dinv, parity,
                interpret=False):
    n, m = u.shape
    R = _pick_block_rows(n)
    grid = (pl.cdiv(n, R),)
    c_center, c_w, c_e, c_n, c_s = stencil_vals

    kernel = functools.partial(
        _sweep_kernel, c_center=c_center, c_w=c_w, c_e=c_e, c_n=c_n, c_s=c_s,
        dinv=dinv, block_rows=R, n_rows=n, parity=parity)

    H = 8  # halo view height (minimum sublane tile)
    n8 = pl.cdiv(n, H)
    # halo rows as (8, m) blocks: u is streamed ~once, plus two halo tiles.
    # prev halo block ends at row i*R-1 (R % 8 == 0 for multi-block grids);
    # next halo block starts at row (i+1)*R.
    spec_prev = pl.BlockSpec(
        (H, m), lambda i: (jnp.maximum((i * R) // H - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_curr = pl.BlockSpec((R, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (H, m), lambda i: (jnp.minimum((i * R + R) // H, n8 - 1), 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_prev, spec_curr, spec_next,
                  pl.BlockSpec((R, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((R, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        interpret=interpret,
    )(u, u, u, b, omega.reshape(1, 1).astype(jnp.float32))


def five_point_values(stencil) -> Optional[Tuple[float, ...]]:
    """(center, west, east, north, south) of a constant 5-point 2D stencil,
    or None if the stencil has any other shape."""
    entries = dict(stencil.entries)
    wanted = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]
    if set(entries) - set(wanted):
        return None
    if any(isinstance(v, complex) for v in entries.values()):
        return None
    return tuple(float(entries.get(o, 0.0)) for o in wanted)


def supports(u, stencil_vals) -> bool:
    return (u.ndim == 2 and u.dtype in (jnp.float32, jnp.bfloat16)
            and stencil_vals is not None
            and u.shape[0] >= 8 and u.shape[1] >= 128)


def rbgs_sweep(u, b, omega, stencil_vals, dinv, interpret=False):
    """Full red-black sweep: red half then black half, fused per half."""
    u = _sweep_call(u, b, omega, stencil_vals=stencil_vals, dinv=dinv,
                    parity=0, interpret=interpret)
    return _sweep_call(u, b, omega, stencil_vals=stencil_vals, dinv=dinv,
                       parity=1, interpret=interpret)


def jacobi_sweep(u, b, omega, stencil_vals, dinv, interpret=False):
    return _sweep_call(u, b, omega, stencil_vals=stencil_vals, dinv=dinv,
                       parity=-1, interpret=interpret)


def _fused_rb_kernel(u_prev_ref, u_curr_ref, u_next_ref, b_prev_ref,
                     b_curr_ref, b_next_ref, omega_ref, out_ref, *,
                     c_center, c_w, c_e, c_n, c_s, dinv, block_rows, n_rows):
    """Red AND black half-sweeps in one pass over a row block.

    The black update of the block's edge rows needs post-red values of one
    row outside the block; those are recomputed locally from a 2-row halo
    (redundant work on 2 rows per block buys halving the HBM traffic of a
    full sweep: u and b are streamed once instead of twice)."""
    i = pl.program_id(0)
    R = block_rows
    m = u_curr_ref.shape[1]
    r0 = i * R
    omega = omega_ref[0, 0]
    W = R + 4  # window rows r0-2 .. r0+R+1

    # Both half-sweeps run over the FULL window (never a row sub-slice):
    # Mosaic rejects lane-dim concats whose inputs sit at a sublane offset,
    # so all intermediates must stay at row offset 0.  Window edge rows get
    # zero out-of-window neighbors; their updated values are only ever used
    # as neighbors of rows whose output is itself discarded, so the final
    # out slice is exact.
    # f32 compute regardless of storage dtype (bf16 in-kernel arithmetic
    # diverges on hardware — BASELINE.md 2026-08-21; identity for f32)
    u_full = jnp.concatenate([u_prev_ref[6:8, :], u_curr_ref[:],
                              u_next_ref[0:2, :]],
                             axis=0).astype(jnp.float32)         # (W, m)
    gid = jax.lax.broadcasted_iota(jnp.int32, (W, m), 0) + r0 - 2
    u_full = jnp.where((gid >= 0) & (gid < n_rows), u_full, 0.0)
    b_full = jnp.concatenate([b_prev_ref[6:8, :], b_curr_ref[:],
                              b_next_ref[0:2, :]],
                             axis=0).astype(jnp.float32)         # (W, m)

    col = jax.lax.broadcasted_iota(jnp.int32, (W, m), 1)
    valid = (gid >= 0) & (gid < n_rows)
    checker = ((gid + col) % 2) == 0
    masks = (checker & valid, (~checker) & valid)
    zr = jnp.zeros((1, m), u_full.dtype)
    zc = jnp.zeros((W, 1), u_full.dtype)

    def halfsweep(u, parity):
        from .transfer import _offdiag_sum
        up = jnp.concatenate([zr, u[:-1, :]], axis=0)
        dn = jnp.concatenate([u[1:, :], zr], axis=0)
        left = jnp.concatenate([zc, u[:, :-1]], axis=1)
        right = jnp.concatenate([u[:, 1:], zc], axis=1)
        au = c_center * u + _offdiag_sum(up, dn, left, right,
                                         c_w, c_e, c_n, c_s)
        upd = omega * dinv * (b_full - au)
        return u + jnp.where(masks[parity], upd, 0.0)

    u_blk = halfsweep(halfsweep(u_full, 0), 1)
    out_ref[:] = u_blk[2:R + 2].astype(out_ref.dtype)


def fused_rbgs_sweep(u, b, omega, stencil_vals, dinv, interpret=False):
    """Full red-black sweep in ONE fused pass (u, b streamed once)."""
    n, m = u.shape
    # the fused kernel holds ~2x the live intermediates of a half-sweep;
    # smaller row blocks keep it inside the 16 MB scoped-VMEM budget at
    # wide grids (halo overhead is 4/R rows of redundant compute)
    R = n if n <= 64 else 64
    if n <= R:
        # single block: no halo machinery needed, fall back to two passes
        return rbgs_sweep(u, b, omega, stencil_vals, dinv,
                          interpret=interpret)
    grid = (pl.cdiv(n, R),)
    c_center, c_w, c_e, c_n, c_s = stencil_vals
    kernel = functools.partial(
        _fused_rb_kernel, c_center=c_center, c_w=c_w, c_e=c_e, c_n=c_n,
        c_s=c_s, dinv=dinv, block_rows=R, n_rows=n)

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
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((R, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        interpret=interpret,
    )(u, u, u, b, b, b, omega.reshape(1, 1).astype(jnp.float32))
