"""Two-axis-blocked Pallas kernels for the 3D (7-point) V-cycle legs.

At the 255^3 bench size a single (n1, n2) plane is 262 KB padded, so the
plane-blocked kernels of rbgs3d.py cannot hold multi-plane windows plus
double-buffered blocks inside the ~16 MB VMEM — which is why round-2 ran
255^3 on the generic XLA path at ~12x the HBM floor (BASELINE.md).  These
kernels block BOTH leading axes (grid = axis-0 blocks x axis-1 blocks)
with halo refs per axis (and corners — multi-half-sweep corruption
spreads corner-wise), keeping windows at ~1-3 MB:

* ``fused_rbgs_sweep_3d2``  — one full red-black sweep (red then black),
  u and b streamed once;
* ``residual_restrict_3d``  — r = b - A u fused with the FULL 2:1
  restriction (axis 0: 3-tap over planes; axis 1: sublane reshape;
  axis 2: chunked MXU decimation, transfer._lane_restrict_block);
* ``prolong_correct_3d``    — u + omega * P(e) with the full 1:2
  interpolation in-kernel (axis 2 via transfer._lane_prolong_block).

Remaining gap (recorded for the per-leg table): halo read amplification
~(B0+2H0)/B0 * (B1+2H1)/B1 at the VMEM-bound block sizes; multi-sweep
super-fusion (the 2D kernels' S<=3 chains) would need 6-plane halos that
do not fit — the wavefront/temporal-blocking design is the follow-up.

Reference counterpart: ExaStencils' generated C++ treats 3D identically
to 2D (reference stencils/gallery.py:55-84, Poisson/3D_FD_*).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .transfer import (_lane_restrict_block, _lane_prolong_block,
                       _offdiag_sum, restrict_lane_matrix,
                       prolong_lane_matrices)

# block sizes (axis0 planes, axis1 rows); halos H0=2 planes, H1=8 rows.
# B1=128 measured best on the 255^3 sweep (scripts/tpu_sweep_leg3d_blocks
# .py, 2026-08-21): 1.909 ms/cycle vs 2.377 at 96 — the padded axis-1
# extent (256) divides into exactly two blocks, so no ragged tail; wider
# (8,160+) and taller (12+,128) windows OOM scoped VMEM
_B0 = 8
_B1 = 128
_H0 = 2
_H1 = 8


def _nine_specs(B0, B1, n2, H0, H1, nH0, nH1, cmax0=None, cmax1=None):
    """BlockSpecs of the 3x3 window pieces of one array: center block and
    axis/corner halos.  Index maps clamp at the boundary; out-of-range
    content is masked in-kernel via global iotas.  ``cmax0/cmax1`` clamp
    the CENTER maps too (needed when the grid is derived from a finer
    array with more blocks than this one, e.g. the coarse correction in
    prolong_correct_3d)."""
    def c0(i):
        return i if cmax0 is None else jnp.minimum(i, cmax0)

    def p0(i):
        return jnp.maximum((i * B0) // H0 - 1, 0)

    def n0_(i):
        return jnp.minimum((i * B0 + B0) // H0, nH0 - 1)

    def c1(j):
        return j if cmax1 is None else jnp.minimum(j, cmax1)

    def p1(j):
        return jnp.maximum((j * B1) // H1 - 1, 0)

    def n1_(j):
        return jnp.minimum((j * B1 + B1) // H1, nH1 - 1)

    mk = lambda sh, im: pl.BlockSpec(sh, im, memory_space=pltpu.VMEM)
    return [
        mk((H0, H1, n2), lambda i, j: (p0(i), p1(j), 0)),   # pp
        mk((H0, B1, n2), lambda i, j: (p0(i), c1(j), 0)),   # pc
        mk((H0, H1, n2), lambda i, j: (p0(i), n1_(j), 0)),  # pn
        mk((B0, H1, n2), lambda i, j: (c0(i), p1(j), 0)),   # cp
        mk((B0, B1, n2), lambda i, j: (c0(i), c1(j), 0)),   # cc
        mk((B0, H1, n2), lambda i, j: (c0(i), n1_(j), 0)),  # cn
        mk((H0, H1, n2), lambda i, j: (n0_(i), p1(j), 0)),  # np
        mk((H0, B1, n2), lambda i, j: (n0_(i), c1(j), 0)),  # nc
        mk((H0, H1, n2), lambda i, j: (n0_(i), n1_(j), 0)),  # nn
    ]


def _window(refs):
    """Assemble the (B0+2H0, B1+2H1, n2) window from the 9 pieces."""
    pp, pc, pn, cp, cc, cn, np_, nc_, nn = refs
    top = jnp.concatenate([pp[:], pc[:], pn[:]], axis=1)
    mid = jnp.concatenate([cp[:], cc[:], cn[:]], axis=1)
    bot = jnp.concatenate([np_[:], nc_[:], nn[:]], axis=1)
    return jnp.concatenate([top, mid, bot], axis=0)


def _masked_window(refs, f0, r0, n0, n1, H0, H1):
    w = _window(refs).astype(jnp.float32)
    W0, W1, n2 = w.shape
    g0 = jax.lax.broadcasted_iota(jnp.int32, (W0, W1, n2), 0) + f0 - H0
    g1 = jax.lax.broadcasted_iota(jnp.int32, (W0, W1, n2), 1) + r0 - H1
    valid = (g0 >= 0) & (g0 < n0) & (g1 >= 0) & (g1 < n1)
    return jnp.where(valid, w, 0.0), g0, g1, valid


def _shifts3(v):
    W0, W1, n2 = v.shape
    z0 = jnp.zeros((1, W1, n2), v.dtype)
    z1 = jnp.zeros((W0, 1, n2), v.dtype)
    z2 = jnp.zeros((W0, W1, 1), v.dtype)
    xm = jnp.concatenate([z0, v[:-1]], axis=0)
    xp = jnp.concatenate([v[1:], z0], axis=0)
    ym = jnp.concatenate([z1, v[:, :-1]], axis=1)
    yp = jnp.concatenate([v[:, 1:], z1], axis=1)
    zm = jnp.concatenate([z2, v[:, :, :-1]], axis=2)
    zp = jnp.concatenate([v[:, :, 1:], z2], axis=2)
    return xm, xp, ym, yp, zm, zp


def _apply7(v, c):
    # FMA-form on purpose (the factored isotropic variant measured
    # net-slower on v5e — see transfer._offdiag_sum note)
    cc, cxm, cxp, cym, cyp, czm, czp = c
    xm, xp, ym, yp, zm, zp = _shifts3(v)
    return (cc * v + cxm * xm + cxp * xp + cym * ym + cyp * yp
            + czm * zm + czp * zp)


# ---------------------------------------------------------------------------
# fused red-black sweep
# ---------------------------------------------------------------------------

def _rb2ax_kernel(*refs, c, dinv, B0, B1, n0, n1, n_half_sweeps):
    u_refs = refs[0:9]
    b_refs = refs[9:18]
    omega_ref = refs[18]
    out_ref = refs[19]
    i = pl.program_id(0)
    j = pl.program_id(1)
    f0 = i * B0
    r0 = j * B1
    u, g0, g1, valid = _masked_window(u_refs, f0, r0, n0, n1, _H0, _H1)
    b = _window(b_refs).astype(jnp.float32)
    g2 = jax.lax.broadcasted_iota(jnp.int32, u.shape, 2)
    checker = ((g0 + g1 + g2) % 2) == 1    # red: even node parity
    if n_half_sweeps == 1:
        masks = (valid,)
    else:
        masks = (checker & valid, (~checker) & valid)
    omega = omega_ref[0, 0]
    cc, cxm, cxp, cym, cyp, czm, czp = c
    dco = (cxm * dinv, cxp * dinv, cym * dinv, cyp * dinv,
           czm * dinv, czp * dinv)
    bd = dinv * b
    for parity in range(len(masks)):
        xm, xp, ym, yp, zm, zp = _shifts3(u)
        off = (dco[0] * xm + dco[1] * xp + dco[2] * ym + dco[3] * yp
               + dco[4] * zm + dco[5] * zp)
        upd = omega * (bd - u - off)
        u = u + jnp.where(masks[parity], upd, 0.0)
    out_ref[:] = u[_H0:_H0 + B0, _H1:_H1 + B1].astype(out_ref.dtype)


def _call_2ax(kernel, u, b, extra_inputs, extra_specs, out_shapes,
              out_specs, B0, B1, interpret):
    n0, n1, n2 = u.shape
    nH0 = pl.cdiv(n0, _H0)
    nH1 = pl.cdiv(n1, _H1)
    grid = (pl.cdiv(n0, B0), pl.cdiv(n1, B1))
    specs9 = _nine_specs(B0, B1, n2, _H0, _H1, nH0, nH1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs9 + specs9 + extra_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*([u] * 9 + [b] * 9 + extra_inputs))


def fused_rbgs_sweep_3d2(u, b, omega, stencil_vals, dinv, interpret=False,
                         n_half_sweeps=2):
    """One full red-black sweep (or Jacobi with n_half_sweeps=1) of a
    constant 7-point operator; u and b streamed ~once (halo amplification
    (B0+4)/B0 * (B1+16)/B1)."""
    n0, n1, n2 = u.shape
    B0 = min(_B0, max(2, n0))
    B1 = min(_B1, max(_H1, -(-n1 // _H1) * _H1))
    kernel = functools.partial(
        _rb2ax_kernel, c=stencil_vals, dinv=dinv, B0=B0, B1=B1, n0=n0,
        n1=n1, n_half_sweeps=n_half_sweeps)
    om = jnp.asarray(omega, jnp.float32).reshape(1, 1)
    nblk0 = pl.cdiv(n0, B0)
    nblk1 = pl.cdiv(n1, B1)
    out = _call_2ax(
        kernel, u, b, [om], [pl.BlockSpec(memory_space=pltpu.SMEM)],
        jax.ShapeDtypeStruct((nblk0 * B0, nblk1 * B1, n2), u.dtype),
        pl.BlockSpec((B0, B1, n2), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        B0, B1, interpret)
    return out[:n0, :n1]


def jacobi_sweep_3d2(u, b, omega, stencil_vals, dinv, interpret=False):
    return fused_rbgs_sweep_3d2(u, b, omega, stencil_vals, dinv,
                                interpret=interpret, n_half_sweeps=1)


# ---------------------------------------------------------------------------
# residual + full 3D restriction
# ---------------------------------------------------------------------------

def _rr3d_kernel(*refs, c, taps0, B0c, B1c, n0, n1, m2):
    """Coarse block (B0c, B1c, mc2) of R(b - A u).

    The fine window is the 3x3 piece assembly with the CENTER fine block
    (2*B0c, 2*B1c, n2); coarse cell (ic, jc, kc) samples fine
    (2ic+1+o0, 2jc+1+o1, 2kc+1+o2)."""
    u_refs = refs[0:9]
    b_refs = refs[9:18]
    rm_ref = refs[18]
    out_ref = refs[19]
    i = pl.program_id(0)
    j = pl.program_id(1)
    B0, B1 = 2 * B0c, 2 * B1c
    f0 = i * B0
    r0 = j * B1
    u, g0, g1, valid = _masked_window(u_refs, f0, r0, n0, n1, _H0, _H1)
    b = _window(b_refs).astype(jnp.float32)
    r = jnp.where(valid, b - _apply7(u, c), 0.0)

    # axis-0 (plane) 3-tap: coarse plane ic samples fine 2ic, 2ic+1, 2ic+2.
    # Strided leading-axis slices lower to (unsupported 3D) gathers in
    # Mosaic; the pair reshape on the untiled axis is supported.
    w0m, w00, w0p = taps0[0]
    planes = r[_H0:_H0 + B0 + 1]              # fine planes f0 .. f0+B0
    body0 = planes[:B0].reshape(B0c, 2, planes.shape[1], planes.shape[2])
    ev = body0[:, 0]                          # 2ic      (B0c planes)
    od = body0[:, 1]                          # 2ic+1
    ev2 = jnp.concatenate([ev[1:], planes[B0:B0 + 1]], axis=0)  # 2ic+2
    ra = w0m * ev + w00 * od + w0p * ev2      # (B0c, W1, n2)

    # axis-1 (sublane) 3-tap via pair reshape
    w1m, w10, w1p = taps0[1]
    rows = ra[:, _H1:_H1 + B1 + 1]            # rows r0 .. r0+B1
    body = rows[:, :B1].reshape(B0c, B1c, 2, -1)
    rev = body[:, :, 0]
    rod = body[:, :, 1]
    rev2 = jnp.concatenate([rev[:, 1:], rows[:, B1:B1 + 1]], axis=1)
    rb = w1m * rev + w10 * rod + w1p * rev2   # (B0c, B1c, n2)

    # axis-2 (lane) decimation on the MXU, plane by plane
    mc2 = (m2 - 1) // 2
    out = jnp.stack([_lane_restrict_block(rb[p], rm_ref, m2)
                     for p in range(rb.shape[0])])
    out_ref[:] = out.astype(out_ref.dtype)


def residual_restrict_3d(u, b, stencil_vals, taps, interpret=False):
    """(nc0, nc1, nc2) full restriction of the residual of a constant
    7-point operator; ``taps`` = per-axis (w-1, w0, w+1) triples."""
    n0, n1, n2 = u.shape
    nc0, nc1, nc2 = (n0 - 1) // 2, (n1 - 1) // 2, (n2 - 1) // 2
    B0c = max(1, min(_B0 // 2, nc0))
    B1c = max(4, min(_B1 // 2, -(-nc1 // 8) * 8))
    kernel = functools.partial(
        _rr3d_kernel, c=stencil_vals, taps0=taps, B0c=B0c, B1c=B1c,
        n0=n0, n1=n1, m2=n2)
    rmat = jnp.asarray(restrict_lane_matrix(taps[2]))
    spec_mat = pl.BlockSpec((384, 128), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    # the grid is derived from the FINE array (2*B0c blocks must cover
    # n0), which can exceed cdiv(nc0, B0c); pad the output accordingly
    nblk0 = pl.cdiv(n0, 2 * B0c)
    nblk1 = pl.cdiv(n1, 2 * B1c)
    out = _call_2ax(
        kernel, u, b, [rmat], [spec_mat],
        jax.ShapeDtypeStruct((nblk0 * B0c, nblk1 * B1c, nc2), u.dtype),
        pl.BlockSpec((B0c, B1c, nc2), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        2 * B0c, 2 * B1c, interpret)
    return out[:nc0, :nc1]


# ---------------------------------------------------------------------------
# prolongation + correction
# ---------------------------------------------------------------------------

def _pc3d_kernel(u_ref, e_pp, e_pc, e_pn, e_cp, e_cc, e_cn, e_np, e_nc,
                 e_nn, omega_ref, pm_ref, out_ref, *, taps0, B0, B1,
                 nc0, nc1, m2):
    """Fine block (B0, B1, n2) of u + omega * P(e).

    Coarse window pieces carry halos (1 plane / row each side suffices;
    the shared _H0/_H1 halo widths are reused).  Fine (f0+t) interpolates
    coarse planes (f0+t-1-o0)/2."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    f0 = i * B0
    r0 = j * B1
    B0c, B1c = B0 // 2, B1 // 2
    c0 = i * B0c
    c1 = j * B1c
    e, g0, g1, valid = _masked_window(
        (e_pp, e_pc, e_pn, e_cp, e_cc, e_cn, e_np, e_nc, e_nn),
        c0, c1, nc0, nc1, _H0, _H1)

    # axis-0 interpolation: fine plane 2ic+1+o <- taps0[0][o+1] * e[ic]
    w0m, w00, w0p = taps0[0]
    body = e[_H0 - 1:_H0 + B0c]               # coarse planes c0-1 .. c0+B0c-1
    prev = body[:-1]                          # ic-1 for ic = c0..c0+B0c-1
    cur = body[1:]
    evn = w0p * prev + w0m * cur              # fine 2ic
    odd = w00 * cur                           # fine 2ic+1
    a0 = jnp.stack([evn, odd], axis=1).reshape(2 * B0c, *evn.shape[1:])

    # axis-1 interpolation (sublane)
    w1m, w10, w1p = taps0[1]
    rows = a0[:, _H1 - 1:_H1 + B1c]
    rprev = rows[:, :-1]
    rcur = rows[:, 1:]
    revn = w1p * rprev + w1m * rcur
    rodd = w10 * rcur
    a1 = jnp.stack([revn, rodd], axis=2).reshape(a0.shape[0], B1, -1)

    # axis-2 lane expansion (MXU), plane by plane
    corr = jnp.stack([_lane_prolong_block(a1[p], pm_ref, m2)
                      for p in range(a1.shape[0])])
    fg0 = jax.lax.broadcasted_iota(jnp.int32, corr.shape, 0) + f0
    fg1 = jax.lax.broadcasted_iota(jnp.int32, corr.shape, 1) + r0
    u = u_ref[:].astype(jnp.float32)
    omega = omega_ref[0, 0]
    out = u + omega * jnp.where((fg0 < 2 * nc0 + 1) & (fg1 < 2 * nc1 + 1),
                                corr, 0.0)
    out_ref[:] = out.astype(out_ref.dtype)


def prolong_correct_3d(u, e, omega, taps, interpret=False):
    """u + omega * P(e) for the multilinear-family separable 3D
    interpolation; ``taps`` = per-axis (w-1, w0, w+1) triples."""
    n0, n1, n2 = u.shape
    nc0, nc1, nc2 = e.shape
    assert (n0, n1, n2) == (2 * nc0 + 1, 2 * nc1 + 1, 2 * nc2 + 1)
    B0 = min(_B0, max(2, n0))
    B1 = min(_B1, max(2 * _H1, -(-n1 // _H1) * _H1))
    kernel = functools.partial(
        _pc3d_kernel, taps0=taps, B0=B0, B1=B1, nc0=nc0, nc1=nc1, m2=n2)
    nH0 = pl.cdiv(nc0, _H0)
    nH1 = pl.cdiv(nc1, _H1)
    B0c, B1c = B0 // 2, B1 // 2
    especs = _nine_specs(B0c, B1c, nc2, _H0, _H1, nH0, nH1,
                         cmax0=pl.cdiv(nc0, B0c) - 1,
                         cmax1=pl.cdiv(nc1, B1c) - 1)
    pmat = jnp.asarray(prolong_lane_matrices(taps[2]))
    spec_pmat = pl.BlockSpec((2, 128, 256), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    spec_u = pl.BlockSpec((B0, B1, n2), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    nblk0 = pl.cdiv(n0, B0)
    nblk1 = pl.cdiv(n1, B1)
    om = jnp.asarray(omega, jnp.float32).reshape(1, 1)
    out = pl.pallas_call(
        kernel,
        grid=(nblk0, nblk1),
        in_specs=[spec_u] + especs +
                 [pl.BlockSpec(memory_space=pltpu.SMEM), spec_pmat],
        out_specs=spec_u,
        out_shape=jax.ShapeDtypeStruct((nblk0 * B0, nblk1 * B1, n2),
                                       u.dtype),
        interpret=interpret,
    )(u, *([e] * 9), om, pmat)
    return out[:n0, :n1]


def seven_taps(r_fac, p_fac) -> Optional[Tuple]:
    """Per-axis 3-tap triples of separable 3D transfer factorizations
    (ops.apply.separable_factors output), else None."""
    out = []
    for vectors, radii in (r_fac, p_fac):
        if len(vectors) != 3 or any(r != 1 for r in radii):
            return None
        triple = []
        for v in vectors:
            if len(v) != 3 or any(isinstance(x, complex) for x in v):
                return None
            triple.append(tuple(float(x) for x in v))
        out.append(tuple(triple))
    return tuple(out)


def supports(u) -> bool:
    return (u.ndim == 3 and u.dtype in (jnp.float32, jnp.bfloat16)
            and u.shape[0] >= 2 * _B0 + 1 and u.shape[1] >= 2 * _H1 + 1
            and u.shape[2] >= 63 and all(s % 2 == 1 for s in u.shape))
