"""Wavefront (temporally-blocked) 3D V-cycle legs.

The two-axis-blocked leg kernels (leg3d.py) run each sweep as its own
pass, so the V(2,1) down-leg at 255^3 streams u and b three times with
~1.7x halo read amplification — the 4x-off-HBM-floor gap named in
BASELINE.md rounds 2-3.  Multi-sweep super-fusion with spatial halos
alone needs 6-plane halos that do not fit VMEM; these kernels instead
pipeline a PLANE WAVEFRONT along axis 0 (classic temporal blocking):

* the grid iterates axis-0 blocks of B=4 planes SEQUENTIALLY on one
  core, full (n1, n2) plane extent (no axis-1/2 blocking: a 255^2 f32
  plane is 255 KB — four-plane slabs fit VMEM comfortably);
* the pipeline stages (4 half-sweeps + residual in the down-leg;
  prolong+correct + 2 half-sweeps in the up-leg) each lag their producer
  by one plane; per step each stage computes exactly B planes, consuming
  the producer's fresh planes plus a small VMEM scratch tail carried
  between sequential grid steps — every plane of every stage is computed
  EXACTLY ONCE (no halo recompute at all);
* u and b are read once per leg and the outputs written once.

Down-leg stage plane ranges at input block j (planes [4j, 4j+4)):
  sweep-1 red   [4j-1, 4j+3)        sweep-1 black [4j-2, 4j+2)
  sweep-2 red   [4j-3, 4j+1)        sweep-2 black [4j-4, 4j)  = u block j-1
  residual      [4j-5, 4j-1)        r ring emits    r block j-2
Outputs are written with lagging index maps; drain steps keep the last
real block in the (revisited) output buffer via pl.when-guarded stores.
The down-leg decimates the residual over axes 0/1 in-kernel and emits
the (nc0, nc1, n2) half-restricted array; the lane contraction runs
outside on the MXU.  (Both a full in-kernel restriction — 384x128 tap
matrix + ~1.5 MB of interpolation temporaries — and a full-residual
output — 2 MB more double-buffered VMEM — exceeded the 16 MB
scoped-VMEM limit at 255^3 by ~0.1-0.6 MB.)

Reference counterpart: the generated C++ solver's loop nest per sweep
(ExaStencils treats 3D like 2D); this fusion has no reference
equivalent — it is the TPU-native answer to its OpenMP loop fusion.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .transfer import (_lane_prolong_block, _lane_restrict_block,
                       prolong_lane_matrices, restrict_lane_matrix)

_B = 2          # planes per step (lag 4 = 2 blocks; B=4 windows
                # exceeded the 16 MB scoped-VMEM limit at 255^2 planes)


def _inplane_shifts(v):
    """Zero-edge (Dirichlet) axis-1/axis-2 neighbor views of (P, n1, n2)."""
    P, n1, n2 = v.shape
    z1 = jnp.zeros((P, 1, n2), v.dtype)
    z2 = jnp.zeros((P, n1, 1), v.dtype)
    ym = jnp.concatenate([z1, v[:, :-1]], axis=1)
    yp = jnp.concatenate([v[:, 1:], z1], axis=1)
    zm = jnp.concatenate([z2, v[:, :, :-1]], axis=2)
    zp = jnp.concatenate([v[:, :, 1:], z2], axis=2)
    return ym, yp, zm, zp


def _wavefront_kernel(u_ref, b_ref, om_ref, rm_ref, u_out_ref, rc_out_ref,
                      t_u0, t_1r, t_1b, t_2r, t_2b, t_b, t_r, *,
                      c, dinv, taps0, taps1, n0, n1, n2, nb, nbc, B=_B):
    i = pl.program_id(0)
    cc, cxm, cxp, cym, cyp, czm, czp = c
    # premultiplied form — bitwise-identical update order to the
    # two-axis leg kernels (leg3d._rb2ax_kernel)
    dco = (cxm * dinv, cxp * dinv, cym * dinv, cyp * dinv,
           czm * dinv, czp * dinv)

    @pl.when(i == 0)
    def _init():
        for t in (t_u0, t_1r, t_1b, t_2r, t_2b, t_r):
            t[:] = jnp.zeros_like(t)
        t_b[:] = jnp.zeros_like(t_b)

    jb = i * B      # first plane of this step's input block (clamped map)

    # in-plane parity hoisted across all stages; per-stage plane masks
    # are cheap (B, 1, 1) broadcasts — keeps the big int32 iota
    # temporaries out of every half-sweep (scoped-VMEM pressure)
    g12 = (jax.lax.broadcasted_iota(jnp.int32, (1, n1, n2), 1)
           + jax.lax.broadcasted_iota(jnp.int32, (1, n1, n2), 2))

    def plane_valid(base):
        g0 = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1), 0) + base
        return g0, (g0 >= 0) & (g0 < n0)

    def stage_mask(base, parity):
        g0, valid = plane_valid(base)
        checker = ((g12 + g0) % 2) == 1     # red: even node parity
        mask = (checker if parity == 0 else ~checker) & valid
        return mask, valid

    _, valid_in = plane_valid(jb)
    u0_blk = jnp.where(valid_in, u_ref[:].astype(jnp.float32), 0.0)
    # b needs no validity mask: it only enters pointwise through updates
    # that the stage masks already zero at invalid planes (one less
    # (B, n1, n2) copy — scoped-VMEM pressure)
    b_blk = b_ref[:].astype(jnp.float32)

    # b availability window: planes [jb-5, jb+4)
    b_avail = jnp.concatenate([t_b[:], b_blk], axis=0)

    def halfsweep(win, b_win, base, parity, omega):
        """win: (B+2, n1, n2) planes [base-1, base+B+1); returns the
        updated interior planes [base, base+B).  The off-diagonal sum is
        accumulated SEQUENTIALLY so each shifted copy dies after use —
        the one-expression form kept ~6 plane-slabs live at once and
        pushed scoped VMEM over the 16 MB limit at 255^2 planes."""
        u = win[1:-1]
        off = dco[0] * win[:-2]
        off = off + dco[1] * win[2:]
        z1 = jnp.zeros((B, 1, n2), u.dtype)
        z2 = jnp.zeros((B, n1, 1), u.dtype)
        off = off + dco[2] * jnp.concatenate([z1, u[:, :-1]], axis=1)
        off = off + dco[3] * jnp.concatenate([u[:, 1:], z1], axis=1)
        off = off + dco[4] * jnp.concatenate([z2, u[:, :, :-1]], axis=2)
        off = off + dco[5] * jnp.concatenate([u[:, :, 1:], z2], axis=2)
        upd = omega * (dinv * b_win - u - off)
        mask, valid = stage_mask(base, parity)
        return jnp.where(mask, u + upd, jnp.where(valid, u, 0.0))

    om1 = om_ref[0, 0]
    om2 = om_ref[0, 1]
    w0 = jnp.concatenate([t_u0[:], u0_blk], axis=0)       # [jb-2, jb+4)
    s1r = halfsweep(w0, b_avail[4:4 + B], jb - 1, 0, om1)
    w1 = jnp.concatenate([t_1r[:], s1r], axis=0)          # [jb-3, jb+3)
    s1b = halfsweep(w1, b_avail[3:3 + B], jb - 2, 1, om1)
    w2 = jnp.concatenate([t_1b[:], s1b], axis=0)          # [jb-4, jb+2)
    s2r = halfsweep(w2, b_avail[2:2 + B], jb - 3, 0, om2)
    w3 = jnp.concatenate([t_2r[:], s2r], axis=0)          # [jb-5, jb+1)
    s2b = halfsweep(w3, b_avail[1:1 + B], jb - 4, 1, om2)
    w4 = jnp.concatenate([t_2b[:], s2b], axis=0)          # [jb-6, jb)

    # residual planes [jb-5, jb-1); sequential accumulation as above
    u_c = w4[1:-1]
    au = cc * u_c + cxm * w4[:-2]
    au = au + cxp * w4[2:]
    z1 = jnp.zeros((B, 1, n2), u_c.dtype)
    z2 = jnp.zeros((B, n1, 1), u_c.dtype)
    au = au + cym * jnp.concatenate([z1, u_c[:, :-1]], axis=1)
    au = au + cyp * jnp.concatenate([u_c[:, 1:], z1], axis=1)
    au = au + czm * jnp.concatenate([z2, u_c[:, :, :-1]], axis=2)
    au = au + czp * jnp.concatenate([u_c[:, :, 1:], z2], axis=2)
    _, valid_r = plane_valid(jb - 5)
    r_new = jnp.where(valid_r, b_avail[0:B] - au, 0.0)
    r_win = jnp.concatenate([t_r[:], r_new], axis=0)      # [jb-8, jb-1)

    # ---- axis-0 + axis-1 decimation of the residual IN-KERNEL (cheap:
    # ~0.8 MB of temporaries); the lane (axis 2) contraction runs outside
    # on the MXU — a full-residual output cost 2 MB of double-buffered
    # VMEM and a 2x67 MB HBM round trip.  Coarse block i-2 (planes
    # 2(i-2), 2(i-2)+1) comes from fine planes [4(i-2), 4(i-2)+4] =
    # r_win[0:5].
    rf = r_win[0:5]
    w0m, w00, w0p = taps0
    ra = jnp.stack([
        w0m * rf[0] + w00 * rf[1] + w0p * rf[2],
        w0m * rf[2] + w00 * rf[3] + w0p * rf[4],
    ])                                                    # (2, n1, n2)
    w1m, w10, w1p = taps1
    nc1 = (n1 - 1) // 2
    body = ra[:, :2 * nc1].reshape(2, nc1, 2, n2)
    rev = body[:, :, 0]
    rod = body[:, :, 1]
    rev2 = jnp.concatenate([rev[:, 1:], ra[:, 2 * nc1:2 * nc1 + 1]],
                           axis=1)
    rb = w1m * rev + w10 * rod + w1p * rev2               # (2, nc1, n2)

    # ---- guarded stores (drain steps keep the previous real content).
    # The smoothed u lags 4 planes = 4/B blocks; an rc block of 2 coarse
    # planes covers 4 fine planes and completes every 4/B steps.
    u_lag = 4 // B
    @pl.when(jnp.logical_and(i >= u_lag, i <= nb + u_lag - 1))
    def _store_u():
        u_out_ref[:] = s2b.astype(u_out_ref.dtype)

    rc_ready = (jnp.logical_and(jnp.logical_and(i >= 4, (i % 2) == 0),
                                i <= 2 * nbc + 2) if B == 2 else
                jnp.logical_and(i >= 2, i <= nbc + 1))
    @pl.when(rc_ready)
    def _store_rc():
        # r4->r5: the lane (axis 2) contraction now runs IN-KERNEL as
        # chunked 128-lane MXU dots against the shared banded matrix
        # (transfer._lane_restrict_block) — the previous full-lane rc
        # output cost a (nc0, nc1, n2) HBM round trip plus a separate
        # einsum launch per cycle
        rb_c = _lane_restrict_block(rb.reshape(2 * nc1, n2), rm_ref, n2)
        rc_out_ref[:] = rb_c.reshape(2, nc1, (n2 - 1) // 2) \
            .astype(rc_out_ref.dtype)

    # ---- roll the tails
    t_u0[:] = w0[-2:]
    t_1r[:] = w1[-2:]
    t_1b[:] = w2[-2:]
    t_2r[:] = w3[-2:]
    t_2b[:] = w4[-2:]
    t_b[:] = b_avail[-5:]
    t_r[:] = r_win[-3:]


def supports(u) -> bool:
    """The wavefront kernels keep ~25 full (n1, n2) f32 planes live in
    VMEM (scratch tails + IO blocks + stage windows): gate on the plane
    footprint so 511^2-plane grids fall back to the two-axis leg3d
    kernels."""
    return (u.ndim == 3 and u.dtype in (jnp.float32, jnp.bfloat16)
            and u.shape[0] >= 4 * _B and u.shape[2] >= 63
            and u.shape[1] * u.shape[2] * 4 * 28 <= 14 * 2 ** 20)


def downleg_wavefront_3d(u, b, omegas2, stencil_vals, dinv, taps,
                         interpret=False, block=None):
    """Fused V-cycle down-leg for a constant 7-point operator:
    ``u' = RB(RB(u))`` (two red-black sweeps, omegas2 = (w1, w2)) plus
    the residual with axis-0/axis-1 decimation applied in-kernel.
    Returns ``(u', rc)`` with the FULL restriction applied in-kernel
    (axis-0/1 decimation + chunked-MXU lane contraction), shape
    (nc0, nc1, nc2)."""
    n0, n1, n2 = u.shape
    if block is None:
        # auto-select: B=4 halves the sequential grid-step count
        # (measured 1.501 -> 1.379 ms/cycle at 255^3, checksum-identical,
        # round 5) but roughly doubles the IO-block VMEM; keep a
        # footprint margin and fall back to B=2 near the supports() edge
        block = 4 if n1 * n2 * 4 * 40 <= 14 * 2 ** 20 else _B
    B = block
    if B not in (2, 4):
        raise ValueError("wavefront down-leg supports B in {2, 4}")
    nb = pl.cdiv(n0, B)
    nc0, nc1, nc2 = (n0 - 1) // 2, (n1 - 1) // 2, (n2 - 1) // 2
    nbc = pl.cdiv(nc0, 2)
    grid = ((max(nb + 2, 2 * nbc + 3),) if B == 2
            else (max(nb + 1, nbc + 2),))
    kernel = functools.partial(
        _wavefront_kernel, c=stencil_vals, dinv=dinv,
        taps0=tuple(taps[0]), taps1=tuple(taps[1]),
        n0=n0, n1=n1, n2=n2, nb=nb, nbc=nbc, B=B)
    om = jnp.stack([jnp.asarray(omegas2[0], jnp.float32),
                    jnp.asarray(omegas2[1], jnp.float32)]).reshape(1, 2)
    rmat = jnp.asarray(restrict_lane_matrix(taps[2]))
    plane = (n1, n2)
    scratch = [
        pltpu.VMEM((2,) + plane, jnp.float32),   # t_u0
        pltpu.VMEM((2,) + plane, jnp.float32),   # t_1r
        pltpu.VMEM((2,) + plane, jnp.float32),   # t_1b
        pltpu.VMEM((2,) + plane, jnp.float32),   # t_2r
        pltpu.VMEM((2,) + plane, jnp.float32),   # t_2b
        pltpu.VMEM((5,) + plane, jnp.float32),   # t_b
        pltpu.VMEM((3,) + plane, jnp.float32),   # t_r
    ]
    u_out, rc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, n1, n2),
                         lambda i: (jnp.minimum(i, nb - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, n1, n2),
                         lambda i: (jnp.minimum(i, nb - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((384, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, n1, n2),
                         lambda i: (jnp.clip(i - 4 // B, 0, nb - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, nc1, nc2),
                         (lambda i: (jnp.clip((i - 4) // 2, 0, nbc - 1),
                                     0, 0)) if B == 2 else
                         (lambda i: (jnp.clip(i - 2, 0, nbc - 1), 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb * B, n1, n2), u.dtype),
            jax.ShapeDtypeStruct((nbc * 2, nc1, nc2), u.dtype),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(u, b, om, rmat)
    return u_out[:n0], rc[:nc0]


def _upleg_kernel(u_ref, e_ref, b_ref, om_ref, pm_ref, u_out_ref,
                  t_e, t_pc, t_sr, t_b, t_out, *,
                  c, dinv, taps0, taps1, n0, n1, n2, nc0, nb, B=_B):
    """Fine block pipeline: prolong+correct (lag 0), red half-sweep
    (lag 1), black half-sweep (lag 2 planes — one block at B=2; at B=4
    the 2-plane lag straddles the block boundary, carried by the t_out
    output tail)."""
    i = pl.program_id(0)
    cc, cxm, cxp, cym, cyp, czm, czp = c
    dco = (cxm * dinv, cxp * dinv, cym * dinv, cyp * dinv,
           czm * dinv, czp * dinv)

    @pl.when(i == 0)
    def _init():
        for t in (t_e, t_pc, t_sr, t_b, t_out):
            t[:] = jnp.zeros_like(t)

    jb = i * B
    E = B // 2          # coarse planes consumed per step
    g0_in = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1), 0) + jb
    valid_in = g0_in < n0
    u_blk = jnp.where(valid_in, u_ref[:].astype(jnp.float32), 0.0)
    b_blk = b_ref[:].astype(jnp.float32)
    gc = jax.lax.broadcasted_iota(jnp.int32, (E, 1, 1), 0) + E * i
    e_blk = jnp.where(gc < nc0, e_ref[:].astype(jnp.float32), 0.0)
    e_win = jnp.concatenate([t_e[:], e_blk], axis=0)   # coarse [Ei-1, Ei+E)

    # ---- prolong + correct: fine planes [jb, jb+B), ic = Ei..Ei+E-1
    # axis-0: fine 2ic <- w0p*e[ic-1] + w0m*e[ic]; fine 2ic+1 <- w00*e[ic]
    w0m, w00, w0p = taps0
    a0 = jnp.stack(
        [w0p * e_win[0] + w0m * e_win[1], w00 * e_win[1]] if B == 2 else
        [w0p * e_win[0] + w0m * e_win[1], w00 * e_win[1],
         w0p * e_win[1] + w0m * e_win[2], w00 * e_win[2]]
    )                                                   # (B, nc1, nc2)
    # axis-1 (sublane) interpolation, full extent
    w1m, w10, w1p = taps1
    nc1 = a0.shape[1]
    zrow = jnp.zeros((B, 1, a0.shape[2]), a0.dtype)
    prev = jnp.concatenate([zrow, a0[:, :-1]], axis=1)  # e[jc-1]
    revn = w1p * prev + w1m * a0                        # fine row 2jc
    rodd = w10 * a0                                     # fine row 2jc+1
    a1 = jnp.stack([revn, rodd], axis=2).reshape(B, 2 * nc1, -1)
    # last fine row 2*nc1 only sees e[nc1-1] from below
    a1 = jnp.concatenate([a1, w1p * a0[:, nc1 - 1:nc1]], axis=1)
    corr = jnp.stack([_lane_prolong_block(a1[p], pm_ref, n2)
                      for p in range(B)])               # (B, n1, n2)
    om_c = om_ref[0, 0]
    om_s = om_ref[0, 1]
    pc_new = jnp.where(valid_in, u_blk + om_c * corr, 0.0)

    b_avail = jnp.concatenate([t_b[:], b_blk], axis=0)  # [jb-2, jb+2)

    g12 = (jax.lax.broadcasted_iota(jnp.int32, (1, n1, n2), 1)
           + jax.lax.broadcasted_iota(jnp.int32, (1, n1, n2), 2))

    def halfsweep(win, b_win, base, parity):
        u = win[1:-1]
        off = dco[0] * win[:-2]
        off = off + dco[1] * win[2:]
        z1 = jnp.zeros((B, 1, n2), u.dtype)
        z2 = jnp.zeros((B, n1, 1), u.dtype)
        off = off + dco[2] * jnp.concatenate([z1, u[:, :-1]], axis=1)
        off = off + dco[3] * jnp.concatenate([u[:, 1:], z1], axis=1)
        off = off + dco[4] * jnp.concatenate([z2, u[:, :, :-1]], axis=2)
        off = off + dco[5] * jnp.concatenate([u[:, :, 1:], z2], axis=2)
        upd = om_s * (dinv * b_win - u - off)
        g0 = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1), 0) + base
        valid = (g0 >= 0) & (g0 < n0)
        checker = ((g12 + g0) % 2) == 1
        mask = (checker if parity == 0 else ~checker) & valid
        return jnp.where(mask, u + upd, jnp.where(valid, u, 0.0))

    w0_ = jnp.concatenate([t_pc[:], pc_new], axis=0)    # [jb-2, jb+2)
    s_r = halfsweep(w0_, b_avail[1:1 + B], jb - 1, 0)   # [jb-1, jb+1)
    w1_ = jnp.concatenate([t_sr[:], s_r], axis=0)       # [jb-3, jb+1)
    s_b = halfsweep(w1_, b_avail[0:B], jb - 2, 1)       # [jb-2, jb)

    if B == 2:
        @pl.when(jnp.logical_and(i >= 1, i <= nb))
        def _store_u():
            u_out_ref[:] = s_b.astype(u_out_ref.dtype)
    else:
        # block (i-1) = planes [jb-4, jb): the carried t_out pair
        # [jb-4, jb-2) plus this step's s_b[0:2] = [jb-2, jb)
        @pl.when(jnp.logical_and(i >= 1, i <= nb))
        def _store_u():
            u_out_ref[:] = jnp.concatenate(
                [t_out[:], s_b[0:2]], axis=0).astype(u_out_ref.dtype)
        t_out[:] = s_b[2:4]

    t_e[:] = e_win[-1:]
    t_pc[:] = w0_[-2:]
    t_sr[:] = w1_[-2:]
    t_b[:] = b_avail[-2:]


def upleg_wavefront_3d(u, e, b, omega_c, omega_s, stencil_vals, dinv,
                       taps, interpret=False, block=None):
    """Fused V-cycle up-leg for a constant 7-point operator:
    ``u' = RB(u + omega_c * P(e))`` — prolongation, coarse-grid
    correction, and ONE red-black post-smoothing sweep in a single
    wavefront pass.  Returns ``u'``."""
    n0, n1, n2 = u.shape
    nc0, nc1, nc2 = e.shape
    assert (n0, n1, n2) == (2 * nc0 + 1, 2 * nc1 + 1, 2 * nc2 + 1)
    if block is None:
        block = 4 if n1 * n2 * 4 * 40 <= 14 * 2 ** 20 else _B
    B = block
    if B not in (2, 4):
        raise ValueError("wavefront up-leg supports B in {2, 4}")
    E = B // 2
    nb = pl.cdiv(n0, B)
    nbe = pl.cdiv(nc0, E)
    grid = (nb + 1,)
    pmat = jnp.asarray(prolong_lane_matrices(taps[2]))
    kernel = functools.partial(
        _upleg_kernel, c=stencil_vals, dinv=dinv, taps0=tuple(taps[0]),
        taps1=tuple(taps[1]), n0=n0, n1=n1, n2=n2, nc0=nc0, nb=nb, B=B)
    om = jnp.stack([jnp.asarray(omega_c, jnp.float32),
                    jnp.asarray(omega_s, jnp.float32)]).reshape(1, 2)
    plane = (n1, n2)
    scratch = [
        pltpu.VMEM((1, nc1, nc2), jnp.float32),   # t_e
        pltpu.VMEM((2,) + plane, jnp.float32),    # t_pc
        pltpu.VMEM((2,) + plane, jnp.float32),    # t_sr
        pltpu.VMEM((2,) + plane, jnp.float32),    # t_b
        pltpu.VMEM((2,) + plane, jnp.float32),    # t_out (B=4 store tail)
    ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, n1, n2),
                         lambda i: (jnp.minimum(i, nb - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, nc1, nc2),
                         lambda i: (jnp.minimum(i, nbe - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, n1, n2),
                         lambda i: (jnp.minimum(i, nb - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 128, 256), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, n1, n2), lambda i: (jnp.clip(i - 1, 0, nb - 1), 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * B, n1, n2), u.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(u, e, b, om, pmat)
    return out[:n0]
