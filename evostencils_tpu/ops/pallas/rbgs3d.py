"""Pallas TPU kernels for 3D (7-point) smoothing sweeps.

Same design as the 2D kernels (ops/pallas/rbgs.py) lifted to volumes: the
grid iterates over plane blocks along axis 0; axis-0 halos come from
shifted 2-plane views of the same array, axis-1 (sublane) and axis-2
(lane) neighbor shifts are in-register concats.  The fused red-black
kernel runs both half-sweeps in one pass with a 2-plane halo each side
(the black update of an edge plane needs post-red values one plane out),
so u and b are streamed once per full sweep — the reference's generated
C++ makes two full sweeps over memory per RB smoothing step
(/root/reference code_generation/exastencils.py:659-682 coloring).

Replaces the generic lowering path for scalar constant-coefficient
7-point operators (3D Poisson class, reference
example_problems/Poisson/3D_FD_Poisson_fromL2.exa2:11-20).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: offsets of a 7-point star, matching the value order of
#: ``seven_point_values``
SEVEN_OFFSETS = [(0, 0, 0), (-1, 0, 0), (1, 0, 0),
                 (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)]

# scoped-VMEM budget model (measured on v5e, 16 MB scoped limit): the
# kernel holds ~8 live (W, n1, n2) windows plus double-buffered u/b/out
# blocks, i.e. plane_bytes * (8*(B0+4) + 6*B0) must stay under ~15 MB
_VMEM_BUDGET = 15 * 2 ** 20
_LIVE_WINDOWS = 8
_BLOCK_COPIES = 6


def _max_block_planes(plane_bytes: int) -> int:
    b = (_VMEM_BUDGET // max(plane_bytes, 1) - 4 * _LIVE_WINDOWS) \
        // (_LIVE_WINDOWS + _BLOCK_COPIES)
    return b - (b % 2)


def seven_point_values(stencil) -> Optional[Tuple[float, ...]]:
    """(center, -x, +x, -y, +y, -z, +z) of a constant 7-point 3D stencil,
    or None for any other shape."""
    entries = dict(stencil.entries)
    if set(entries) - set(SEVEN_OFFSETS):
        return None
    if any(isinstance(v, complex) for v in entries.values()):
        return None
    return tuple(float(entries.get(o, 0.0)) for o in SEVEN_OFFSETS)


def supports(u, stencil_vals) -> bool:
    if u.ndim != 3:
        return False
    # Mosaic pads planes to (8, 128) tiles — budget on the PADDED size
    n1p = -(-u.shape[1] // 8) * 8
    n2p = -(-u.shape[2] // 128) * 128
    plane_bytes = n1p * n2p * u.dtype.itemsize
    # lanes pad to 128; allow 63-wide grids (2^6-1) — the padding waste
    # still beats the generic path's extra full-grid passes
    return (u.dtype in (jnp.float32, jnp.bfloat16)
            and stencil_vals is not None
            and u.shape[0] >= 4 and u.shape[1] >= 8 and u.shape[2] >= 63
            and _max_block_planes(plane_bytes) >= 4)


def _pick_block_planes(n0: int, plane_bytes: int) -> int:
    """Even plane-block size keeping the kernel inside scoped VMEM."""
    b = max(2, _max_block_planes(plane_bytes))
    if b >= n0:
        return n0 + (n0 % 2)   # single block (padded to even)
    return min(b, 32)


def _fused_rb3d_kernel(u_prev_ref, u_curr_ref, u_next_ref, b_prev_ref,
                       b_curr_ref, b_next_ref, omega_ref, out_ref, *,
                       c, dinv, block_planes, n0, n_sweeps, parity_of):
    """``n_sweeps`` full red-black sweeps on one plane block.

    Window = main block + 2*n_sweeps-plane halos (held as 2-plane views,
    n_sweeps <= 1 fused pair per launch here: W = B0 + 4).  Window-edge
    planes get zero out-of-window neighbors; their updated values are only
    used as neighbors of planes whose output is discarded, so the written
    block is exact (same argument as the 2D fused kernel)."""
    i = pl.program_id(0)
    B0 = block_planes
    _, n1, n2 = u_curr_ref.shape
    W = B0 + 4
    f0 = i * B0

    u = jnp.concatenate([u_prev_ref[:], u_curr_ref[:], u_next_ref[:]],
                        axis=0)                                 # (W, n1, n2)
    b = jnp.concatenate([b_prev_ref[:], b_curr_ref[:], b_next_ref[:]],
                        axis=0)
    g0 = jax.lax.broadcasted_iota(jnp.int32, (W, n1, n2), 0) + f0 - 2
    g1 = jax.lax.broadcasted_iota(jnp.int32, (W, n1, n2), 1)
    g2 = jax.lax.broadcasted_iota(jnp.int32, (W, n1, n2), 2)
    valid = (g0 >= 0) & (g0 < n0)
    u = jnp.where(valid, u, 0.0)
    # red = even node-parity: interior (i,j,k) is node (i+1,j+1,k+1)
    checker = ((g0 + g1 + g2) % 2) == 1
    masks = (checker & valid, (~checker) & valid)

    z0 = jnp.zeros((1, n1, n2), u.dtype)
    z1 = jnp.zeros((W, 1, n2), u.dtype)
    z2 = jnp.zeros((W, n1, 1), u.dtype)
    cc, cxm, cxp, cym, cyp, czm, czp = c
    # fold dinv into the off-diagonal coefficients (update form
    # u += w*mask*(dinv*b - u - offdiag'(u)), hoisting dinv*b)
    dxm, dxp = cxm * dinv, cxp * dinv
    dym, dyp = cym * dinv, cyp * dinv
    dzm, dzp = czm * dinv, czp * dinv
    bd = dinv * b

    def offdiag(v):
        xm = jnp.concatenate([z0, v[:-1]], axis=0)
        xp = jnp.concatenate([v[1:], z0], axis=0)
        ym = jnp.concatenate([z1, v[:, :-1]], axis=1)
        yp = jnp.concatenate([v[:, 1:], z1], axis=1)
        zm = jnp.concatenate([z2, v[:, :, :-1]], axis=2)
        zp = jnp.concatenate([v[:, :, 1:], z2], axis=2)
        return (dxm * xm + dxp * xp + dym * ym + dyp * yp
                + dzm * zm + dzp * zp)

    for k in range(n_sweeps):
        omega = omega_ref[0, k]
        for p in parity_of:
            upd = omega * (bd - u - offdiag(u))
            if p < 0:
                u = u + jnp.where(valid, upd, 0.0)
            else:
                u = u + jnp.where(masks[p], upd, 0.0)

    out_ref[:] = u[2:B0 + 2]


def _sweep_call_3d(u, b, omegas, stencil_vals, dinv, parity_of,
                   interpret=False):
    # the 2-plane halo covers exactly one fused red+black pass
    assert len(omegas) == 1
    n0, n1, n2 = u.shape
    plane_bytes = (-(-n1 // 8) * 8) * (-(-n2 // 128) * 128) * u.dtype.itemsize
    B0 = _pick_block_planes(n0, plane_bytes)
    nblk = pl.cdiv(n0, B0)
    n2blk = pl.cdiv(n0, 2)
    kernel = functools.partial(
        _fused_rb3d_kernel, c=stencil_vals, dinv=dinv, block_planes=B0,
        n0=n0, n_sweeps=len(omegas), parity_of=parity_of)

    spec_prev = pl.BlockSpec(
        (2, n1, n2), lambda i: (jnp.maximum((i * B0) // 2 - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((B0, n1, n2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (2, n1, n2), lambda i: (jnp.minimum((i * B0 + B0) // 2, n2blk - 1),
                                0, 0),
        memory_space=pltpu.VMEM)
    om = jnp.stack([jnp.asarray(o, u.dtype) for o in omegas]) \
        .reshape(1, len(omegas))
    out = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[spec_prev, spec_main, spec_next,
                  spec_prev, spec_main, spec_next,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((B0, n1, n2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk * B0, n1, n2), u.dtype),
        interpret=interpret,
    )(u, u, u, b, b, b, om)
    return out[:n0]


def fused_rbgs_sweep_3d(u, b, omega, stencil_vals, dinv, interpret=False):
    """One full red-black sweep (red then black), u and b streamed once."""
    return _sweep_call_3d(u, b, [omega], stencil_vals, dinv, (0, 1),
                          interpret=interpret)


def jacobi_sweep_3d(u, b, omega, stencil_vals, dinv, interpret=False):
    return _sweep_call_3d(u, b, [omega], stencil_vals, dinv, (-1,),
                          interpret=interpret)
