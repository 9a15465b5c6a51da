"""Explicit shard_map halo-exchange smoother pipeline.

TPU-native replacement for the reference's domain-decomposed solver tier
(ExaStencils blocks/fragments with ghost-layer ``communicate`` statements,
lib/domain_onePatch.knowledge:1-8, FAS_2D_Basic_template.exa4:7-10): the
grid is block-partitioned over a 2D device mesh and each smoother sweep
exchanges a one-cell halo with its mesh neighbors via ``lax.ppermute``
over ICI.  2D grids shard both axes; 3D grids shard their first two axes
(four face halos) and keep the last — the TPU vector-lane axis — local.

Overlap structure: the bulk of the stencil contraction only reads the local
block, so it carries no data dependence on the ppermute results — XLA's
latency-hiding scheduler runs the halo transfers concurrently with the
interior compute, and only the edge-row/column fix-up waits on them.
Devices at the physical boundary receive zeros from the (absent) neighbor,
which is exactly the homogeneous-Dirichlet ghost convention of the
XLA/Pallas paths.

Used by the cycle compiler when ``config.shard_map_mesh`` is set: fine
levels whose local blocks are at least ``config.shard_min_local_size`` run
sharded; coarser levels fall back to the replicated XLA path (SURVEY.md
§7.5 per-level sharding policy).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _mesh_shape_2d(mesh: Mesh) -> Tuple[int, int]:
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    return sizes.get("x", 1), sizes.get("y", 1)


def supports(mesh: Mesh, u) -> bool:
    """Sharded sweeps need a 2D/3D real grid with mesh axes named x/y and
    a large-enough local block (coarse levels run replicated).  3D grids
    shard their first two axes over the mesh; the last (vector-lane) axis
    stays local — splitting it would fight the TPU register layout."""
    from ..config import config
    if u.ndim not in (2, 3) or jnp.iscomplexobj(u):
        return False
    if not {"x", "y"} <= set(mesh.axis_names):
        return False
    nx, ny = _mesh_shape_2d(mesh)
    n, m = u.shape[:2]
    return (n // nx >= config.shard_min_local_size
            and m // ny >= config.shard_min_local_size)


def _half_sweep(u, b, om, *, vals, dinv, parity, n_global, local_shape,
                mesh_shape):
    """One masked damped-Jacobi half-sweep on the local block (inside
    shard_map).  parity: -1 full sweep, 0 red, 1 black (global node
    parity, matching ops/pallas/rbgs.py)."""
    c0, c_up, c_down, c_left, c_right = vals
    nl, ml = local_shape
    nx, ny = mesh_shape
    n, m = n_global

    # halo exchange: edge rows/cols to/from mesh neighbors (missing
    # neighbors contribute zeros == Dirichlet ghost ring)
    up_halo = lax.ppermute(u[-1:, :], "x", [(i, i + 1) for i in range(nx - 1)])
    down_halo = lax.ppermute(u[:1, :], "x", [(i + 1, i) for i in range(nx - 1)])
    left_halo = lax.ppermute(u[:, -1:], "y", [(j, j + 1) for j in range(ny - 1)])
    right_halo = lax.ppermute(u[:, :1], "y", [(j + 1, j) for j in range(ny - 1)])

    # interior contraction: local-only reads, no dependence on the halos
    zrow = jnp.zeros((1, ml), u.dtype)
    zcol = jnp.zeros((nl, 1), u.dtype)
    up = jnp.concatenate([zrow, u[:-1, :]], axis=0)      # u[r-1]
    down = jnp.concatenate([u[1:, :], zrow], axis=0)     # u[r+1]
    left = jnp.concatenate([zcol, u[:, :-1]], axis=1)    # u[:, c-1]
    right = jnp.concatenate([u[:, 1:], zcol], axis=1)    # u[:, c+1]
    au = c0 * u + c_up * up + c_down * down + c_left * left + c_right * right

    # edge fix-up (waits on the halos)
    au = au.at[0, :].add(c_up * up_halo[0, :])
    au = au.at[-1, :].add(c_down * down_halo[0, :])
    au = au.at[:, 0].add(c_left * left_halo[:, 0])
    au = au.at[:, -1].add(c_right * right_halo[:, 0])

    ix = lax.axis_index("x")
    iy = lax.axis_index("y")
    row_ids = ix * nl + lax.broadcasted_iota(jnp.int32, (nl, ml), 0)
    col_ids = iy * ml + lax.broadcasted_iota(jnp.int32, (nl, ml), 1)
    valid = (row_ids < n) & (col_ids < m)
    update = om * dinv * (b - au)
    if parity >= 0:
        update = jnp.where(((row_ids + col_ids) % 2) == parity, update, 0.0)
    return jnp.where(valid, u + update, u)


def _half_sweep_3d(u, b, om, *, vals, dinv, parity, n_global, local_shape,
                   mesh_shape):
    """One masked damped-Jacobi half-sweep of a 7-point stencil on the
    local 3D block (inside shard_map).  The first two grid axes shard
    over mesh axes x/y; the last axis is local, so only four halo faces
    exchange.  vals order matches ops/pallas/rbgs3d.seven_point_values:
    (center, -x, +x, -y, +y, -z, +z)."""
    c0, cxm, cxp, cym, cyp, czm, czp = vals
    nl, ml, kl = local_shape
    nx, ny = mesh_shape
    n, m, k = n_global

    # face halos to/from mesh neighbors (missing neighbor -> zeros ==
    # homogeneous-Dirichlet ghost layer)
    xm_halo = lax.ppermute(u[-1:, :, :], "x", [(i, i + 1) for i in range(nx - 1)])
    xp_halo = lax.ppermute(u[:1, :, :], "x", [(i + 1, i) for i in range(nx - 1)])
    ym_halo = lax.ppermute(u[:, -1:, :], "y", [(j, j + 1) for j in range(ny - 1)])
    yp_halo = lax.ppermute(u[:, :1, :], "y", [(j + 1, j) for j in range(ny - 1)])

    # interior contraction (local-only reads; overlaps with the ppermutes)
    zx = jnp.zeros((1, ml, kl), u.dtype)
    zy = jnp.zeros((nl, 1, kl), u.dtype)
    zz = jnp.zeros((nl, ml, 1), u.dtype)
    au = (c0 * u
          + cxm * jnp.concatenate([zx, u[:-1]], axis=0)
          + cxp * jnp.concatenate([u[1:], zx], axis=0)
          + cym * jnp.concatenate([zy, u[:, :-1]], axis=1)
          + cyp * jnp.concatenate([u[:, 1:], zy], axis=1)
          + czm * jnp.concatenate([zz, u[:, :, :-1]], axis=2)
          + czp * jnp.concatenate([u[:, :, 1:], zz], axis=2))

    # face fix-up (waits on the halos)
    au = au.at[0, :, :].add(cxm * xm_halo[0])
    au = au.at[-1, :, :].add(cxp * xp_halo[0])
    au = au.at[:, 0, :].add(cym * ym_halo[:, 0])
    au = au.at[:, -1, :].add(cyp * yp_halo[:, 0])

    ix = lax.axis_index("x")
    iy = lax.axis_index("y")
    shape = (nl, ml, kl)
    i_ids = ix * nl + lax.broadcasted_iota(jnp.int32, shape, 0)
    j_ids = iy * ml + lax.broadcasted_iota(jnp.int32, shape, 1)
    k_ids = lax.broadcasted_iota(jnp.int32, shape, 2)
    valid = (i_ids < n) & (j_ids < m)
    update = om * dinv * (b - au)
    if parity >= 0:
        # red = even NODE parity; interior (i,j,k) is node (i+1,j+1,k+1),
        # so red interior indices have odd index sum (matches rbgs3d.py
        # and lower.red_black_masks)
        update = jnp.where(((i_ids + j_ids + k_ids + 1) % 2) == parity,
                           update, 0.0)
    return jnp.where(valid, u + update, u)


def _padded(u, nx, ny):
    n, m = u.shape[:2]
    pad = ((0, -n % nx), (0, -m % ny)) + ((0, 0),) * (u.ndim - 2)
    return jnp.pad(u, pad)


def sweep(mesh: Mesh, u, b, om, vals, dinv, *, red_black: bool):
    """Full smoother sweep (red+black halves, or one Jacobi pass) with the
    grid block-sharded over the mesh.  Accepts the unpadded (2^l - 1) grid;
    padding to mesh-divisible shape happens here and the padded ring is
    masked out inside the sweep.  2D grids use the 5-point pipeline, 3D
    grids the 7-point face-halo pipeline (last axis local)."""
    nx, ny = _mesh_shape_2d(mesh)
    n_global = u.shape
    up, bp = _padded(u, nx, ny), _padded(b, nx, ny)
    local_shape = (up.shape[0] // nx, up.shape[1] // ny) + up.shape[2:]

    half = _half_sweep if u.ndim == 2 else _half_sweep_3d
    spec = P("x", "y") if u.ndim == 2 else P("x", "y", None)
    kernel = functools.partial(
        half, vals=vals, dinv=dinv, n_global=n_global,
        local_shape=local_shape, mesh_shape=(nx, ny))

    def run(parity):
        return shard_map(
            functools.partial(kernel, parity=parity), mesh=mesh,
            in_specs=(spec, spec, P()), out_specs=spec)

    if red_black:
        up_new = run(0)(up, bp, om)
        up_new = run(1)(up_new, bp, om)
    else:
        up_new = run(-1)(up, bp, om)
    return up_new[tuple(slice(0, s) for s in n_global)]
