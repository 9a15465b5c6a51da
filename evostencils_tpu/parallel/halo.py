"""Explicit shard_map halo-exchange smoother pipeline.

TPU-native replacement for the reference's domain-decomposed solver tier
(ExaStencils blocks/fragments with ghost-layer ``communicate`` statements,
lib/domain_onePatch.knowledge:1-8, FAS_2D_Basic_template.exa4:7-10): the
grid is block-partitioned over a 2D device mesh and each smoother sweep
exchanges a one-cell halo with its mesh neighbors via ``lax.ppermute``
over ICI.

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
    """Sharded sweeps need a 2D real grid with mesh axes named x/y and a
    large-enough local block (coarse levels run replicated)."""
    from ..config import config
    if u.ndim != 2 or jnp.iscomplexobj(u):
        return False
    if not {"x", "y"} <= set(mesh.axis_names):
        return False
    nx, ny = _mesh_shape_2d(mesh)
    n, m = u.shape
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


def _padded(u, nx, ny):
    n, m = u.shape
    return jnp.pad(u, ((0, -n % nx), (0, -m % ny)))


def sweep(mesh: Mesh, u, b, om, vals, dinv, *, red_black: bool):
    """Full smoother sweep (red+black halves, or one Jacobi pass) with the
    grid block-sharded over the mesh.  Accepts the unpadded (2^l - 1) grid;
    padding to mesh-divisible shape happens here and the padded ring is
    masked out inside the sweep."""
    nx, ny = _mesh_shape_2d(mesh)
    n_global = u.shape
    up, bp = _padded(u, nx, ny), _padded(b, nx, ny)
    local_shape = (up.shape[0] // nx, up.shape[1] // ny)

    kernel = functools.partial(
        _half_sweep, vals=vals, dinv=dinv, n_global=n_global,
        local_shape=local_shape, mesh_shape=(nx, ny))

    def run(parity):
        return shard_map(
            functools.partial(kernel, parity=parity), mesh=mesh,
            in_specs=(P("x", "y"), P("x", "y"), P()), out_specs=P("x", "y"))

    if red_black:
        up_new = run(0)(up, bp, om)
        up_new = run(1)(up_new, bp, om)
    else:
        up_new = run(-1)(up, bp, om)
    return up_new[:n_global[0], :n_global[1]]
