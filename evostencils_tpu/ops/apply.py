"""Stencil application kernels (pure JAX/XLA path).

Fields live on the *interior* of the grid (shape == grid.size); the implicit
Dirichlet-0 boundary ring is materialized via zero padding inside the kernel.
A constant-stencil application lowers to a handful of static slices of one
padded array plus fused multiply-adds — XLA fuses this into a single
memory-bound sweep, which is the right shape for the TPU VPU.  Variable and
periodic coefficients become elementwise multiplies with materialized
coefficient fields, fused into the same sweep.

Lattice convention: the periodic-coefficient lattice coordinate of interior
point ``i`` (0-based, per axis) is ``(i + origin) % period`` with
``origin = 1`` — interior point 0 is grid node 1, so parity matches the
reference's node-index red-black coloring ``(i0 + i1) % 2``
(reference code_generation/exastencils.py:659-682).

Replaces the stencil loops ExaStencils generates as C++/OpenMP
(reference README.md:21-32).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..stencils import constant, periodic
from ..stencils.constant import Stencil
from ..stencils.periodic import PeriodicStencil

#: Lattice origin: interior index 0 is global node index 1 on every axis.
LATTICE_ORIGIN = 1


def result_dtype(stencil_values, u_dtype):
    vals = np.asarray(list(stencil_values))
    if np.iscomplexobj(vals):
        return jnp.promote_types(u_dtype, np.complex64)
    return u_dtype


def _shifted(u_padded, offset: Tuple[int, ...], radius: Tuple[int, ...],
             shape: Tuple[int, ...]):
    """Static slice of the padded array corresponding to u(x + offset)."""
    index = tuple(slice(r + o, r + o + n) for r, o, n in zip(radius, offset, shape))
    return u_padded[index]


def apply_constant(stencil: Stencil, u, bc: str = "dirichlet"):
    """(S u)(x) = sum_k v_k * u(x + o_k), zero outside the grid (dirichlet)
    or wrapped (periodic)."""
    if stencil.number_of_entries == 0:
        return jnp.zeros_like(u)
    radius = stencil.max_offsets
    dtype = result_dtype((v for _, v in stencil.entries), u.dtype)
    u = u.astype(dtype)
    if bc == "dirichlet":
        up = jnp.pad(u, [(r, r) for r in radius])
        acc = None
        for offset, value in stencil.entries:
            term = jnp.asarray(value, dtype) * _shifted(up, offset, radius, u.shape)
            acc = term if acc is None else acc + term
        return acc
    elif bc == "periodic":
        acc = None
        for offset, value in stencil.entries:
            term = jnp.asarray(value, dtype) * jnp.roll(u, tuple(-o for o in offset),
                                                        axis=tuple(range(u.ndim)))
            acc = term if acc is None else acc + term
        return acc
    raise ValueError(f"unknown bc {bc!r}")


def periodic_coefficient_fields(ps: PeriodicStencil, shape: Tuple[int, ...]):
    """Materialize per-offset coefficient fields of a periodic stencil.

    Returns ``[(offset, ndarray_of_shape)]`` where the ndarray holds the
    coefficient of that offset at every interior point (0 where the lattice
    point has no such entry).  Computed in numpy at trace time.
    """
    offsets = sorted({o for s in ps.constant_entries() for o, _ in s.entries})
    any_complex = any(np.iscomplexobj(np.asarray(v))
                      or isinstance(v, complex)
                      for s in ps.constant_entries() for _, v in s.entries)
    dtype = np.complex128 if any_complex else np.float64
    period = ps.period
    grid_idx = np.indices(shape)
    lattice_map = tuple((grid_idx[k] + LATTICE_ORIGIN) % period[k]
                        for k in range(len(shape)))
    out = []
    for offset in offsets:
        lattice = np.zeros(period, dtype=dtype)
        for idx in np.ndindex(*period):
            s = ps.stencils[idx]
            if s is not None:
                lattice[idx] = s.value_at(offset, 0)
        out.append((offset, lattice[lattice_map]))
    return out


def apply_periodic(ps: PeriodicStencil, u, bc: str = "dirichlet"):
    """Apply a periodic stencil: coefficients vary over the period lattice."""
    if ps.is_constant:
        return apply_constant(ps.to_constant(), u, bc)
    coeff_fields = periodic_coefficient_fields(ps, u.shape)
    if not coeff_fields:
        return jnp.zeros_like(u)
    dtype = result_dtype((c.reshape(-1)[0] for _, c in coeff_fields), u.dtype)
    for _, c in coeff_fields:
        if np.iscomplexobj(c):
            dtype = jnp.promote_types(dtype, jnp.complex64)
    u = u.astype(dtype)
    radius = tuple(max(abs(o[k]) for o, _ in coeff_fields)
                   for k in range(u.ndim))
    if bc == "dirichlet":
        up = jnp.pad(u, [(r, r) for r in radius])
        acc = None
        for offset, coeff in coeff_fields:
            term = jnp.asarray(coeff, dtype) * _shifted(up, offset, radius, u.shape)
            acc = term if acc is None else acc + term
        return acc
    elif bc == "periodic":
        acc = None
        for offset, coeff in coeff_fields:
            term = jnp.asarray(coeff, dtype) * jnp.roll(
                u, tuple(-o for o in offset), axis=tuple(range(u.ndim)))
            acc = term if acc is None else acc + term
        return acc
    raise ValueError(f"unknown bc {bc!r}")


def apply_stencil(stencil, u, bc: str = "dirichlet"):
    """Dispatch on constant vs periodic stencil."""
    if isinstance(stencil, Stencil):
        return apply_constant(stencil, u, bc)
    if isinstance(stencil, PeriodicStencil):
        return apply_periodic(stencil, u, bc)
    raise TypeError(f"not a stencil: {type(stencil)}")


class StencilField:
    """Variable-coefficient stencil: one coefficient field per offset.

    ``fields[k]`` has the grid's interior shape and holds the coefficient of
    ``offsets[k]`` at each point.  This is the executable form of
    variable-coefficient operators (reference gallery.py:93-185 freezes them
    at a sample position instead)."""

    __slots__ = ("offsets", "fields")

    def __init__(self, offsets: Sequence[Tuple[int, ...]], fields):
        self.offsets = tuple(tuple(o) for o in offsets)
        self.fields = list(fields)

    @property
    def dimension(self):
        return len(self.offsets[0])

    def apply(self, u, bc: str = "dirichlet"):
        radius = tuple(max(abs(o[k]) for o in self.offsets)
                       for k in range(u.ndim))
        dtype = u.dtype
        for f in self.fields:
            dtype = jnp.promote_types(dtype, jnp.asarray(f).dtype)
        u = u.astype(dtype)
        if bc != "dirichlet":
            raise NotImplementedError("StencilField supports dirichlet bc only")
        up = jnp.pad(u, [(r, r) for r in radius])
        acc = None
        for offset, coeff in zip(self.offsets, self.fields):
            term = jnp.asarray(coeff, dtype) * _shifted(up, offset, radius, u.shape)
            acc = term if acc is None else acc + term
        return acc

    def diagonal_field(self):
        zero = (0,) * self.dimension
        for o, f in zip(self.offsets, self.fields):
            if o == zero:
                return f
        raise ValueError("stencil field has no diagonal entry")


# ---------------------------------------------------------------------------
# Intergrid transfers (coarsening factor 2, vertex-centered)
# ---------------------------------------------------------------------------
# Coarse interior point i_c sits at fine interior index 2*i_c + 1.

def restrict(stencil: Stencil, u_fine):
    """Full restriction: apply the fine-grid weighting stencil, then inject."""
    smoothed = apply_constant(stencil, u_fine) if stencil is not None else u_fine
    index = tuple(slice(1, None, 2) for _ in range(u_fine.ndim))
    return smoothed[index]


def inject(u_fine):
    index = tuple(slice(1, None, 2) for _ in range(u_fine.ndim))
    return u_fine[index]


def prolong(stencil: Stencil, u_coarse, fine_shape: Tuple[int, ...]):
    """Interpolation: scatter coarse values onto odd fine nodes, then apply
    the fine-grid interpolation stencil (e.g. (1/2, 1, 1/2) per axis)."""
    dtype = result_dtype((v for _, v in stencil.entries), u_coarse.dtype) \
        if stencil is not None else u_coarse.dtype
    embedded = jnp.zeros(fine_shape, dtype=dtype)
    index = tuple(slice(1, None, 2) for _ in range(u_coarse.ndim))
    embedded = embedded.at[index].set(u_coarse.astype(dtype))
    if stencil is None:
        return embedded
    return apply_constant(stencil, embedded)


# ---------------------------------------------------------------------------
# Dense materialization (tests + small direct solves)
# ---------------------------------------------------------------------------

def dense_matrix(stencil, grid) -> np.ndarray:
    """Dense matrix of the stencil operator on the interior grid, Dirichlet-0.

    Row/column order is C order (last axis fastest).  Supports constant and
    periodic stencils; used for unit tests and small coarse-grid factorizations.
    """
    shape = tuple(grid.size)
    n = int(np.prod(shape))
    if isinstance(stencil, Stencil):
        ps = periodic.from_constant(stencil)
    else:
        ps = stencil
    any_complex = any(isinstance(v, complex) or np.iscomplexobj(np.asarray(v))
                      for s in ps.constant_entries() for _, v in s.entries)
    dtype = np.complex128 if any_complex else np.float64
    mat = np.zeros((n, n), dtype=dtype)
    period = ps.period
    for row_idx in np.ndindex(*shape):
        lattice = tuple((i + LATTICE_ORIGIN) % p for i, p in zip(row_idx, period))
        s = ps.stencils[lattice]
        if s is None:
            continue
        row = np.ravel_multi_index(row_idx, shape)
        for offset, value in s.entries:
            col_idx = tuple(i + o for i, o in zip(row_idx, offset))
            if all(0 <= c < m for c, m in zip(col_idx, shape)):
                mat[row, np.ravel_multi_index(col_idx, shape)] += value
    return mat


def dense_restriction_matrix(stencil: Stencil, fine_grid, coarse_grid) -> np.ndarray:
    weight = dense_matrix(stencil, fine_grid)
    nf = int(np.prod(fine_grid.size))
    nc = int(np.prod(coarse_grid.size))
    sel = np.zeros((nc, nf))
    for c_idx in np.ndindex(*tuple(coarse_grid.size)):
        f_idx = tuple(2 * i + 1 for i in c_idx)
        sel[np.ravel_multi_index(c_idx, tuple(coarse_grid.size)),
            np.ravel_multi_index(f_idx, tuple(fine_grid.size))] = 1.0
    return sel @ weight


def dense_prolongation_matrix(stencil: Stencil, fine_grid, coarse_grid) -> np.ndarray:
    weight = dense_matrix(stencil, fine_grid)
    nf = int(np.prod(fine_grid.size))
    nc = int(np.prod(coarse_grid.size))
    embed = np.zeros((nf, nc))
    for c_idx in np.ndindex(*tuple(coarse_grid.size)):
        f_idx = tuple(2 * i + 1 for i in c_idx)
        embed[np.ravel_multi_index(f_idx, tuple(fine_grid.size)),
              np.ravel_multi_index(c_idx, tuple(coarse_grid.size))] = 1.0
    return weight @ embed
