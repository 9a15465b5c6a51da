"""Intergrid transfer operators with *traced* weights.

The reference tunes restriction/prolongation stencil weights with CMA-ES by
rewriting ``Global_initGlobals.cpp`` and recompiling the generated C++ for
every candidate (reference optimization/intergrid_transfer.py:114-121).
Here the weights are ordinary jit arguments: the two-grid cycle is compiled
once and a whole CMA population is evaluated in a single vmapped call.

Conventions match ops/apply.py: coarse node ``i_c`` sits at fine node
``2*i_c + 1`` (vertex-centered interior grids of size 2^l - 1), restriction
is stencil-correlation followed by injection at odd fine nodes, prolongation
is scatter-to-odd-nodes followed by stencil application.  Out-of-range fine
nodes are Dirichlet zeros.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _conv(u, kernel, strides, padding):
    nd = u.ndim
    dn = lax.conv_dimension_numbers(
        (1, 1) + u.shape, (1, 1) + kernel.shape,
        ("NC" + "HWD"[:nd], "IO" + "HWD"[:nd], "NC" + "HWD"[:nd]))
    out = lax.conv_general_dilated(
        u[None, None].astype(kernel.dtype), kernel[None, None],
        window_strides=strides, padding=padding, dimension_numbers=dn)
    return out[0, 0]


def restrict_weighted(u_fine, weights):
    """Restriction with a traced ``(2r+1,)*d`` weight kernel.

    ``out[i] = sum_o weights[o + r] * u_fine[2 i + 1 + o]`` — the weighted
    average of the fine neighborhood centered on the coarse node's fine
    position, zero outside the grid.
    """
    r = tuple((s - 1) // 2 for s in weights.shape)
    # lax.conv computes correlation: out[i] = sum_k W[k] u[s*i + k - lo];
    # want u[2i + 1 + (k - r)] => lo = r - 1 per axis.
    padding = tuple((rk - 1, rk - 1) for rk in r)
    if any(rk < 1 for rk in r):
        raise ValueError("weight kernel must have radius >= 1")
    return _conv(u_fine, weights, (2,) * u_fine.ndim, padding)


def prolong_weighted(u_coarse, weights, fine_shape: Tuple[int, ...]):
    """Prolongation with a traced ``(2r+1,)*d`` weight kernel.

    Coarse values are scattered onto odd fine nodes and the kernel applied
    on the fine grid (transpose pairing of :func:`restrict_weighted` up to
    kernel reflection).
    """
    r = tuple((s - 1) // 2 for s in weights.shape)
    dtype = jnp.promote_types(u_coarse.dtype, weights.dtype)
    embedded = jnp.zeros(fine_shape, dtype=dtype)
    index = tuple(slice(1, None, 2) for _ in range(u_coarse.ndim))
    embedded = embedded.at[index].set(u_coarse.astype(dtype))
    padding = tuple((rk, rk) for rk in r)
    return _conv(embedded, weights.astype(dtype), (1,) * len(fine_shape),
                 padding)
