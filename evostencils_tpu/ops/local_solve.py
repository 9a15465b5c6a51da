"""Batched local (block) solves for collective / block smoothers.

``solve locally`` in the reference is lowered by ExaStencils to per-point or
per-block Gaussian elimination in generated C++ (reference
code_generation/exastencils.py:659-925).  Here the block structure is
precomputed at trace time (numpy) into a batched inverse tensor, and the
on-device application is one einsum over all blocks — a batched small
matmul, which maps directly onto the TPU vector/matrix units.

Block convention: blocks tile the *node* index space ``[0, n+1]`` per axis
in chunks of the block size; interior point ``i`` is node ``i+1``
(ops.apply.LATTICE_ORIGIN).  Nodes outside the interior are phantom unknowns
with identity equations and zero coupling (Dirichlet).
"""

from __future__ import annotations

import math
from functools import reduce
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..stencils import periodic
from ..stencils.periodic import PeriodicStencil
from .apply import LATTICE_ORIGIN

_PLAN_CACHE: dict = {}


def _prod(xs):
    return reduce(lambda a, b: a * b, xs, 1)


class BlockSolvePlan:
    """Precomputed batched inverse for a block-diagonal system operator.

    ``entries[i][j]`` is the (already block-filtered) periodic stencil
    coupling field j into equation i; all fields share ``shape`` and
    ``block_size``.
    """

    def __init__(self, entries: List[List[PeriodicStencil]],
                 block_size: Tuple[int, ...], shape: Tuple[int, ...]):
        self.block_size = tuple(block_size)
        self.shape = tuple(shape)
        self.m = len(entries)
        dim = len(shape)
        bs = self.block_size
        B = _prod(bs)
        n_local = self.m * B

        # padded node-space geometry
        nodes = tuple(n + 2 for n in shape)
        nblocks = tuple(-(-nn // b) for nn, b in zip(nodes, bs))
        padded = tuple(nb * b for nb, b in zip(nblocks, bs))
        self.nblocks = nblocks
        self.padded = padded
        NB = _prod(nblocks)

        # anchor node index per block per axis
        anchors = np.meshgrid(*[np.arange(nb) * b for nb, b in zip(nblocks, bs)],
                              indexing="ij")
        anchors = np.stack([a.reshape(-1) for a in anchors], axis=-1)  # (NB, d)

        local_coords = np.array(list(np.ndindex(*bs)))  # (B, d)

        def node_of(q):  # block anchor + local coord -> node index per axis
            return anchors[:, None, :] + q[None, :, :]

        node_idx = node_of(local_coords)  # (NB, B, d)
        interior = np.all((node_idx >= 1) & (node_idx <= np.array(shape)), axis=-1)
        # valid[NB, B] -> expand over fields
        self.valid = interior

        any_complex = any(
            isinstance(v, complex) or np.iscomplexobj(np.asarray(v))
            for row in entries for ps in row if ps is not None
            for s in ps.constant_entries() for _, v in s.entries)
        dtype = np.complex128 if any_complex else np.float64

        M = np.zeros((NB, n_local, n_local), dtype=dtype)
        for i in range(self.m):
            for j in range(self.m):
                ps = entries[i][j]
                if ps is None:
                    continue
                per = ps.period
                for qi, q in enumerate(local_coords):
                    # lattice coordinate of node (anchor + q):
                    # interior index = node - 1; lattice = (interior + ORIGIN) % per
                    lat = (node_idx[:, qi, :]) % np.array(per)  # (NB, d)
                    # gather stencil per block (may vary when per > bs)
                    flat_lat = np.ravel_multi_index(lat.T, per)
                    stencils_flat = ps.stencils.reshape(-1)
                    row_a = i * len(local_coords) + qi
                    for s_id in np.unique(flat_lat):
                        s = stencils_flat[s_id]
                        if s is None:
                            continue
                        sel = flat_lat == s_id
                        for offset, value in s.entries:
                            tgt = q + np.array(offset)
                            if np.any(tgt < 0) or np.any(tgt >= np.array(bs)):
                                continue  # block-external coupling is dropped
                            col_a = j * len(local_coords) + int(
                                np.ravel_multi_index(tuple(tgt), bs))
                            M[sel, row_a, col_a] += value

        # phantom unknowns: identity rows, zero columns
        valid_local = np.concatenate([interior] * self.m, axis=-1)  # (NB, m*B)
        for a in range(n_local):
            inval = ~valid_local[:, a]
            if inval.any():
                M[inval, a, :] = 0.0
                M[inval, :, a] = 0.0
                M[inval, a, a] = 1.0
        self.inverse = np.linalg.inv(M).reshape(*nblocks, n_local, n_local)

    def apply(self, fields: Sequence):
        """Solve the block systems: returns tuple of field arrays."""
        bs, shape = self.block_size, self.shape
        dim = len(shape)
        B = _prod(bs)
        blocks = []
        for x in fields:
            # pad to node space then to block multiples
            pad = [(1, p - n - 1) for n, p in zip(shape, self.padded)]
            xp = jnp.pad(x, pad)
            # reshape into (nb0, b0, nb1, b1, ...) -> (nb..., b...)
            new_shape = []
            for nb, b in zip(self.nblocks, bs):
                new_shape.extend([nb, b])
            xp = xp.reshape(new_shape)
            perm = list(range(0, 2 * dim, 2)) + list(range(1, 2 * dim, 2))
            xp = jnp.transpose(xp, perm).reshape(*self.nblocks, B)
            blocks.append(xp)
        xb = jnp.concatenate(blocks, axis=-1)  # (*nblocks, m*B)
        # keep the field dtype (f64 einsums are emulated and slow on TPU);
        # promote only for complex inverses over real fields
        dtype = xb.dtype
        if np.iscomplexobj(self.inverse):
            dtype = jnp.promote_types(dtype, jnp.complex64)
        inv = jnp.asarray(self.inverse, dtype=dtype)
        yb = jnp.einsum("...ab,...b->...a", inv, xb.astype(dtype))
        outs = []
        for i in range(self.m):
            y = yb[..., i * B:(i + 1) * B]
            y = y.reshape(*self.nblocks, *bs)
            # inverse transpose back to interleaved layout
            perm = []
            for k in range(dim):
                perm.extend([k, dim + k])
            y = jnp.transpose(y, perm)
            y = y.reshape(self.padded)
            index = tuple(slice(1, 1 + n) for n in shape)
            outs.append(y[index])
        return tuple(outs)


def get_block_solve_plan(entries, block_size, shape) -> BlockSolvePlan:
    key = (tuple(tuple(row) for row in entries), tuple(block_size), tuple(shape))
    try:
        plan = _PLAN_CACHE.get(key)
    except TypeError:
        plan = None
        key = None
    if plan is None:
        plan = BlockSolvePlan(entries, block_size, shape)
        if key is not None:
            _PLAN_CACHE[key] = plan
    return plan
