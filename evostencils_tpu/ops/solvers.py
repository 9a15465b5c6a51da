"""Matrix-free Krylov solvers over pytrees of field arrays.

All solvers are jittable: fixed-iteration variants use ``lax.fori_loop``
(for use *inside* compiled cycles, e.g. Krylov smoothers), tolerance
variants use ``lax.while_loop``.  They replace the CG/BiCGStab/MinRes
solver bodies ExaStencils generates as C++ (reference
code_generation/exastencils.py:1025-1101 extracts those bodies; here they
are native JAX).

The operand is any pytree of arrays (a tuple of per-field grids).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def _dot(a, b):
    """Inner product <a, b> over a pytree; conjugates a for complex dtypes."""
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return sum(jnp.vdot(x, y) for x, y in zip(leaves_a, leaves_b))


def _axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + yi, x, y)


def _scale(alpha, x):
    return jax.tree_util.tree_map(lambda xi: alpha * xi, x)


def _sub(x, y):
    return jax.tree_util.tree_map(lambda a, b: a - b, x, y)


def _add(x, y):
    return jax.tree_util.tree_map(lambda a, b: a + b, x, y)


def _zeros_like(x):
    return jax.tree_util.tree_map(jnp.zeros_like, x)


def norm(x):
    return jnp.sqrt(jnp.real(_dot(x, x)))


def cg(matvec: Callable, b, x0=None, *, tol: float = 1e-12, maxiter: int = 1000):
    """Conjugate gradients to relative tolerance ``tol`` (matches the
    reference solver config `generate solver ... cgs cg` with 1e-12/1000,
    example_problems/Poisson/2D_FD_Poisson_fromL2.exa3:1-14)."""
    x = _zeros_like(b) if x0 is None else x0
    r = _sub(b, matvec(x)) if x0 is not None else b
    p = r
    rs = _dot(r, r)
    bs = jnp.real(_dot(b, b))
    threshold = tol * tol * bs

    def cond(state):
        _, _, _, rs, k = state
        return jnp.logical_and(jnp.real(rs) > threshold, k < maxiter)

    def body(state):
        x, r, p, rs, k = state
        ap = matvec(p)
        alpha = rs / _dot(p, ap)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, ap, r)
        rs_new = _dot(r, r)
        beta = rs_new / rs
        p = _axpy(beta, p, r)
        return x, r, p, rs_new, k + 1

    x, r, p, rs, k = lax.while_loop(cond, body, (x, r, p, rs, 0))
    return x


def cg_fixed(matvec: Callable, b, iterations: int, x0=None):
    """CG with a fixed iteration count (Krylov smoother inside a cycle)."""
    x = _zeros_like(b) if x0 is None else x0
    r = b if x0 is None else _sub(b, matvec(x))
    p = r
    rs = _dot(r, r)

    def body(_, state):
        x, r, p, rs = state
        ap = matvec(p)
        denom = _dot(p, ap)
        alpha = jnp.where(denom == 0, 0.0, rs / denom)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, ap, r)
        rs_new = _dot(r, r)
        beta = jnp.where(rs == 0, 0.0, rs_new / rs)
        p = _axpy(beta, p, r)
        return x, r, p, rs_new

    x, _, _, _ = lax.fori_loop(0, iterations, body, (x, r, p, rs))
    return x


def bicgstab_fixed(matvec: Callable, b, iterations: int, x0=None):
    """BiCGStab with fixed iteration count (non-symmetric / complex ops)."""
    x = _zeros_like(b) if x0 is None else x0
    r = b if x0 is None else _sub(b, matvec(x))
    r_hat = r
    p = r
    rho = _dot(r_hat, r)

    def body(_, state):
        x, r, p, rho = state
        v = matvec(p)
        denom = _dot(r_hat, v)
        alpha = jnp.where(denom == 0, 0.0, rho / denom)
        s = _axpy(-alpha, v, r)
        t = matvec(s)
        tt = _dot(t, t)
        omega = jnp.where(tt == 0, 0.0, _dot(t, s) / tt)
        x = _axpy(alpha, p, _axpy(omega, s, x))
        r = _axpy(-omega, t, s)
        rho_new = _dot(r_hat, r)
        beta = jnp.where(rho * omega == 0, 0.0, (rho_new / rho) * (alpha / omega))
        p = _axpy(beta, _axpy(-omega, v, p), r)
        return x, r, p, rho_new

    x, _, _, _ = lax.fori_loop(0, iterations, body, (x, r, p, rho))
    return x


def conjugate_residual_fixed(matvec: Callable, b, iterations: int, x0=None):
    """Conjugate Residual method, fixed iterations (symmetric indefinite)."""
    x = _zeros_like(b) if x0 is None else x0
    r = b if x0 is None else _sub(b, matvec(x))
    p = r
    ar = matvec(r)
    ap = ar

    def body(_, state):
        x, r, p, ar, ap = state
        rar = _dot(r, ar)
        denom = _dot(ap, ap)
        alpha = jnp.where(denom == 0, 0.0, rar / denom)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, ap, r)
        ar_new = matvec(r)
        rar_new = _dot(r, ar_new)
        beta = jnp.where(rar == 0, 0.0, rar_new / rar)
        p = _axpy(beta, p, r)
        ap = _axpy(beta, ap, ar_new)
        return x, r, p, ar_new, ap

    x, _, _, _, _ = lax.fori_loop(0, iterations, body, (x, r, p, ar, ap))
    return x


def minres_fixed(matvec: Callable, b, iterations: int, x0=None):
    """MinRes via the conjugate-residual recurrence (sufficient for the
    grammar's Krylov-smoother terminal; reference ir/krylov_subspace.py:32-45)."""
    return conjugate_residual_fixed(matvec, b, iterations, x0)


def preconditioned_bicgstab(matvec: Callable, precond: Callable, b,
                            *, tol: float = 1e-7, maxiter: int = 10000,
                            history_size: int = 0):
    """Right-preconditioned BiCGStab (reference Helmholtz solver:
    example_problems/Helmholtz/2D_FD_Helmholtz_fromL3.exa3:144-201 —
    ``gen_mgCycle()`` with zero initial guess is the preconditioner).

    Returns ``(x, iterations, residual_history)``; the history has
    ``history_size + 1`` slots (0 disables recording beyond r0/final).
    """
    x = _zeros_like(b)
    r = b
    r_hat = r
    leaves = jax.tree_util.tree_leaves(r)
    one = jnp.asarray(1.0, leaves[0].dtype)
    rho = alpha = omega = one
    v = _zeros_like(b)
    p = _zeros_like(b)
    r0_norm = norm(r)
    hsize = max(history_size, 1)
    hist = jnp.zeros((hsize + 1,), dtype=jnp.real(r0_norm).dtype)
    hist = hist.at[0].set(r0_norm)

    def cond(state):
        _, _, _, _, _, _, _, k, res, _ = state
        return jnp.logical_and(k < maxiter, res > tol * r0_norm)

    def body(state):
        x, r, v, p, rho, alpha, omega, k, _, hist = state
        rho_new = _dot(r_hat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = _axpy(beta, _axpy(-omega, v, p), r)
        y = precond(p)
        v = matvec(y)
        alpha = rho_new / _dot(r_hat, v)
        h = _axpy(alpha, y, x)
        s = _axpy(-alpha, v, r)
        z = precond(s)
        t = matvec(z)
        omega_new = _dot(t, s) / _dot(t, t)
        x = _axpy(omega_new, z, h)
        r = _axpy(-omega_new, t, s)
        res = norm(r)
        hist = jax.lax.cond(
            k + 1 <= hsize,
            lambda h_: h_.at[jnp.minimum(k + 1, hsize)].set(res),
            lambda h_: h_, hist)
        return x, r, v, p, rho_new, alpha, omega_new, k + 1, res, hist

    state = (x, r, v, p, rho, alpha, omega, 0, r0_norm, hist)
    x, r, v, p, rho, alpha, omega, k, res, hist = lax.while_loop(
        cond, body, state)
    return x, k, hist


FIXED_KRYLOV = {
    "CG": cg_fixed,
    "BiCGStab": bicgstab_fixed,
    "MinRes": minres_fixed,
    "ConjugateResidual": conjugate_residual_fixed,
}
