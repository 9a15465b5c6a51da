"""df64-refined split-complex BiCGStab (compiler/refine_split.py):
the compensated residual matches f64 ground truth, and the f32 inner
solver + df64 refinement reaches the reference's 1e-7 target with an
iteration count close to the all-f64 solve."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evostencils_tpu.problems.helmholtz import helmholtz_2d_split
from evostencils_tpu.compiler.cycles import v_cycle
from evostencils_tpu.compiler.lower import lower_cycle, operator_applier
from evostencils_tpu.compiler.refine_split import (
    split_system_residual_df, refined_bicgstab_split,
    reliable_bicgstab_split, _df_norm)
from evostencils_tpu.ir import partitioning as part
from evostencils_tpu.ir import smoother
from evostencils_tpu.ops.solvers import preconditioned_bicgstab_split


K_TEST = 40.0


def _problem(dtype):
    p = helmholtz_2d_split(max_level=5, min_level=3, k=K_TEST)
    p.dtype = dtype
    return p


def test_split_residual_df_matches_f64():
    p = _problem(np.float64)
    A = p.outer_solver.operator
    residual_df = split_system_residual_df(A)
    b64 = p.rhs_builder(np.float64)
    rng = np.random.default_rng(3)
    u64 = tuple(jnp.asarray(rng.standard_normal(np.asarray(f).shape))
                for f in b64)
    # f64 ground truth through the generic applier
    mv = operator_applier(A)
    au = mv(u64)
    r_true = [np.asarray(bb) - np.asarray(aa) for bb, aa in zip(b64, au)]
    # df64 path from the f32-rounded split representation of u
    u_hi = tuple(jnp.asarray(np.asarray(f), jnp.float32) for f in u64)
    u_lo = tuple(jnp.asarray(np.asarray(f)
                             - np.asarray(f, np.float32).astype(np.float64),
                             jnp.float32) for f in u64)
    b32 = tuple(jnp.asarray(np.asarray(f), jnp.float32) for f in b64)
    # the df64 input represents u to ~1e-14; b to f32 only, so compare
    # against the truth computed from the SAME rounded operands
    b_eff = [np.asarray(bb, np.float32).astype(np.float64)
             for bb in b64]
    u_eff = [np.asarray(h, np.float64) + np.asarray(l, np.float64)
             for h, l in zip(u_hi, u_lo)]
    au_eff = mv(tuple(jnp.asarray(u) for u in u_eff))
    r_eff = [be - np.asarray(ae) for be, ae in zip(b_eff, au_eff)]
    r_hi, r_lo = residual_df(u_hi, u_lo, b32)
    for i in range(len(r_eff)):
        got = np.asarray(r_hi[i], np.float64) + np.asarray(r_lo[i],
                                                           np.float64)
        scale = np.abs(r_eff[i]).max()
        assert np.abs(got - r_eff[i]).max() <= 1e-10 * max(scale, 1e-30)


def _setup_solver(p, dtype):
    cyc = v_cycle(p.level_contexts, p.rhs_entity,
                  pre_smoothing=2, post_smoothing=1, omega=0.6,
                  partitioning=part.RedBlack,
                  smoother_factory=smoother.generate_collective_jacobi,
                  coarse_operator=p.coarsest_operator)
    low = lower_cycle(cyc, p.approximation, p.rhs_entity)
    om = jnp.asarray(low.default_omegas,
                     jnp.float32 if dtype == np.float32 else None)
    mv = operator_applier(p.outer_solver.operator)

    def precond(fields):
        zero = tuple(jnp.zeros_like(f) for f in fields)
        return low.step(zero, fields, om)

    return mv, precond


def test_refined_split_bicgstab_reaches_1em7_in_f32():
    p32 = _problem(np.float32)
    mv, precond = _setup_solver(p32, np.float32)
    b = p32.rhs_builder(np.float32)
    assert all(f.dtype == jnp.float32 for f in b)
    residual_df = split_system_residual_df(p32.outer_solver.operator)
    x_hi, x_lo, total_k, hist = reliable_bicgstab_split(
        mv, precond, residual_df, b, tol=1e-7, maxiter=3000)
    assert hist[-1] <= 1e-7, f"true rel residual {hist[-1]:.3e}"
    # compare iteration count against the all-f64 protocol
    p64 = _problem(np.float64)
    mv64, precond64 = _setup_solver(p64, np.float64)
    b64 = p64.rhs_builder(np.float64)
    _, k64, h64 = preconditioned_bicgstab_split(
        mv64, precond64, b64, tol=1e-7, maxiter=3000, history_size=0)
    k64 = int(k64)
    assert total_k <= 1.15 * k64 + 10, \
        f"reliable-update f32 used {total_k} iterations vs f64 {k64}"
    # and the residual really is the TRUE residual: recompute in f64
    u = tuple(np.asarray(h, np.float64) + np.asarray(l, np.float64)
              for h, l in zip(x_hi, x_lo))
    au = mv64(tuple(jnp.asarray(f) for f in u))
    r = np.sqrt(sum(float(jnp.sum((bb - aa) ** 2))
                    for bb, aa in zip(b64, au)))
    b_n = np.sqrt(sum(float(jnp.sum(bb ** 2)) for bb in b64))
    assert r / b_n <= 2e-7
