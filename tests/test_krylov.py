"""Fixed-iteration Krylov solvers (ops/solvers.py) and the
KrylovSubspaceMethod IR dispatch (compiler/lower.py FIXED_KRYLOV).

The reference extracts CG/BiCGStab/MinRes/ConjugateResidual bodies from
ExaStencils-generated code (code_generation/exastencils.py:1025-1101) and
its default Poisson solver uses a CG coarse solve
(example_problems/Poisson/2D_FD_Poisson_fromL2.exa3:5-9); these are the
native counterparts.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evostencils_tpu.ops import solvers


def _spd_system(n=40, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.linspace(1.0, 50.0, n)
    a = (q * lam) @ q.T
    b = rng.standard_normal(n)
    return a, b


def _indefinite_system(n=40, seed=1):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.concatenate([np.linspace(-30.0, -1.0, n // 2),
                          np.linspace(1.0, 30.0, n - n // 2)])
    a = (q * lam) @ q.T
    b = rng.standard_normal(n)
    return a, b


def _matvec(a):
    aj = jnp.asarray(a, jnp.float64)
    return lambda v: (aj @ v[0],)


@pytest.mark.parametrize("name", ["CG", "MinRes", "ConjugateResidual"])
def test_fixed_krylov_spd_exact_in_n_iterations(name):
    a, b = _spd_system()
    x = solvers.FIXED_KRYLOV[name](_matvec(a), (jnp.asarray(b),), a.shape[0])
    ref = np.linalg.solve(a, b)
    np.testing.assert_allclose(np.asarray(x[0]), ref, rtol=1e-6, atol=1e-8)


def test_bicgstab_fixed_nonsymmetric():
    rng = np.random.default_rng(2)
    n = 30
    a = np.eye(n) * 10 + rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    x = solvers.bicgstab_fixed(_matvec(a), (jnp.asarray(b),), 2 * n)
    np.testing.assert_allclose(np.asarray(x[0]), np.linalg.solve(a, b),
                               rtol=1e-5, atol=1e-7)


def test_minres_indefinite_monotone_residual():
    """MINRES minimizes the residual over the Krylov space, so the
    residual norm is non-increasing even on indefinite operators (where
    plain CG breaks and CR can stall)."""
    a, b = _indefinite_system()
    mv = _matvec(a)
    bt = (jnp.asarray(b),)
    prev = np.linalg.norm(b)
    for k in [2, 5, 10, 20, 40]:
        x = solvers.minres_fixed(mv, bt, k)
        r = np.linalg.norm(b - a @ np.asarray(x[0]))
        assert r <= prev * (1 + 1e-10), (k, r, prev)
        prev = r
    # full Krylov space -> exact solve (f32 arithmetic without x64)
    np.testing.assert_allclose(np.asarray(x[0]), np.linalg.solve(a, b),
                               rtol=1e-3, atol=1e-5)


def test_minres_differs_from_cr_on_indefinite():
    """The old alias returned conjugate residuals; true MINRES follows a
    different (residual-optimal) trajectory at truncated iteration counts."""
    a, b = _indefinite_system(seed=5)
    mv = _matvec(a)
    bt = (jnp.asarray(b),)
    x_mr = solvers.minres_fixed(mv, bt, 6)
    r_mr = np.linalg.norm(b - a @ np.asarray(x_mr[0]))
    x_cr = solvers.conjugate_residual_fixed(mv, bt, 6)
    r_cr = np.linalg.norm(b - a @ np.asarray(x_cr[0]))
    # MINRES residual is optimal over the same Krylov space
    assert r_mr <= r_cr * (1 + 1e-8)


def test_minres_zero_rhs():
    a, _ = _spd_system()
    x = solvers.minres_fixed(_matvec(a), (jnp.zeros(a.shape[0]),), 10)
    np.testing.assert_allclose(np.asarray(x[0]), 0.0)


def test_krylov_ir_dispatch_in_v_cycle():
    """A V-cycle whose coarsest solve is a KrylovSubspaceMethod node (CG,
    fixed iterations) matches the dense-CGS V-cycle solve — exercising
    the FIXED_KRYLOV lowering path end to end."""
    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.compiler.solve import make_solver
    from evostencils_tpu.ir import partitioning as part

    problem = poisson_2d(max_level=6, min_level=4)
    problem.dtype = np.float64
    results = {}
    for krylov in [None, "CG"]:
        cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                        pre_smoothing=2, post_smoothing=1, omega=1.15,
                        partitioning=part.RedBlack,
                        coarse_operator=problem.coarsest_operator,
                        coarse_krylov=krylov,
                        coarse_krylov_iterations=300)
        lowered = lower_cycle(cycle, problem.approximation,
                              problem.rhs_entity)
        b = problem.build_rhs()
        u0 = tuple(jnp.zeros_like(x) for x in b)
        om = jnp.asarray(lowered.default_omegas)
        run = make_solver(lowered, max_iterations=30,
                          target_reduction=1e-10)
        u, k, hist = run(u0, b, om)
        results[krylov] = (np.asarray(u[0]), int(k))
    u_dense, k_dense = results[None]
    u_cg, k_cg = results["CG"]
    assert k_cg <= k_dense + 1
    np.testing.assert_allclose(u_cg, u_dense, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("name", ["MinRes", "BiCGStab"])
def test_krylov_ir_node_other_methods(name):
    """The other Krylov IR terminals lower and converge as coarse solvers."""
    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.compiler.solve import make_solver
    from evostencils_tpu.ir import partitioning as part

    problem = poisson_2d(max_level=6, min_level=4)
    problem.dtype = np.float64
    cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                    pre_smoothing=2, post_smoothing=1, omega=1.15,
                    partitioning=part.RedBlack,
                    coarse_operator=problem.coarsest_operator,
                    coarse_krylov=name, coarse_krylov_iterations=300)
    lowered = lower_cycle(cycle, problem.approximation, problem.rhs_entity)
    b = problem.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(lowered.default_omegas)
    run = make_solver(lowered, max_iterations=30, target_reduction=1e-10)
    u, k, hist = run(u0, b, om)
    hist = np.asarray(hist)
    assert hist[int(k)] <= 1e-10 * hist[0]
