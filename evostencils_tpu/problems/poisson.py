"""Poisson model problems (reference example_problems/Poisson/*).

2D (levels 5->9): -Lap u = pi^2 cos(pi x) - 4 pi^2 sin(2 pi y) with exact
Dirichlet data u = cos(pi x) - sin(2 pi y)
(2D_FD_Poisson_fromL2.exa2:1-12).
3D (levels 2->6): Laplace equation with harmonic boundary data
u = x^2 - y^2/2 - z^2/2, RHS = 0 (3D_FD_Poisson_fromL2.exa2:1-10).
Reference solver config: V-cycle, RB-GS omega=1.15, 2 pre / 1 post,
CG coarse solve, residual reduction 1e-12
(2D_FD_Poisson_fromL2.exa3 `generate solver` block).
"""

from __future__ import annotations

import numpy as np

from ..grids import unit_interval_grid
from ..ir import base, system
from ..stencils import gallery
from .api import Problem, scalar_hierarchy, node_positions, fold_dirichlet


def _u_exact_2d(x, y):
    return np.cos(np.pi * x) - np.sin(2.0 * np.pi * y)


def _f_2d(x, y):
    return np.pi ** 2 * np.cos(np.pi * x) - 4.0 * np.pi ** 2 * np.sin(2.0 * np.pi * y)


def _u_exact_3d(x, y, z):
    return x * x - 0.5 * y * y - 0.5 * z * z


def poisson_2d(max_level: int = 9, min_level: int = 5) -> Problem:
    contexts, coarsest = scalar_hierarchy(
        "Poisson2D", 2, max_level, min_level, gallery.Poisson2D())
    rhs_entity = system.RightHandSide(
        "f", [base.RightHandSide("f", contexts[0].grid[0])])
    grid = contexts[0].grid[0]
    stencil = gallery.Poisson2D().generate_stencil(grid)

    def rhs_builder(dtype):
        import jax.numpy as jnp
        X, Y = node_positions(grid)
        b = fold_dirichlet(stencil, grid, _u_exact_2d, _f_2d(X, Y))
        return (jnp.asarray(b, dtype=dtype),)

    def exact_solution():
        X, Y = node_positions(grid)
        return (_u_exact_2d(X, Y),)

    return Problem(name="Poisson2D", dimension=2, min_level=min_level,
                   max_level=max_level, fields=["u"],
                   level_contexts=contexts, coarsest_operator=coarsest,
                   rhs_entity=rhs_entity, rhs_builder=rhs_builder,
                   target_reduction=1e-12, max_iterations=100,
                   exact_solution=exact_solution)


def poisson_3d(max_level: int = 6, min_level: int = 2) -> Problem:
    contexts, coarsest = scalar_hierarchy(
        "Poisson3D", 3, max_level, min_level, gallery.Poisson3D())
    rhs_entity = system.RightHandSide(
        "f", [base.RightHandSide("f", contexts[0].grid[0])])
    grid = contexts[0].grid[0]
    stencil = gallery.Poisson3D().generate_stencil(grid)

    def rhs_builder(dtype):
        import jax.numpy as jnp
        b = fold_dirichlet(stencil, grid, _u_exact_3d)   # RHS_u = 0
        return (jnp.asarray(b, dtype=dtype),)

    def exact_solution():
        X, Y, Z = node_positions(grid)
        return (_u_exact_3d(X, Y, Z),)

    return Problem(name="Poisson3D", dimension=3, min_level=min_level,
                   max_level=max_level, fields=["u"],
                   level_contexts=contexts, coarsest_operator=coarsest,
                   rhs_entity=rhs_entity, rhs_builder=rhs_builder,
                   target_reduction=1e-12, max_iterations=100,
                   exact_solution=exact_solution)


def poisson_2d_variable(max_level: int = 9, min_level: int = 5) -> Problem:
    """Variable-coefficient 2D Poisson -div(a grad u), a = exp(10 (x-x²)(y-y²))
    (reference gallery.py:93-136).

    The executable operator is the full per-node coefficient field
    (gallery.Poisson2DVariableCoefficients.generate_stencil_field); the
    position-frozen constant stencil is kept for Fourier-mode analysis.
    """
    contexts, coarsest = scalar_hierarchy(
        "Poisson2DVar", 2, max_level, min_level,
        gallery.Poisson2DVariableCoefficients())
    rhs_entity = system.RightHandSide(
        "f", [base.RightHandSide("f", contexts[0].grid[0])])
    grid = contexts[0].grid[0]
    stencil = gallery.Poisson2DVariableCoefficients().generate_stencil(grid)

    def rhs_builder(dtype):
        import jax.numpy as jnp
        X, Y = node_positions(grid)
        b = fold_dirichlet(stencil, grid, _u_exact_2d, _f_2d(X, Y))
        return (jnp.asarray(b, dtype=dtype),)

    return Problem(name="Poisson2DVar", dimension=2, min_level=min_level,
                   max_level=max_level, fields=["u"],
                   level_contexts=contexts, coarsest_operator=coarsest,
                   rhs_entity=rhs_entity, rhs_builder=rhs_builder)


def poisson_3d_variable(max_level: int = 5, min_level: int = 2) -> Problem:
    """Variable-coefficient 3D Poisson -div(a grad u) with the reference's
    exp-kappa coefficient (reference gallery.py:139-185); executable
    operator is the per-node coefficient field, the position-frozen
    constant stencil is kept for Fourier-mode analysis."""
    contexts, coarsest = scalar_hierarchy(
        "Poisson3DVar", 3, max_level, min_level,
        gallery.Poisson3DVariableCoefficients())
    rhs_entity = system.RightHandSide(
        "f", [base.RightHandSide("f", contexts[0].grid[0])])
    grid = contexts[0].grid[0]
    stencil = gallery.Poisson3DVariableCoefficients().generate_stencil(grid)

    def rhs_builder(dtype):
        import jax.numpy as jnp
        b = fold_dirichlet(stencil, grid, _u_exact_3d)   # RHS_u = 0
        return (jnp.asarray(b, dtype=dtype),)

    return Problem(name="Poisson3DVar", dimension=3, min_level=min_level,
                   max_level=max_level, fields=["u"],
                   level_contexts=contexts, coarsest_operator=coarsest,
                   rhs_entity=rhs_entity, rhs_builder=rhs_builder)
