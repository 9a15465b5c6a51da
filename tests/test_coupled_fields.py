"""coupled_fields grammar semantics: on a split-complex problem the
(re, im) pair is ONE logical field, so "decoupled" Jacobi must mean
complex point division — i.e. collective (ElementwiseDiagonal) smoothing
over the 2x2 block — keeping the split search space identical to the
complex formulation's (where F=1 makes decoupled == collective
trivially).  Without this, per-part diagonal smoothing ignores the re/im
coupling, a choice the reference's complex grammar cannot express and
which diverges on the indefinite operator."""

import numpy as np
import jax.numpy as jnp

from evostencils_tpu.grammar.multigrid import generate_primitive_set
from evostencils_tpu.grammar import gp
from evostencils_tpu.ir import base, system, transformations
from evostencils_tpu.problems.helmholtz import helmholtz_2d_split


GRAMMAR = ("decoupled_jacobi_0(rf_20,red_black,"
           "residual_0__S_guard_0(u_and_f))")
# under coupled_fields the production is registered under a distinct name
# so stale checkpoints cannot silently reinterpret (round-3 advisor)
GRAMMAR_COUPLED = GRAMMAR.replace("decoupled_jacobi_0",
                                  "coupled_point_jacobi_0")


def _inverse_operand_types(expr):
    found = []

    def walk(e):
        if isinstance(e, base.Inverse):
            found.append(type(e.operand))
        for c in e.children:
            walk(c)

    walk(expr)
    return found


def _psets():
    p = helmholtz_2d_split(max_level=5, min_level=3)
    args = (p.approximation, p.rhs_entity, p.level_contexts,
            p.coarsest_operator)
    pset_coupled, _ = generate_primitive_set(*args, coupled_fields=True)
    pset_plain, _ = generate_primitive_set(*args, coupled_fields=False)
    return p, pset_coupled, pset_plain


def test_problem_flag_set():
    p = helmholtz_2d_split(max_level=5, min_level=3)
    assert p.coupled_fields is True


def test_decoupled_production_is_collective_under_coupled_fields():
    _, pset_coupled, pset_plain = _psets()
    e_c = gp.compile_tree(gp.parse_tree(GRAMMAR_COUPLED, pset_coupled),
                          pset_coupled)[0]
    e_p = gp.compile_tree(gp.parse_tree(GRAMMAR, pset_plain),
                          pset_plain)[0]
    assert _inverse_operand_types(e_c) == [system.ElementwiseDiagonal]
    assert _inverse_operand_types(e_p) == [system.Diagonal]
    # the old name must NOT parse against the coupled grammar (and vice
    # versa): stale checkpoints fail loudly instead of silently remapping
    import pytest
    with pytest.raises((KeyError, ValueError, SyntaxError)):
        gp.parse_tree(GRAMMAR, pset_coupled)
    with pytest.raises((KeyError, ValueError, SyntaxError)):
        gp.parse_tree(GRAMMAR_COUPLED, pset_plain)


def test_coupled_decoupled_equals_collective_step():
    p, pset_coupled, _ = _psets()
    p.dtype = np.float64
    collective = GRAMMAR.replace("decoupled_jacobi_0",
                                 "collective_jacobi_0")
    from evostencils_tpu.compiler.lower import lower_cycle
    outs = []
    for s in (GRAMMAR_COUPLED, collective):
        expr = gp.compile_tree(gp.parse_tree(s, pset_coupled),
                               pset_coupled)[0]
        transformations.assign_cycle_ids(expr)
        low = lower_cycle(expr, p.approximation, p.rhs_entity)
        b = p.build_rhs()
        u0 = tuple(jnp.zeros_like(x) for x in b)
        om = jnp.asarray(low.default_omegas, jnp.float64)
        outs.append(low.step(u0, b, om))
    for a, c in zip(*outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=0, atol=1e-14)
