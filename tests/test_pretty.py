"""The textual program listing (compiler/pretty.py) — the inspectable
analogue of the reference's ExaSlang emission (exastencils.py:684-925,
layer4.py print_exa)."""

from evostencils_tpu.compiler.pretty import pretty_cycle
from evostencils_tpu.compiler.cycles import v_cycle
from evostencils_tpu.ir import partitioning as part
from evostencils_tpu.ir.reference_cycles import generate_v_22_cycle_two_grid
from evostencils_tpu.problems.poisson import poisson_2d


def test_pretty_reference_v22():
    p = poisson_2d(max_level=5, min_level=4)
    cycle = generate_v_22_cycle_two_grid(
        p.level_contexts[0], p.coarsest_operator, p.rhs_entity, omega=1.15)
    text = pretty_cycle(cycle)
    assert text.startswith("gen_mgCycle@")
    # the listing is in evaluation order: residual before each update
    lines = text.splitlines()
    assert any("residual" in ln for ln in lines)
    assert any("update" in ln for ln in lines)
    assert lines[-1].strip().startswith("return u")


def test_pretty_vcycle_shows_levels_and_coloring():
    p = poisson_2d(max_level=6, min_level=4)
    cycle = v_cycle(p.level_contexts, p.rhs_entity, pre_smoothing=1,
                    post_smoothing=1, omega=1.15,
                    partitioning=part.RedBlack,
                    coarse_operator=p.coarsest_operator)
    text = pretty_cycle(cycle)
    assert "level 6" in text and "level 5" in text
    assert "red_black" in text
    assert "CGS(" in text
    # each fine-level smoothing step appears as its own statement
    assert text.count("update @ level 6") >= 2
