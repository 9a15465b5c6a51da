"""Tree analyses over the IR (reference ir/transformations.py)."""

from . import base, system


def obtain_coarsest_level(cycle: base.Cycle) -> int:
    """Minimum grid level reachable from the cycle (reference
    ir/transformations.py:13-41)."""

    def recurse(expr, min_level):
        if isinstance(expr, base.Cycle):
            g = expr.grid
            level = min(e.level for e in g) if isinstance(g, list) else g.level
            min_level = min(min_level, level)
            return min(recurse(expr.correction, min_level), min_level)
        for child in expr.children:
            min_level = min(min_level, recurse(child, min_level))
        return min_level

    g = cycle.grid
    start = min(e.level for e in g) if isinstance(g, list) else g.level
    return recurse(cycle, start)


def count_nodes(expr: base.Expression) -> int:
    seen = set()

    def recurse(e):
        if id(e) in seen:
            return 0
        seen.add(id(e))
        return 1 + sum(recurse(c) for c in e.children)

    return recurse(expr)


def find_nodes(expr: base.Expression, node_type) -> list:
    """All (unique) nodes of a given type in the expression DAG."""
    seen = set()
    out = []

    def recurse(e):
        if id(e) in seen:
            return
        seen.add(id(e))
        if isinstance(e, node_type):
            out.append(e)
        for c in e.children:
            recurse(c)

    recurse(expr)
    return out


def assign_cycle_ids(expr: base.Expression) -> int:
    """Number every Cycle node in evaluation order; returns the count.
    Used by the relaxation-weight tuning path (reference
    optimization/program.py weight_obtained/weight_set bookkeeping)."""
    cycles = find_nodes(expr, base.Cycle)
    for i, c in enumerate(cycles):
        c.global_id = i
    return len(cycles)
