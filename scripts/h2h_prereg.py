"""ONE fresh-process run of the pre-registered head-to-head
(results/h2h_prereg.md; VERDICT r4 next-step #1).

Loads the two pre-registered grammar individuals from
results/evolved_champions.json (gen75[0] = prereg-A, gen50[1] =
prereg-B), compiles them plus the reference V(2,1) RB 1.15, measures all
three INTERLEAVED in this process (slope-fit windows S=(2,8,32)), and
appends one JSON line to results/h2h_prereg.jsonl.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/h2h_prereg.py
"""

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

PREREG = [
    ("prereg-A", "poisson2d_1023sq_seeded_gen75", 0),
    ("prereg-B", "poisson2d_1023sq_seeded_gen50", 1),
]


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    print(f"[prereg] device: {dev}", file=sys.stderr, flush=True)

    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.evaluation.evaluator import CycleEvaluator
    from evostencils_tpu.grammar.multigrid import generate_primitive_set
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu.grammar import gp
    from evostencils_tpu.ir import transformations

    problem = poisson_2d(max_level=10, min_level=5)
    problem.dtype = np.float32
    evaluator = CycleEvaluator(problem)
    # batch-2 amendment (results/h2h_prereg.md): window/budget/output
    # overridable by env so both batches share this one runner
    import os
    windows = tuple(int(w) for w in os.environ.get(
        "H2H_WINDOWS", "2,8,32").split(","))
    evaluator.timing_window_sizes = windows
    evaluator.timing_window_budget_s = float(
        os.environ.get("H2H_BUDGET_S", "4.0"))
    pset, _ = generate_primitive_set(
        problem.approximation, problem.rhs_entity, problem.level_contexts,
        problem.coarsest_operator)

    champions = json.loads(
        (ROOT / "results" / "evolved_champions.json").read_text())
    entries = []
    ref_cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                        pre_smoothing=2, post_smoothing=1, omega=1.15,
                        partitioning=part.RedBlack,
                        coarse_operator=problem.coarsest_operator)
    transformations.assign_cycle_ids(ref_cycle)
    entries.append(("reference", ref_cycle))
    for name, key, idx in PREREG:
        tree = gp.parse_tree(champions[key][idx]["grammar"], pset)
        expr = gp.compile_tree(tree, pset)[0]
        transformations.assign_cycle_ids(expr)
        entries.append((name, expr))

    t0 = time.time()
    rows = evaluator.measure_interleaved(entries, reps=9)
    wall = time.time() - t0

    ref = next(r for r in rows if r["key"] == "reference")
    record = {"ts": time.time(), "wall_s": round(wall, 1),
              "device": str(dev), "reps": 9,
              "windows": list(evaluator.timing_window_sizes)}
    for r in rows:
        record[r["key"]] = {
            "t_conv_ms": r["time_to_convergence_ms"],
            "rho": r["convergence_factor"],
            "it": r["iterations"],
            "ms_per_iter": r["ms_per_iter"],
            "spread": list(r["ms_per_iter_spread"]),
        }
        if r["key"] != "reference":
            record[r["key"]]["ratio"] = (
                r["time_to_convergence_ms"] / ref["time_to_convergence_ms"])
    out = ROOT / "results" / os.environ.get("H2H_OUT", "h2h_prereg.jsonl")
    with out.open("a") as f:
        f.write(json.dumps(record) + "\n")
    for name in ("prereg-A", "prereg-B"):
        print(f"[prereg] {name}: t_conv {record[name]['t_conv_ms']:.3f} ms "
              f"ratio {record[name]['ratio']:.3f} "
              f"(ref {ref['time_to_convergence_ms']:.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
