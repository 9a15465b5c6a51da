"""Store a campaign checkpoint's hall-of-fame into
results/evolved_champions.json as re-parseable grammar strings — the
native counterpart of the reference's gpem-21-results artifact repo
(reference scripts/evaluate_evolved_solver.py:43 re-measures stored
grammar individuals the same way).

    python scripts/store_champions.py \
        --ckpt .evolve_helmholtz_ckpt/checkpoint.p \
        --key helmholtz_split_k80_biobj_gen50 --top 8
"""

import argparse
import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--key", required=True)
    ap.add_argument("--top", type=int, default=8)
    args = ap.parse_args()

    from evostencils_tpu.optimization.program import load_checkpoint_from_file

    cp = load_checkpoint_from_file(args.ckpt)
    pool = list(cp.hof_items or []) or list(cp.population)
    pool = [ind for ind in pool if ind.fitness.valid
            and all(v < 1e90 for v in ind.fitness.values)]
    # de-duplicate by grammar string, best (lexicographic fitness) first
    seen = {}
    for ind in sorted(pool, key=lambda i: tuple(i.fitness.values)):
        seen.setdefault(str(ind), ind)
    champs = list(seen.values())[:args.top]
    if not champs:
        raise SystemExit(f"no finite individuals in {args.ckpt}")

    entries = []
    for ind in champs:
        vals = tuple(ind.fitness.values)
        e = {"grammar": str(ind), "fitness_rho": vals[0]}
        if len(vals) > 1:
            e["fitness_ms_per_iter"] = vals[1]
        entries.append(e)

    out = ROOT / "results" / "evolved_champions.json"
    data = json.loads(out.read_text()) if out.exists() else {}
    data[args.key] = entries
    out.write_text(json.dumps(data, indent=1))
    print(f"stored {len(entries)} champions under '{args.key}' "
          f"(generation {cp.generation}, {len(pool)} finite in hof)")
    for e in entries[:4]:
        print(f"  rho={e['fitness_rho']:.4g}"
              + (f" ms/it={e['fitness_ms_per_iter']:.4g}"
                 if "fitness_ms_per_iter" in e else "")
              + f"  {e['grammar'][:90]}...")


if __name__ == "__main__":
    main()
