"""Reducer for the pre-registered head-to-head (results/h2h_prereg.md):
per-individual median ratio, two-sided sign test, bootstrap 95% CI of
the median. Decision rule fixed in the pre-registration document.

    python scripts/h2h_prereg_report.py [results/h2h_prereg.jsonl]
"""

import json
import math
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]


def sign_test_p(wins: int, n: int) -> float:
    """Two-sided exact binomial test against p=0.5."""
    def pmf(k):
        return math.comb(n, k) * 0.5 ** n
    observed = pmf(wins)
    return min(1.0, sum(pmf(k) for k in range(n + 1)
                        if pmf(k) <= observed + 1e-15))


def bootstrap_ci(x, n_boot=10_000, seed=0):
    rng = np.random.default_rng(seed)
    meds = np.median(
        rng.choice(x, size=(n_boot, len(x)), replace=True), axis=1)
    return float(np.percentile(meds, 2.5)), float(np.percentile(meds, 97.5))


def main():
    path = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else (
        ROOT / "results" / "h2h_prereg.jsonl")
    runs = [json.loads(line) for line in path.read_text().splitlines()
            if line.strip()]
    print(f"{len(runs)} runs in {path}")
    ref_t = np.array([r["reference"]["t_conv_ms"] for r in runs])
    print(f"reference t_conv across runs: median {np.median(ref_t):.3f} ms, "
          f"range [{ref_t.min():.3f}, {ref_t.max():.3f}] "
          f"(noise floor: max/min {ref_t.max()/ref_t.min():.2f}x)")
    for name in ("prereg-A", "prereg-B"):
        ratios = np.array([r[name]["ratio"] for r in runs])
        rhos = np.array([r[name]["rho"] for r in runs])
        its = np.array([r[name]["it"] for r in runs])
        wins = int((ratios < 1.0).sum())
        med = float(np.median(ratios))
        lo, hi = bootstrap_ci(ratios)
        p = sign_test_p(wins, len(ratios))
        verdict = ("WIN" if med < 1.0 and hi < 1.0 else
                   "LOSS" if med > 1.0 and lo > 1.0 else "PARITY")
        print(f"{name}: median ratio {med:.3f}  95% CI [{lo:.3f}, {hi:.3f}]  "
              f"wins {wins}/{len(ratios)}  sign-test p={p:.4f}  -> {verdict}")
        print(f"    physics: rho median {np.median(rhos):.4f}, "
              f"iterations median {np.median(its):.0f}")


if __name__ == "__main__":
    main()
