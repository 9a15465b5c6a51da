"""Mid-run generalization + level-chunked checkpoint/resume regression tests.

Covers the reference's two flagship evolution features:
- generalization: grow ``maxLevel`` mid-run and re-evaluate the population
  against the larger problem (reference optimization/program.py:512-539);
- level-chunked runs with cross-run checkpoint restoration: coarser chunks'
  candidates are measured underneath the already-evolved finer chain, and a
  killed run resumes mid-chunk reproducing the uninterrupted evolution
  stream (reference optimization/program.py:770-902, :794-801, :813-820).
"""

import os
import random

import pytest

from evostencils_tpu.grammar import gp
from evostencils_tpu.grammar.multigrid import generate_primitive_set
from evostencils_tpu.optimization.program import (
    Optimizer, load_checkpoint_from_file)
from evostencils_tpu.problems.poisson import poisson_2d


def build_pset(problem, **kwargs):
    return generate_primitive_set(problem.approximation, problem.rhs_entity,
                                  problem.level_contexts,
                                  problem.coarsest_operator, **kwargs)


def factory(min_level, max_level):
    return poisson_2d(max_level=max_level, min_level=min_level)


class TestGeneralization:
    def test_population_survives_growth(self, tmp_path):
        """After the growth step the population must NOT collapse to
        infinity fitness (round-1 failure mode: stale pset closures)."""
        problem = factory(2, 4)
        opt = Optimizer(problem, rng=random.Random(0),
                        problem_factory=factory,
                        checkpoint_directory_path=str(tmp_path))
        pset, _ = build_pset(problem)
        pop, log, hof, new_min, new_max = opt.NSGAII(
            pset=pset, initial_population_size=8, generations=4, mu_=4,
            lambda_=4, min_level=2, max_level=4,
            generalization_interval=2, verbose=False)
        # interval=2 over 4 generations -> exactly one growth step
        assert (new_min, new_max) == (3, 5)
        assert opt.problem.finest_grid[0].size == factory(3, 5).finest_grid[0].size
        finite = [i for i in pop
                  if all(v < opt.infinity for v in i.fitness.values)]
        assert finite, "population collapsed to infinity after growth"
        best = min(hof, key=lambda i: i.fitness.values[0])
        assert best.fitness.values[0] < 1.0   # still a converging solver

    def test_robustness_variants_regrow_with_problem(self, tmp_path):
        """Generalization must rebuild the robustness-variant grammars too:
        the variant psets name OLD-level entities, so without regrowth
        every post-growth re-parse would KeyError into infinity fitness
        (the round-1 stale-pset failure mode, variant flavor)."""
        problem = factory(2, 4)
        variant = factory(2, 4)          # same PDE as a stand-in variant
        opt = Optimizer(problem, rng=random.Random(5),
                        problem_factory=factory,
                        robustness_problems=[variant],
                        robustness_factories=[factory],
                        checkpoint_directory_path=str(tmp_path))
        result = opt.evolutionary_optimization(
            mu_=4, lambda_=4, generations=4,
            population_initialization_factor=2,
            generalization_interval=2, verbose=False)
        # interval=2 over 4 generations -> one growth step (2,4) -> (3,5)
        assert opt.problem.max_level == 5
        # the variant grammars were rebuilt at the new levels
        assert opt._robustness
        for _, pset_v in opt._robustness:
            assert any("5" in name for name in pset_v.mapping), \
                "variant pset still names old levels"
        best = result["best_individual"]
        assert all(v < opt.infinity for v in best.fitness.values), \
            "best individual collapsed after growth with robustness"

    def test_generalization_without_variant_factories_raises(self, tmp_path):
        problem = factory(2, 4)
        opt = Optimizer(problem, rng=random.Random(6),
                        problem_factory=factory,
                        robustness_problems=[factory(2, 4)],
                        checkpoint_directory_path=str(tmp_path))
        with pytest.raises(ValueError, match="robustness_factories"):
            opt.evolutionary_optimization(
                mu_=4, lambda_=4, generations=4,
                population_initialization_factor=2,
                generalization_interval=2, verbose=False)

    def test_transfer_preserves_structure(self):
        """Every tree must transfer positionally to the regrown grammar:
        same shape, same symbol indices, compilable against the new grids
        (symbol NAMES shift with the levels, e.g. P_3 -> P_4)."""
        problem = factory(2, 4)
        opt = Optimizer(problem, rng=random.Random(1),
                        problem_factory=factory)
        pset, _ = build_pset(problem)
        opt._pset = pset
        old_order = {name: i for i, name in enumerate(pset.mapping)}
        rng = random.Random(2)
        pop = [gp.genGrow(pset, 0, 50, rng=rng) for _ in range(16)]
        transferred = opt._generalize(3, 5, pop)
        assert len(transferred) == len(pop)
        new_order = {name: i for i, name in enumerate(opt._pset.mapping)}
        for old, new in zip(pop, transferred):
            assert len(new) == len(old)
            assert [new_order[n.name] for n in new] == \
                [old_order[n.name] for n in old]
            assert not new.fitness.valid
            gp.compile_tree(new, opt._pset)    # compiles against new grids


class TestChunkedRuns:
    kwargs = dict(mu_=4, lambda_=4, population_initialization_factor=2,
                  generations=4, levels_per_run=2, verbose=False)

    def _make(self, path, seed=7, **kw):
        return Optimizer(poisson_2d(max_level=4, min_level=1),
                         rng=random.Random(seed),
                         checkpoint_directory_path=str(path), **kw)

    def test_chunked_run_builds_chain(self, tmp_path):
        result = self._make(tmp_path).evolutionary_optimization(**self.kwargs)
        # 3 levels / 2 per run -> 2 chunks, 1 finished link above the last
        assert len(result["chunk_grammar_strings"]) == 2
        assert len(result["chain"]) == 1
        vals = result["best_individual"].fitness.values
        assert all(v < Optimizer.infinity for v in vals)

    def test_resume_mid_chunk_reproduces_uninterrupted(self, tmp_path):
        # model-based fitness: deterministic, so the interrupted+resumed
        # stream must reproduce the uninterrupted one EXACTLY (measured
        # wall-clock fitness is not reproducible even between two
        # uninterrupted runs — comm.py replication-contract note)
        full = self._make(
            tmp_path / "a",
            model_based_estimation=True).evolutionary_optimization(
            **self.kwargs)

        # interrupted run: kill right after chunk 2's first checkpoint save
        # (saves go at gen 2 and 4 per chunk -> calls 1,2 are chunk 1)
        opt2 = self._make(tmp_path / "b", model_based_estimation=True)
        calls = {"n": 0}
        orig = opt2._save_checkpoint

        def save_then_die(*a, **k):
            orig(*a, **k)
            calls["n"] += 1
            if calls["n"] == 3:
                raise KeyboardInterrupt

        opt2._save_checkpoint = save_then_die
        with pytest.raises(KeyboardInterrupt):
            opt2.evolutionary_optimization(**self.kwargs)

        cp = load_checkpoint_from_file(
            os.path.join(str(tmp_path / "b"), "checkpoint.p"))
        assert len(cp.finished_chunks) == 1      # chunk 1 done at kill time
        assert cp.generation == 2

        resumed = self._make(
            tmp_path / "b",
            model_based_estimation=True).evolutionary_optimization(
            continue_from_checkpoint=True, **self.kwargs)
        assert str(resumed["best_individual"]) == str(full["best_individual"])
        assert resumed["best_individual"].fitness.values == \
            full["best_individual"].fitness.values
        assert resumed["chunk_grammar_strings"] == \
            full["chunk_grammar_strings"]

    def test_chunked_program_reevaluates_from_strings(self, tmp_path):
        """The stored per-chunk grammar strings must rebuild the SAME
        composed program: re-evaluation reproduces the run's convergence
        factor (stored-solver protocol for chunked runs)."""
        opt = self._make(tmp_path)
        result = opt.evolutionary_optimization(**self.kwargs)
        expr, res = opt.evaluate_chunked_program(
            result["chunk_grammar_strings"], levels_per_run=2)
        vals = result["best_individual"].fitness.values
        assert res.convergence_factor < Optimizer.infinity
        assert res.convergence_factor == pytest.approx(vals[0], rel=1e-2)

    def test_mu_mismatch_warns_and_restarts(self, tmp_path, capsys):
        opt = self._make(tmp_path)
        kwargs = dict(self.kwargs, levels_per_run=None, generations=2)
        opt.evolutionary_optimization(**kwargs)
        opt2 = self._make(tmp_path)
        result = opt2.evolutionary_optimization(
            continue_from_checkpoint=True,
            **dict(kwargs, mu_=6, lambda_=6, verbose=True))
        out = capsys.readouterr().out
        assert "does not match mu" in out
        vals = result["best_individual"].fitness.values
        assert all(v < Optimizer.infinity for v in vals)
