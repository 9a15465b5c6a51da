"""Population-parallel communicator layer (parallel/comm.py).

The contract (mirroring reference optimization/program.py:285-310 +
:495-502): populations are replicated across ranks, evaluation is
partitioned rank::size and allgathered — a multi-rank run must be
*bit-identical* to the single-process run with the same seed.
"""

import random

import pytest

from evostencils_tpu.parallel import comm as comms
from evostencils_tpu.optimization.program import Optimizer
from evostencils_tpu.problems.poisson import poisson_2d
from tests.test_grammar_evolution import build_pset


class TestThreadCommunicator:
    def test_allgather_object(self):
        def body(c):
            return c.allgather_object((c.rank, "x" * (c.rank + 1)))

        out = comms.run_island_threads([body] * 3)
        assert out[0] == out[1] == out[2]
        assert out[0] == [(0, "x"), (1, "xx"), (2, "xxx")]

    def test_shard_allgather_shards_roundtrip(self):
        items = list(range(10))

        def body(c):
            local = c.shard(items)
            # strided partition covers everything exactly once
            return c.allgather_shards([x * 2 for x in local])

        out = comms.run_island_threads([body] * 3)
        for res in out:
            assert res == [x * 2 for x in items]

    def test_allreduce_and_broadcast(self):
        def body(c):
            s = c.allreduce_sum(float(c.rank + 1))
            b = c.broadcast_object(f"r{c.rank}", root=1)
            c.barrier()
            return s, b

        out = comms.run_island_threads([body] * 4)
        assert all(r == (10.0, "r1") for r in out)

    def test_exception_does_not_deadlock(self):
        def body(c):
            if c.rank == 1:
                raise ValueError("boom")
            return c.allgather_object(c.rank)

        with pytest.raises(ValueError, match="boom"):
            comms.run_island_threads([body] * 2)


class TestNullCommunicator:
    def test_identity_collectives(self):
        c = comms.NullCommunicator()
        assert c.allgather_object(5) == [5]
        assert c.allgather_shards([1, 2]) == [1, 2]
        assert c.allreduce_sum(3.0) == 3.0
        assert c.shard([1, 2, 3]) == [1, 2, 3]
        c.barrier()

    def test_optimizer_defaults_to_null(self):
        problem = poisson_2d(max_level=3, min_level=2)
        opt = Optimizer(problem)
        assert isinstance(opt.comm, comms.NullCommunicator)


class TestIslandEvolution:
    """2-rank island run == single-process run, bit for bit (model-based
    fitness is deterministic; measured timing fitness is not)."""

    @staticmethod
    def _run(comm, tmpdir):
        problem = poisson_2d(max_level=3, min_level=2)
        opt = Optimizer(problem, rng=random.Random(0),
                        model_based_estimation=True,
                        checkpoint_directory_path=str(tmpdir),
                        comm=comm)
        pset, _ = build_pset(problem)
        pop, log, hof, _, _ = opt.NSGAII(
            pset=pset, initial_population_size=8, generations=3, mu_=4,
            lambda_=4, min_level=2, max_level=3, verbose=False)
        return {"pop": sorted(str(i) for i in pop),
                "fitness": sorted(i.fitness.values for i in pop),
                "best": sorted(str(i) for i in hof),
                "log": [(r["gen"], r["nevals"]) for r in log],
                "cache_size": len(opt.individual_cache),
                "nevals_total": opt.total_evaluations}

    def test_two_rank_run_matches_single_process(self, tmp_path):
        single = self._run(comms.NullCommunicator(), tmp_path / "s")

        def body(c):
            return self._run(c, tmp_path / f"r{c.rank}")

        r0, r1 = comms.run_island_threads([body] * 2)
        # ranks agree with each other and with the single-process run
        assert r0 == r1
        assert r0["pop"] == single["pop"]
        assert r0["fitness"] == single["fitness"]
        assert r0["best"] == single["best"]
        assert r0["log"] == single["log"]
        # the merged cache holds every evaluation from both ranks
        assert r0["cache_size"] == single["cache_size"]
