"""Subprocess body for the 2-process ``jax.distributed`` CPU test.

Launched by ``tests/test_multihost.py`` with a fresh interpreter per rank:
``python tests/multihost_worker.py <coordinator_port> <process_id> <out>``.
Brings up the JAX multi-host runtime over localhost, drives every
:class:`JaxProcessCommunicator` collective, runs a 2-rank model-based
mini-evolution, and dumps the results as JSON for the parent to compare
against a single-process run (reference contract: the optimizer keeps
populations replicated and only partitions evaluation, so a deterministic
fitness stream must yield identical evolution on every rank and in the
solo run — reference optimization/program.py:285-310, :495-502).
"""

import json
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    port, process_id, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from evostencils_tpu.parallel.comm import initialize_multihost
    comm = initialize_multihost(f"localhost:{port}", 2, process_id)

    # -- raw collectives ----------------------------------------------------
    gathered = comm.allgather_object({"rank": comm.rank,
                                      "blob": "x" * (100 * (comm.rank + 1))})
    reduced = comm.allreduce_sum(comm.rank + 1.5)
    bcast = comm.broadcast_object(f"from-{comm.rank}", root=1)
    full = list(range(7))
    reassembled = comm.allgather_shards(comm.shard(full))

    # -- 2-rank mini-evolution (deterministic model-based fitness) ----------
    from evostencils_tpu.optimization.program import Optimizer
    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.grammar.multigrid import generate_primitive_set

    problem = poisson_2d(max_level=3, min_level=2)
    pset, _ = generate_primitive_set(
        problem.approximation, problem.rhs_entity, problem.level_contexts,
        problem.coarsest_operator)
    opt = Optimizer(problem, rng=random.Random(123), comm=comm,
                    model_based_estimation=True,
                    checkpoint_directory_path=out_path + f".ckpt{comm.rank}")
    pop, log, hof, _, _ = opt.NSGAII(
        pset=pset, initial_population_size=8, generations=2, mu_=4,
        lambda_=4, min_level=2, max_level=3, verbose=False)
    best = min(hof, key=lambda i: i.fitness.values)

    json.dump({
        "rank": comm.rank,
        "size": comm.size,
        "gathered": gathered,
        "reduced": reduced,
        "bcast": bcast,
        "reassembled": reassembled,
        "best": str(best),
        "best_fitness": list(best.fitness.values),
        "population": sorted(str(i) for i in pop),
        "total_evaluations": opt.total_evaluations,
    }, open(out_path, "w"))


if __name__ == "__main__":
    main()
