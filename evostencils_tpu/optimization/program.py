"""Evolutionary optimizer: (mu+lambda) G3P over the multigrid grammar.

Native counterpart of the reference Optimizer
(optimization/program.py:67-954): same evolutionary loop — initial
population, crossover/mutation with cache-aware retry, elitism + NSGA-II/III
or unique-best selection, fitness caching by tree string, checkpointing
every ``checkpoint_frequency`` generations, mid-run generalization (problem
growth), and level-chunked runs whose best cycle becomes the coarse-grid
solver of the next finer run.

Differences by design:
* evaluation is the batched native backend (evaluation/evaluator.py), not
  subprocess codegen — whole structure groups evaluate in one TPU program;
* distribution rides host-level collectives over the JAX runtime
  (parallel/comm.py) instead of mpi4py: populations stay replicated
  (every rank runs the identical rng/selection stream — pass the same
  seed on all ranks), evaluation is partitioned ``pending[rank::size]``
  and (tree-string, fitness) pairs are allgathered, dividing evaluation
  cost by the rank count (reference program.py:478,495-502,580-588);
  with deterministic (model-based) fitness a multi-rank run is
  bit-identical to the single-process run.
"""

from __future__ import annotations

import math
import os
import pickle
import random
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

from ..grammar import gp
from ..grammar.multigrid import generate_primitive_set
from ..ir import base, system, transformations
from ..compiler.lower import make_cycle_applier
from ..evaluation.evaluator import CycleEvaluator, EvaluationResult
from ..parallel.comm import Communicator, NullCommunicator
from . import nsga


@dataclass
class CheckPoint:
    """Pickled evolution state (reference optimization/program.py:47-64)."""
    min_level: int
    max_level: int
    generation: int
    solver_expression: object
    population: list
    logbooks: list

    def dump_to_file(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(self, f)


def load_checkpoint_from_file(path: str) -> CheckPoint:
    with open(path, "rb") as f:
        return pickle.load(f)


class Optimizer:
    """G3P optimizer over a Problem."""

    infinity = 1e100
    epsilon = 1e-20

    def __init__(self, problem, *, evaluator: Optional[CycleEvaluator] = None,
                 checkpoint_directory_path: str = "./checkpoints",
                 problem_factory: Optional[Callable] = None,
                 convergence_evaluator=None, performance_evaluator=None,
                 model_based_estimation: bool = False,
                 robustness_problems: Optional[List] = None,
                 rng: Optional[random.Random] = None,
                 comm: Optional[Communicator] = None):
        self.problem = problem
        #: host-level collectives for population-parallel evaluation;
        #: all ranks must construct the Optimizer with the same rng seed
        self.comm = comm or NullCommunicator()
        self.evaluator = evaluator or CycleEvaluator(problem)
        #: harder problem variants every candidate must also solve; fitness
        #: becomes the worst case over all of them (reference Helmholtz
        #: k-doubling robustness loop, exastencils.py:518-532)
        self.robustness_problems = robustness_problems or []
        self._robustness: List[tuple] = []
        self.checkpoint_directory_path = checkpoint_directory_path
        self.problem_factory = problem_factory
        self.model_based_estimation = model_based_estimation
        if model_based_estimation:
            if convergence_evaluator is None:
                from ..prediction.convergence import ConvergenceEvaluator
                convergence_evaluator = ConvergenceEvaluator(
                    problem.dimension, samples_per_axis=8)
            if performance_evaluator is None:
                from ..prediction.performance import (PerformanceEvaluator,
                                                      TPU_V5E)
                performance_evaluator = PerformanceEvaluator(TPU_V5E)
        self.convergence_evaluator = convergence_evaluator
        self.performance_evaluator = performance_evaluator
        self.rng = rng or random.Random()
        self.individual_cache: Dict[str, tuple] = {}
        self.cache_hits = 0
        self.cache_misses = 0
        self.total_evaluations = 0
        self._pset = None
        self._n_objectives = 2

    # -- caching -------------------------------------------------------------

    def individual_in_cache(self, individual) -> bool:
        hit = str(individual) in self.individual_cache
        if hit:
            self.cache_hits += 1
        else:
            self.cache_misses += 1
        return hit

    def add_individual_to_cache(self, individual, values):
        self.individual_cache[str(individual)] = tuple(values)

    # -- evaluation ----------------------------------------------------------

    def _fitness_from_result(self, result: EvaluationResult):
        if self._n_objectives == 2:
            # (convergence factor, time per iteration)
            if result.iterations >= self.infinity:
                return (min(result.convergence_factor, self.infinity),
                        self.infinity)
            return (result.convergence_factor,
                    result.time_to_convergence_ms / max(result.iterations, 1.0))
        # single objective: measured time to convergence
        if result.iterations >= self.infinity:
            return (min(result.convergence_factor, self.infinity) ** 0.5
                    * self.infinity ** 0.5,)
        return (result.time_to_convergence_ms,)

    def evaluate_invalid(self, individuals: List[gp.Individual]):
        """Assign fitness to all invalid individuals, cache-aware and
        batched by structure."""
        pending = []
        for ind in individuals:
            if ind.fitness.valid:
                continue
            if self.individual_in_cache(ind):
                ind.fitness.values = self.individual_cache[str(ind)]
            else:
                pending.append(ind)
        if not pending:
            return 0    # replicated state: all ranks agree, no collective
        # partition evaluation across ranks, allgather the fitness values
        # (reference program.py:495-502 MPI-partitioned evaluation)
        local = self.comm.shard(pending)
        if self.model_based_estimation:
            local_values = [self._estimate_objectives(ind) for ind in local]
        else:
            results = self.evaluator.evaluate_population(local, self._pset)
            local_values = [self._fitness_from_result(r) for r in results]
            local_values = self._apply_robustness(local, local_values)
        values_list = self.comm.allgather_shards(local_values)
        for ind, values in zip(pending, values_list):
            ind.fitness.values = values
            self.add_individual_to_cache(ind, values)
        self.total_evaluations += len(pending)
        return len(pending)

    def _apply_robustness(self, individuals, values_list):
        """Worst-case fitness over the robustness problem variants: each
        individual that solves the base problem is re-parsed against every
        variant grammar and must solve that problem too."""
        if not self._robustness:
            return values_list
        finite = [i for i, v in enumerate(values_list)
                  if all(x < self.infinity for x in v)]
        if not finite:
            return values_list
        values_list = list(values_list)
        for evaluator_v, pset_v in self._robustness:
            parsed = []
            kept = []
            for i in finite:
                try:
                    parsed.append(gp.parse_tree(str(individuals[i]), pset_v))
                    kept.append(i)
                except (KeyError, ValueError, SyntaxError):
                    values_list[i] = (self.infinity,) * len(values_list[i])
            if not parsed:
                continue
            results = evaluator_v.evaluate_population(parsed, pset_v)
            for i, res in zip(kept, results):
                vv = self._fitness_from_result(res)
                values_list[i] = tuple(max(a, b)
                                       for a, b in zip(values_list[i], vv))
            finite = [i for i in kept
                      if all(x < self.infinity for x in values_list[i])]
        return values_list

    def _estimate_objectives(self, individual):
        """Model-based fitness: LFA spectral radius + roofline runtime
        (reference optimization/program.py:319-384)."""
        import math as _math
        try:
            state = gp.compile_tree(individual, self._pset)
            expression = state[0]
            transformations.assign_cycle_ids(expression)
        except (MemoryError, ValueError, NotImplementedError, RuntimeError,
                KeyError):
            return (self.infinity,) * self._n_objectives
        rho = self.convergence_evaluator.compute_spectral_radius(expression)
        bad = (rho == 0.0 or _math.isnan(rho) or _math.isinf(rho))
        if self._n_objectives == 2:
            if bad:
                return (self.infinity, self.infinity)
            runtime = self.performance_evaluator.estimate_runtime(
                expression) * 1e3
            return (rho, runtime)
        if bad:
            return (self.infinity,)
        if self.performance_evaluator is None:
            return (rho,)
        runtime = self.performance_evaluator.estimate_runtime(expression) * 1e3
        if rho < 1:
            return (_math.log(self.epsilon) / _math.log(rho) * runtime,)
        return (rho * self.infinity ** 0.25,)

    # -- evolutionary loop ---------------------------------------------------

    def ea_mu_plus_lambda(self, initial_population_size, generations,
                          generalization_interval, mu_, lambda_,
                          crossover_probability, mutation_probability,
                          min_level, max_level, logbooks,
                          select, select_for_mating, hof,
                          objectives, checkpoint_frequency=2,
                          checkpoint: Optional[CheckPoint] = None,
                          use_random_search=False,
                          solver_expression=None,
                          node_replacement_probability=1.0 / 3.0,
                          verbose=True):
        toolbox_generate = lambda: gp.genGrow(self._pset, 0, 50, rng=self.rng)

        def mutate(ind):
            if self.rng.random() < node_replacement_probability:
                return gp.mutNodeReplacement(ind, self._pset, rng=self.rng)
            return gp.mutate_subtree(ind, 0, 10, self._pset, rng=self.rng)

        use_checkpoint = (checkpoint is not None
                          and mu_ == len(checkpoint.population))
        if use_checkpoint:
            population = checkpoint.population
            min_generation = checkpoint.generation
            logbook = logbooks[-1] if logbooks else []
        else:
            population = [toolbox_generate()
                          for _ in range(initial_population_size)]
            min_generation = 0
            logbook = []
            logbooks.append(logbook)

        if self.comm.size > 1:
            # the sharded-evaluation contract requires replicated
            # populations (same rng seed on every rank) — fail loudly
            # instead of silently assigning fitness to wrong individuals
            digest = hash(tuple(sorted(str(i) for i in population)))
            digests = self.comm.allgather_object(digest)
            if len(set(digests)) != 1:
                raise RuntimeError(
                    "island ranks generated different populations; all "
                    "ranks must construct the Optimizer with the same "
                    "rng seed (parallel/comm.py replication contract)")

        self.evaluate_invalid(population)
        population = select(population, mu_)
        hof.update(population)
        record = nsga.compile_statistics(population, objectives)
        logbook.append({"gen": min_generation, "nevals": len(population),
                        **record})
        if verbose and self.comm.rank == 0:
            self._print_record(logbook[-1], objectives)

        count = 0
        level_offset = 0
        for gen in range(min_generation + 1, generations + 1):
            if count >= generalization_interval:
                # generalization: grow the problem, re-evaluate everything
                level_offset += 1
                count = 0
                if self.problem_factory is not None:
                    self._generalize(min_level + level_offset,
                                     max_level + level_offset)
                    hof.clear()
                    for ind in population:
                        ind.fitness.invalidate()
                    self.evaluate_invalid(population)
                    population = select(population, mu_)
                    hof.update(population)

            if use_random_search:
                offspring = [toolbox_generate() for _ in range(lambda_)]
            else:
                n_parents = lambda_ + (lambda_ % 2)
                parents = [ind.clone()
                           for ind in select_for_mating(population, n_parents)]
                offspring = []
                for ind1, ind2 in zip(parents[::2], parents[1::2]):
                    child1 = child2 = None
                    tries = 0
                    while tries < 10 and (
                            child1 is None or len(child1) > 150
                            or self.individual_in_cache(child1)
                            or child2 is None or len(child2) > 150
                            or self.individual_in_cache(child2)):
                        choice = self.rng.random()
                        c1, c2 = ind1.clone(), ind2.clone()
                        if choice < crossover_probability:
                            child1, child2 = gp.cxOnePoint(c1, c2, rng=self.rng)
                        elif choice < crossover_probability + \
                                mutation_probability + 1e-9:
                            (child1,) = mutate(c1)
                            (child2,) = mutate(c2)
                        else:
                            child1, child2 = c1, c2
                        tries += 1
                    child1.fitness.invalidate()
                    child2.fitness.invalidate()
                    offspring.append(child1)
                    if len(offspring) < lambda_:
                        offspring.append(child2)
                    if len(offspring) >= lambda_:
                        break

            nevals = self.evaluate_invalid(offspring)
            hof.update(offspring)

            if gen % checkpoint_frequency == 0:
                self._save_checkpoint(min_level, max_level, gen,
                                      solver_expression, population, logbooks)

            population = select(population + offspring, mu_)
            count += 1
            record = nsga.compile_statistics(population, objectives)
            logbook.append({"gen": gen, "nevals": nevals, **record})
            if verbose and self.comm.rank == 0:
                self._print_record(logbook[-1], objectives)

        hof.update(population)
        return population, logbook, hof, min_level + level_offset, \
            max_level + level_offset

    @staticmethod
    def _print_record(record, objectives):
        parts = [f"gen={record['gen']}", f"nevals={record['nevals']}"]
        for name in list(objectives) + ["size"]:
            s = record[name]
            parts.append(f"{name}[avg={s['avg']:.3g} min={s['min']:.3g}]")
        print("  ".join(parts), flush=True)

    def _save_checkpoint(self, min_level, max_level, gen, solver_expression,
                         population, logbooks):
        if self.comm.rank != 0:     # rank-0-only I/O (reference :278-279)
            return
        try:
            os.makedirs(self.checkpoint_directory_path, exist_ok=True)
            cp = CheckPoint(min_level, max_level, gen, solver_expression,
                            population, logbooks)
            cp.dump_to_file(
                os.path.join(self.checkpoint_directory_path, "checkpoint.p"))
        except (pickle.PickleError, TypeError, OSError) as e:
            print(f"checkpoint failed: {e}", flush=True)

    def _generalize(self, new_min_level, new_max_level):
        problem = self.problem_factory(new_min_level, new_max_level)
        self.problem = problem
        self.evaluator = CycleEvaluator(
            problem, dtype=self.evaluator.dtype,
            max_iterations=self.evaluator.max_iterations,
            target_reduction=self.evaluator.target_reduction)
        self.individual_cache.clear()

    # -- algorithm frontends -------------------------------------------------

    def SOGP(self, **kwargs):
        self._n_objectives = 1
        return self._run(select=gp.select_unique_best,
                         select_for_mating=lambda pop, k: nsga.selTournament(
                             pop, k, tournsize=2, rng=self.rng),
                         objectives=["time_to_convergence"], **kwargs)

    def NSGAII(self, **kwargs):
        self._n_objectives = 2

        def select_for_mating(pop, k):
            if k % 4:
                k += 4 - k % 4
            return nsga.selTournamentDCD(pop, k, rng=self.rng)

        return self._run(select=nsga.selNSGA2,
                         select_for_mating=select_for_mating,
                         objectives=["convergence_factor", "execution_time"],
                         pareto=True, **kwargs)

    def NSGAIII(self, **kwargs):
        self._n_objectives = 2
        mu_ = kwargs.get("mu_", 32)
        ref_points = nsga.uniform_reference_points(2, mu_)

        def select(pop, k):
            return nsga.selNSGA3(pop, k, ref_points)

        return self._run(select=select,
                         select_for_mating=lambda pop, k: nsga.selRandom(
                             pop, k, rng=self.rng),
                         objectives=["convergence_factor", "execution_time"],
                         pareto=True, **kwargs)

    def _run(self, *, select, select_for_mating, objectives, pareto=False,
             pset, initial_population_size, generations, mu_, lambda_,
             min_level, max_level, generalization_interval=10 ** 9,
             crossover_probability=0.7, mutation_probability=0.3,
             logbooks=None, checkpoint=None, checkpoint_frequency=2,
             use_random_search=False, solver_expression=None, verbose=True):
        self._pset = pset
        logbooks = logbooks if logbooks is not None else []
        hof = nsga.ParetoFront() if pareto else nsga.HallOfFame(2 * mu_)
        return self.ea_mu_plus_lambda(
            initial_population_size, generations, generalization_interval,
            mu_, lambda_, crossover_probability, mutation_probability,
            min_level, max_level, logbooks, select, select_for_mating, hof,
            objectives, checkpoint_frequency, checkpoint, use_random_search,
            solver_expression, verbose=verbose)

    # -- top-level entry -----------------------------------------------------

    def estimate_execution_time(self, convergence_factor, execution_time):
        if convergence_factor < 1:
            return math.log(self.epsilon) / math.log(convergence_factor) \
                * execution_time
        return convergence_factor * math.sqrt(self.infinity) * execution_time

    def evolutionary_optimization(self, *, mu_=32, lambda_=32,
                                  population_initialization_factor=4,
                                  generations=20,
                                  generalization_interval=10 ** 9,
                                  crossover_probability=0.7,
                                  mutation_probability=0.3,
                                  optimization_method=None,
                                  levels_per_run=None,
                                  maximum_local_system_size=8,
                                  enable_partitioning=True,
                                  continue_from_checkpoint=False,
                                  use_random_search=False,
                                  verbose=True):
        """Level-chunked evolution: coarser chunks first, each best cycle
        becoming the coarse-grid solver of the next finer chunk
        (reference optimization/program.py:770-902)."""
        problem = self.problem
        levels = problem.max_level - problem.min_level
        if levels_per_run is None:
            levels_per_run = levels
        contexts = problem.level_contexts

        checkpoint = None
        cp_path = os.path.join(self.checkpoint_directory_path, "checkpoint.p")
        if continue_from_checkpoint and os.path.isfile(cp_path):
            try:
                checkpoint = load_checkpoint_from_file(cp_path)
            except (pickle.PickleError, EOFError):
                checkpoint = None

        if optimization_method is None:
            optimization_method = self.NSGAII

        pops, logbooks, hofs = [], [], []
        best_expression = None
        best_individual = None
        coarse_solver_expression = None
        FAS = problem.nonlinear_term is not None

        for i in range(0, levels, levels_per_run):
            # chunk i covers grammar over contexts[i : i+levels_per_run]
            chunk_contexts = contexts[i:i + levels_per_run]
            max_level = problem.max_level - i
            min_level = max_level - len(chunk_contexts)
            if i == 0:
                approximation = problem.approximation
                rhs = problem.rhs_entity
            else:
                approximation = system.ZeroApproximation(
                    chunk_contexts[0].grid)
                rhs = system.RightHandSide(
                    "b_c", [base.RightHandSide("b_c", g)
                            for g in chunk_contexts[0].grid])
            coarsest_op = (contexts[i + levels_per_run].operator
                           if i + levels_per_run < len(contexts)
                           else problem.coarsest_operator)
            pset, _ = generate_primitive_set(
                approximation, rhs, chunk_contexts, coarsest_op,
                maximum_local_system_size=maximum_local_system_size,
                coarse_grid_solver_expression=coarse_solver_expression,
                enable_partitioning=enable_partitioning, FAS=FAS)
            self.individual_cache.clear()

            # robustness variants share the grammar shape; only supported
            # when one run spans the full hierarchy (variant trees re-parse
            # against the variant's own operator entities)
            self._robustness = []
            if self.robustness_problems and levels_per_run >= levels:
                for variant in self.robustness_problems:
                    pset_v, _ = generate_primitive_set(
                        variant.approximation, variant.rhs_entity,
                        variant.level_contexts, variant.coarsest_operator,
                        maximum_local_system_size=maximum_local_system_size,
                        enable_partitioning=enable_partitioning, FAS=FAS)
                    self._robustness.append((CycleEvaluator(variant), pset_v))

            tmp = None
            if checkpoint is not None and \
                    checkpoint.min_level == min_level and \
                    checkpoint.max_level == max_level:
                tmp = checkpoint

            pop, log, hof, _, _ = optimization_method(
                pset=pset,
                initial_population_size=population_initialization_factor * mu_,
                generations=generations, mu_=mu_, lambda_=lambda_,
                min_level=min_level, max_level=max_level,
                generalization_interval=generalization_interval,
                crossover_probability=crossover_probability,
                mutation_probability=mutation_probability,
                logbooks=logbooks, checkpoint=tmp,
                use_random_search=use_random_search,
                solver_expression=best_expression, verbose=verbose)

            def sort_key(ind):
                v = ind.fitness.values
                if len(v) == 2:
                    return self.estimate_execution_time(v[0], v[1])
                return v[0]

            ranked = sorted(hof, key=sort_key)
            pops.append(pop)
            hofs.append(hof)
            best_individual = ranked[0]
            state = gp.compile_tree(best_individual, self._pset)
            best_expression = state[0]
            transformations.assign_cycle_ids(best_expression)
            if i + levels_per_run < levels:
                coarse_solver_expression = make_cycle_applier(
                    best_expression, approximation, rhs)

        return {"best_individual": best_individual,
                "best_expression": best_expression,
                "grammar_string": str(best_individual),
                "populations": pops, "logbooks": logbooks, "hofs": hofs}

    # -- re-evaluation of stored individuals ---------------------------------

    def generate_and_evaluate_program_from_grammar_representation(
            self, grammar_string: str, maximum_local_system_size=8,
            enable_partitioning=True):
        """Rebuild an individual from its tree string and re-measure it
        (reference optimization/program.py:904-929)."""
        problem = self.problem
        pset, _ = generate_primitive_set(
            problem.approximation, problem.rhs_entity,
            problem.level_contexts, problem.coarsest_operator,
            maximum_local_system_size=maximum_local_system_size,
            enable_partitioning=enable_partitioning,
            FAS=problem.nonlinear_term is not None)
        individual = gp.parse_tree(grammar_string, pset)
        state = gp.compile_tree(individual, pset)
        expression = state[0]
        transformations.assign_cycle_ids(expression)
        result = self.evaluator.evaluate_expression(
            expression, key=grammar_string)
        return expression, result
