"""A small evolution run with fitness MEASURED ON THE TPU — the
reference's entire point is measuring candidates on the target machine
(reference code_generation/exastencils.py:485-537); this demonstrates the
loop closing on hardware.

mu = lambda = 8, a few generations, 2D Poisson at 1023^2; per-generation
wall time and compile-amortization stats are printed, and the evolved
best is compared on-device against the reference V(2,1) baseline
(2D_FD_Poisson_fromL2.exa3 solver block).

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/evolve_on_device.py
"""

import pathlib
import random
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--generations", type=int, default=5)
    ap.add_argument("--resume", action="store_true",
                    help="continue from the checkpoint of a previous run "
                         "(fitness cache + rng + population restored)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[evolve] device: {jax.devices()[0]}", file=sys.stderr,
          flush=True)

    from evostencils_tpu.problems.poisson import poisson_2d
    from evostencils_tpu.optimization.program import Optimizer
    from evostencils_tpu.evaluation.evaluator import CycleEvaluator
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu.grammar import gp
    from evostencils_tpu.ir import transformations

    max_level, min_level = 10, 5        # 1023^2 fine grid
    problem = poisson_2d(max_level=max_level, min_level=min_level)
    problem.dtype = np.float32
    evaluator = CycleEvaluator(problem)
    opt = Optimizer(problem, evaluator=evaluator, rng=random.Random(42),
                    checkpoint_directory_path="/tmp/evolve_device_ckpt")

    gens = args.generations
    t_start = time.perf_counter()
    result = opt.evolutionary_optimization(
        mu_=8, lambda_=8, population_initialization_factor=2,
        generations=gens, continue_from_checkpoint=args.resume,
        verbose=True)
    wall = time.perf_counter() - t_start
    best = result["best_individual"]
    vals = best.fitness.values
    print(f"[evolve] {gens} generations in {wall:.1f}s wall, "
          f"{evaluator.compilations} structures compiled "
          f"({wall / max(evaluator.compilations, 1):.1f}s/structure "
          f"amortized)", flush=True)
    print(f"[evolve] best fitness (rho, ms/it): {vals}", flush=True)
    print(f"[evolve] best grammar: {str(best)[:400]}", flush=True)

    # --- reference baseline, measured the same way ------------------------
    ref_cycle = v_cycle(problem.level_contexts, problem.rhs_entity,
                        pre_smoothing=2, post_smoothing=1, omega=1.15,
                        partitioning=part.RedBlack,
                        coarse_operator=problem.coarsest_operator)
    transformations.assign_cycle_ids(ref_cycle)
    ref = evaluator.evaluate_expression(ref_cycle, key="__reference__")
    print(f"[evolve] reference V(2,1) RB 1.15: "
          f"t_conv={ref.time_to_convergence_ms:.3f} ms "
          f"rho={ref.convergence_factor:.4f} it={ref.iterations}",
          flush=True)

    # evolved best re-measured (evaluate_expression path, same protocol)
    state = gp.compile_tree(best, opt._pset)
    expr = state[0]
    transformations.assign_cycle_ids(expr)
    ev = evaluator.evaluate_expression(expr, key=str(best))
    print(f"[evolve] evolved best:              "
          f"t_conv={ev.time_to_convergence_ms:.3f} ms "
          f"rho={ev.convergence_factor:.4f} it={ev.iterations}",
          flush=True)
    verdict = ("BEATS" if ev.time_to_convergence_ms
               < ref.time_to_convergence_ms else "does NOT beat")
    print(f"[evolve] evolved best {verdict} the reference baseline "
          f"on-device ({ev.time_to_convergence_ms:.3f} vs "
          f"{ref.time_to_convergence_ms:.3f} ms to convergence)",
          flush=True)


if __name__ == "__main__":
    main()
