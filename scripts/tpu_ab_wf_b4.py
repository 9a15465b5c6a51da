"""Device A/B: 3D wavefront down-leg at B=2 vs B=4 planes per step
(255^3 V(2,1); VERDICT r4 next-step #4 'amortize the 130 per-grid-step
overheads' lever).  Uses the proven slope-fit protocol of tpu_ab_r4.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_ab_wf_b4.py
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from tpu_ab_r4 import bench_cycle   # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[ab-b4] device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    from evostencils_tpu.config import config
    from evostencils_tpu.problems.poisson import poisson_3d
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.ir import partitioning as part

    def cyc(problem):
        return v_cycle(problem.level_contexts, problem.rhs_entity,
                       pre_smoothing=2, post_smoothing=1, omega=1.15,
                       partitioning=part.RedBlack,
                       coarse_operator=problem.coarsest_operator)

    results = {}
    for block in (2, 4):
        config.wavefront_downleg_block = block
        problem = poisson_3d(max_level=8, min_level=2)
        problem.dtype = np.float32
        try:
            ms, chk = bench_cycle(problem, cyc(problem))
        except Exception as e:
            print(f"[ab-b4] B={block}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        results[block] = (ms, chk)
        print(f"[ab-b4] B={block}: {ms:.3f} ms/cycle "
              f"({16.58e6 / ms / 1e6:.2f}e9 DoF/s) checksum {chk:.6e}",
              flush=True)
    config.wavefront_downleg_block = None
    if len(results) == 2:
        (m2, c2), (m4, c4) = results[2], results[4]
        print(f"[ab-b4] speedup B=4 vs B=2: {m2 / m4:.3f}x; checksum rel "
              f"diff {abs(c4 - c2) / max(abs(c2), 1e-30):.2e}", flush=True)


if __name__ == "__main__":
    main()
