"""A/B on device: split-complex Helmholtz 2047^2 V(2,1) RB 0.6 cycle,
generic vs sys9-leg-super-fused with Robin row-exception fixups
(ops/pallas/rbgs_sys.py exc/exc_minv).  Chained-state, window-subtracted.
Round-3 baseline to beat: 2.546 ms/cycle (unfused generic path with the
almost-uniform coefficient decomposition, BASELINE.md)."""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
# the sibling-module import below needs scripts/ itself on the path when
# run via ``python -m`` or from another cwd (round-3 advisor)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[0]))

from tpu_ab_var_sys import bench_cycle  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from evostencils_tpu import config as cfgmod
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu.problems.helmholtz import helmholtz_2d_split
    print("device:", jax.devices()[0], file=sys.stderr, flush=True)

    def case():
        p = helmholtz_2d_split(max_level=11, min_level=3)
        p.dtype = np.float32
        return p, lambda: v_cycle(
            p.level_contexts, p.rhs_entity, pre_smoothing=2,
            post_smoothing=1, omega=0.6, partitioning=part.RedBlack,
            coarse_operator=p.coarsest_operator), 2 * (2 ** 11 - 1) ** 2

    for pallas in (False, True):
        cfgmod.config.use_pallas_kernels = pallas
        p, cb, dof = case()
        ct, cs, comp = bench_cycle(p, cb)
        print(f"helmholtz2047 pallas={pallas}: {ct*1e3:.3f} ms/cycle "
              f"{dof/ct:.3e} DoF/s (compile {comp:.1f}s, "
              f"checksum {cs:.6e})", flush=True)


if __name__ == "__main__":
    main()
