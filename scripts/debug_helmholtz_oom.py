"""Bisect the split-complex Helmholtz VMEM OOM (suite 2026-08-21).

Compiles the shifted-Laplace split V(2,1) at a given size on the device,
optionally with Pallas kernels or loop fusion disabled, to locate the
construct whose XLA fusion blows the VMEM stack budget.
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-level", type=int, default=11)
    ap.add_argument("--min-level", type=int, default=3)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--step-only", action="store_true",
                    help="jit lowered.step instead of the K-cycle loop")
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[dbg] device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    from evostencils_tpu.problems.helmholtz import helmholtz_2d_split
    from evostencils_tpu.compiler.cycles import v_cycle
    from evostencils_tpu.compiler.lower import lower_cycle
    from evostencils_tpu.compiler.solve import make_cycle_loop
    from evostencils_tpu.ir import partitioning as part
    from evostencils_tpu.config import config as es_config

    if args.no_pallas:
        es_config.use_pallas_kernels = False

    p = helmholtz_2d_split(max_level=args.max_level,
                           min_level=args.min_level)
    p.dtype = np.float32
    cyc = v_cycle(p.level_contexts, p.rhs_entity, pre_smoothing=2,
                  post_smoothing=1, omega=0.6, partitioning=part.RedBlack,
                  coarse_operator=p.coarsest_operator)
    low = lower_cycle(cyc, p.approximation, p.rhs_entity)
    b = p.build_rhs()
    u0 = tuple(jnp.zeros_like(x) for x in b)
    om = jnp.asarray(low.default_omegas, jnp.float32)

    if args.step_only:
        fn = jax.jit(low.step)
    else:
        loop = make_cycle_loop(low, args.k)

        def probe(u, bf, o):
            out = loop(u, bf, o)
            return out[0].ravel()[0]
        fn = jax.jit(probe)

    t0 = time.perf_counter()
    out = fn(u0, b, om)
    leaf = out[0] if isinstance(out, tuple) else out
    val = float(np.asarray(jax.device_get(
        leaf if leaf.ndim == 0 else leaf.ravel()[0])))
    print(f"[dbg] L={args.max_level} pallas={not args.no_pallas} "
          f"step_only={args.step_only} OK "
          f"({time.perf_counter() - t0:.1f}s, probe={val:.3e})", flush=True)


if __name__ == "__main__":
    main()
