"""Global framework configuration (single typed config layer replacing the
reference's knowledge/settings/platform file rewriting — SURVEY.md §5)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


def enable_persistent_compilation_cache(path: Optional[str] = None) -> None:
    """Turn on XLA's persistent compile cache (idempotent).

    Every distinct evolved cycle structure is a distinct XLA program;
    on TPU a cold compile costs tens of seconds, so the cache is the
    main lever on evolution-loop latency (SURVEY.md §7 'recompilation
    pressure').  Called automatically by CycleEvaluator."""
    import os
    import jax
    path = path or os.environ.get(
        "EVOSTENCILS_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    try:
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:
        pass


@dataclass
class Config:
    #: use Pallas TPU kernels for supported hot ops (None = auto: TPU only)
    use_pallas_kernels: Optional[bool] = None
    #: device mesh for the explicit shard_map/ppermute halo-exchange
    #: smoother pipeline (parallel/halo.py); None = single-device / GSPMD
    shard_map_mesh: Optional[object] = None
    #: per-axis grid size below which a level runs replicated instead of
    #: sharded under the halo pipeline
    shard_min_local_size: int = 16
    #: maximum unknowns for dense coarse-grid factorization
    direct_solve_max: int = 4096
    #: lower radius-1 separable transfers as strided-slice banded ops
    #: instead of dense per-axis contractions.  None = auto: banded off
    #: TPU (fewer FLOPs), dense on TPU — measured on v5e the stride-2
    #: lane relayouts run ~3x slower end-to-end than the MXU contraction
    #: despite the O(n_coarse) FLOP advantage, and interact badly with
    #: Pallas-produced operands (checksum divergence on the axon
    #: backend; correct in isolation and on CPU)
    banded_transfers: Optional[bool] = None
    #: lane-axis column-transfer strategy inside the fused 2D pipeline:
    #: None = auto ("matmul" on TPU, "banded" elsewhere); explicit values:
    #: "matmul" | "banded" | "conv" | "transpose" (see compiler/lower.py)
    column_transfers: Optional[str] = None
    #: fuse the column (lane-axis) transfers INTO the Pallas leg kernels
    #: (chunked MXU decimation / pltpu.repeat expansion,
    #: ops/pallas/transfer.py lane-transfer section) instead of separate
    #: dense banded GEMMs — removes ~0.39 ms/cycle of MXU work and halves
    #: the leg<->tail intermediate HBM traffic on the 4095^2 headline
    #: (BASELINE.md round-2 per-leg table).  None = auto (on)
    fused_column_transfers: Optional[bool] = None
    #: fuse the finest-level up-leg of cycle k with the down-leg of cycle
    #: k+1 inside solve loops (compiler/solve.make_cycle_loop).  Saves a
    #: full read-u/read-b/write-u round trip per iteration but raises
    #: in-kernel VMEM pressure; measured net-slower on v5e (2.04 vs
    #: 1.82 ms/cycle at 4095^2), so off by default — flip on where the
    #: HBM:VPU balance differs
    loop_fusion: bool = False
    #: combined red+black update form in the 2D Pallas sweep loops: one
    #: residual evaluation per full sweep plus a black-only neighbor
    #: correction — algebraically identical to the two masked half-sweeps
    #: for 5-point operators (ops/pallas/transfer._rb_sweep_loop); A/B
    #: flag for the masked-update-waste lever (round 4)
    combined_rb: bool = False
    #: 3D wavefront down-leg planes-per-step (None = kernel default 2;
    #: 4 halves the sequential grid-step count — A/B flag for the
    #: per-step-overhead lever, round 5)
    wavefront_downleg_block: Optional[int] = None
    #: nonlinear coarsest-grid solver sweeps (reference FAS template: 200)
    nonlinear_cgs_sweeps: int = 200
    nonlinear_cgs_omega: float = 0.8


config = Config()


def column_transfer_mode() -> str:
    if config.column_transfers is not None:
        return config.column_transfers
    return "banded" if banded_transfers_enabled() else "matmul"


def fused_cols_enabled() -> bool:
    if config.fused_column_transfers is not None:
        return config.fused_column_transfers
    return True


def banded_transfers_enabled() -> bool:
    if config.banded_transfers is not None:
        return config.banded_transfers
    import jax
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


def pallas_enabled() -> bool:
    if config.use_pallas_kernels is not None:
        return config.use_pallas_kernels
    import jax
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def pallas_interpret() -> bool:
    """Pallas kernels run in interpret mode off-TPU (so the fused lowering
    paths stay testable on the CPU mesh)."""
    import jax
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True
