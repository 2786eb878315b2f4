"""Roofline accounting for the estimator's hot kernels.

The reference ships no performance model at all (SURVEY.md section 6); the
north-star asks each hot kernel to run near speed-of-light on its bounding
resource. This module makes that claim *checkable*: for each hot stage it
derives the analytic FLOP and HBM-byte counts from the problem shape, takes
the hardware's peak vector FLOP/s and HBM bandwidth, and turns a measured
wall time into "fraction of the roofline bound".

The estimator's hot loops are all either VPU-bound elementwise stages over
virtual O(N^2)/O(K*N) score fields (compat degrees, hypothesis scoring) or
small-tensor stages whose cost is layout, not FLOPs (pool, 3-pt solve), so
the relevant rooflines are the vector unit and HBM — the MXU matters for
the feature/matching GEMMs, which XLA already saturates.

Peaks default to TPU v5e (the bench chip): they are intentionally
overridable because roofline fractions are only meaningful against the
chip actually measured.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

from saccot_tpu.utils.params import SacCotParams


@dataclasses.dataclass(frozen=True)
class ChipPeaks:
    """Per-chip peak rates. Defaults: TPU v5e (public spec)."""

    # Peak dense bf16 MXU throughput, FLOP/s.
    mxu_bf16_flops: float = 394e12
    # f32 vector-unit throughput, FLOP/s (8x128 VPU lanes).
    vpu_f32_flops: float = 0.9e12
    # HBM bandwidth, bytes/s.
    hbm_bytes_per_s: float = 819e9


# Analytic per-element costs of the fused score evaluation, counted from
# kernels/compat.py / engine/compat.score_block: 2x 3-coordinate squared
# distance (9 FLOPs each incl. the subtract), 2 sqrt (counted as 1 each),
# |dp-dq|, threshold tests, the affine score, 2 mask multiplies, and the
# row-sum add — ~25 f32 ops per (i, j) entry.
FLOPS_PER_COMPAT_ENTRY = 25.0
# Scoring (kernels/score.py): transform p (15), residual to q (9), sqrt
# (1), threshold+mask+accumulate (3) — ~28 ops per (hypothesis, point).
FLOPS_PER_SCORE_ENTRY = 28.0


def compat_degrees_model(n: int, batch: int = 1) -> Dict[str, float]:
    """FLOPs and minimum HBM traffic for one batched degree computation.

    Traffic is O(N) per pair: points in, degrees out — nothing quadratic
    (that is the point of the fused kernel).
    """
    return {
        "flops": FLOPS_PER_COMPAT_ENTRY * batch * n * n,
        "bytes": batch * (2 * n * 3 + n) * 4.0,
    }


def scoring_model(n: int, k: int, batch: int = 1) -> Dict[str, float]:
    """FLOPs / HBM bytes for hypothesis scoring: K transforms x N points."""
    return {
        "flops": FLOPS_PER_SCORE_ENTRY * batch * k * n,
        "bytes": batch * (2 * n * 3 + k * 12 + k) * 4.0,
    }


def roofline_fraction(
    model: Dict[str, float],
    measured_seconds: float,
    peaks: ChipPeaks = ChipPeaks(),
) -> Dict[str, float]:
    """Compare a measured stage time against its compute/memory bounds.

    Returns the two bound times, which resource binds, and the achieved
    fraction of that bound (1.0 = speed of light; >1 means the analytic
    model undercounts, e.g. fusion did better than the model's traffic).
    """
    t_compute = model["flops"] / peaks.vpu_f32_flops
    t_memory = model["bytes"] / peaks.hbm_bytes_per_s
    bound = max(t_compute, t_memory)
    return {
        "compute_bound_s": t_compute,
        "memory_bound_s": t_memory,
        "binding": "compute" if t_compute >= t_memory else "memory",
        "fraction_of_peak": bound / max(measured_seconds, 1e-12),
        "measured_s": measured_seconds,
    }


def estimator_flop_count(n: int, params: SacCotParams, batch: int = 1) -> float:
    """Total analytic FLOPs of one estimator invocation (hot stages only).

    Used by the bench harness to report an aggregate achieved-FLOP/s figure
    next to pairs/sec. Pool/solve stages are small-tensor layout work and
    contribute O(K) FLOPs — included for completeness, negligible.
    """
    k = params.max_hypotheses
    a = params.num_anchors
    flops = FLOPS_PER_COMPAT_ENTRY * n * n          # degrees
    flops += FLOPS_PER_COMPAT_ENTRY * a * n * 2.0   # anchor rows + pool scores
    flops += 250.0 * k                               # Horn solve per hypothesis
    flops += FLOPS_PER_SCORE_ENTRY * k * n          # scoring
    flops += FLOPS_PER_SCORE_ENTRY * n * (params.refine_iters + 1)
    return batch * flops
