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
    """Per-chip peak rates. Defaults: TPU v5e (public spec).

    r5 recalibration: the r4 VPU value (2.0e12) produced fractions > 1
    once the compat/score kernels shed their relayout overhead — the
    measured sustained rates (~3.4-3.6e12 model-ops/s) are only coherent
    with the actual v5e clock (~1.7 GHz): VPU = 8x128 lanes x 1.7e9 x
    2-issue ~= 3.5e12, and the same clock pins the MXU at 197e12 bf16
    FLOP/s (4 MXUs x 128x128 x 2 x 1.7e9; the oft-quoted 394e12 is the
    INT8 figure). With these, the bench's compat/score stages measure
    0.9-1.0 of bound — i.e. those kernels are at the hardware ceiling —
    and the remaining <1 fractions (pool 0.43) are real headroom, not
    model artifacts.
    """

    # Peak dense bf16 MXU throughput, FLOP/s (v5e: 197 TFLOPs bf16).
    mxu_bf16_flops: float = 197e12
    # f32 vector-unit op throughput, ops/s, for the mixed op set the stage
    # models count (FMAs, compares, selects all as 1).
    vpu_f32_flops: float = 3.5e12
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


def compat_degrees_model(n: int, batch: int = 1, mxu: bool = True,
                         symmetric: bool = False) -> Dict[str, float]:
    """FLOPs and minimum HBM traffic for one batched degree computation.

    Traffic is O(N) per pair: points in, degrees out — nothing quadratic
    (that is the point of the fused kernel).

    mxu=True models the r5 Gram-trick kernel (`_degree_kernel_mxu`, the
    default): the distance multiply-accumulates ride the MXU as two
    depth-32 split-bf16 dots (mxu_flops below is inflated by 128/32 to
    account for the systolic array's depth underutilization — the reported
    MXU bound is achievable, not ideal-depth), and the VPU keeps a ~15
    model-op tail (4 d^2 ops, 2 sqrt at ~3 op-equivalents each, threshold,
    score, row-sum). Measured r5: the two bounds do NOT overlap in practice —
    in-kernel dots and the elementwise tail execute mostly serially
    (gram-only 12.9 ms + tail ~10 ms ~= full 23 ms at N=50k), so treat
    max() as a hard floor and the sum as the no-overlap expectation.
    """
    # symmetric=True models the upper-triangle kernel (r5,
    # `_degree_kernel_mxu_tri`): each unordered pair evaluated once.
    half = 0.5 if symmetric else 1.0
    if mxu:
        return {
            "flops": 15.0 * batch * n * n * half,
            "mxu_flops": batch * 2 * 2 * 32 * (128.0 / 32.0) * n * n * half,
            "bytes": batch * (2 * n * 64 * 2 + 2 * n * 2 * 4 + n * 4),
        }
    return {
        "flops": FLOPS_PER_COMPAT_ENTRY * batch * n * n * half,
        "bytes": batch * (2 * n * 3 + n) * 4.0,
    }


def scoring_model(n: int, k: int, batch: int = 1) -> Dict[str, float]:
    """FLOPs / HBM bytes for hypothesis scoring: K transforms x N points."""
    return {
        "flops": FLOPS_PER_SCORE_ENTRY * batch * k * n,
        "bytes": batch * (2 * n * 3 + k * 12 + k) * 4.0,
    }


def _pad128(n: int) -> int:
    return -(-int(n) // 128) * 128


def pool_model(
    n: int, a: int, b: int, t: int = 4, batch: int = 1
) -> Dict[str, float]:
    """Analytic cost of the fused triangle-pool kernel (VERDICT r3 weak #1).

    Per anchor tile the kernel executes, counted from
    kernels/triangles._anchor_topb_kernel:

      - row scoring over the [A, Np] block: same 22-op rigidity evaluation
        as compat (minus the row-sum; the self-pair test adds one compare);
      - B argmax sweeps, each a row-max (1 op/entry), a hit compare (1), a
        where+min index reduction (2), and the knockout select (1) -> ~5
        ops per entry per sweep — this is the selection cost the r3 receipt
        asserted was "bounded by VPU sweeps" without a number;
      - candidate scoring over the [B, B] grid per anchor (~25 ops/entry,
        as compat) plus T top-T sweeps (~5 ops/entry each);
      - `mxu_flops`: the one-hot coordinate-extraction dot_generals
        (2 clouds x 2*3*Np*B*A MAC-flops). Reported separately because it
        runs on the MXU; at production shapes it is far from the MXU
        throughput bound and its real cost is issue latency, which no
        roofline captures — treat its bound time as a lower bound only.

    HBM traffic is O(A + N) in and O(A*B) out (the [A, N] rows never leave
    the chip).
    """
    n_pad = _pad128(n)
    vpu = (22.0 + 5.0 * b) * a * n_pad + (25.0 + 5.0 * t) * a * b * b
    mxu = 12.0 * a * b * n_pad
    return {
        "flops": batch * vpu,
        "mxu_flops": batch * mxu,
        "bytes": batch * (2 * n * 3 + a * (2 * b + 2 * t)) * 4.0,
    }


def solve_model(n: int, k: int, batch: int = 1) -> Dict[str, float]:
    """Analytic cost of the fused 3-point solve (kernels/solve3.py).

    MXU: the one-hot gather contraction — the single-block kernel streams
    the exactly-3-way bf16-split coordinate array (18 rows per cloud-pair
    layout, `_solve3_single`'s s18 input) through ONE single-pass bf16 dot,
    so the MXU term is 1-pass (not the 6-pass Precision.HIGHEST model of
    r3) and the HBM input term is 18 rows x Np bf16 entries, 3x the naive
    6-row f32 count in bytes-per-coordinate but exact by construction.
    VPU: the 9-entry cross-covariance (~60 ops/hypothesis) plus the
    quaternion power iteration run in XLA (~250 ops/hypothesis,
    engine/svd3.py).
    """
    n_pad = _pad128(n)
    return {
        "flops": batch * (60.0 + 250.0) * k,
        "mxu_flops": batch * 36.0 * n_pad * k,
        # 18 bf16 rows x Np per pair of clouds (the split array) + [K, 21]
        # f32 out (9 cov + 12 transform).
        "bytes": batch * (18 * n_pad * 2.0 + 21 * k * 4.0),
    }


def stage_bound_seconds(
    model: Dict[str, float], peaks: "ChipPeaks" = None, highest: bool = False
) -> float:
    """Speed-of-light time for a stage model: max of its VPU-compute, HBM,
    and (when present) MXU bounds. `highest` divides the MXU peak by the
    multi-pass factor of Precision.HIGHEST f32 contractions."""
    peaks = peaks or ChipPeaks()
    t = max(
        model.get("flops", 0.0) / peaks.vpu_f32_flops,
        model.get("bytes", 0.0) / peaks.hbm_bytes_per_s,
    )
    mxu = model.get("mxu_flops", 0.0)
    if mxu:
        peak = peaks.mxu_bf16_flops / (6.0 if highest else 1.0)
        t = max(t, mxu / peak)
    return t


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
