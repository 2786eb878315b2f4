"""Pallas TPU kernel: fused hypothesis x correspondence scoring (hot loop #3).

Replaces the reference's per-hypothesis inlier-count loop (`countInliers`,
SURVEY.md section 2.1) with a single fused kernel: each (hypothesis-tile,
point-tile) step applies all TK rigid transforms to all TC points via
broadcast FMAs on the VPU, thresholds, and accumulates both the inlier
count and the soft MSAC weight on-chip. The [K, N] score field and the
[K, N, 3] transformed-point tensor are never materialized in HBM.

Layouts: rotations are passed as [9, K] (row-major R entries, lane dim =
hypotheses), translations [3, K], points coordinate-major [3, N]. Output
blocks [2, TK] (count row, weight row) stay resident across the point-tile
sweep; a psum epilogue handles correspondence-axis sharding.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_K = 1024
TILE_N = 1024


def _score_kernel(
    r_ref,    # VMEM [9, TK] rotation entries (row-major)
    t_ref,    # VMEM [3, TK]
    p_ref,    # VMEM [3, TN] source points
    q_ref,    # VMEM [3, TN] target points (masked columns pushed to 1e15)
    out_ref,  # VMEM [2, TK]: row 0 = counts, row 1 = weights
    *,
    tau: float,
    need_weights: bool,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # The correspondence mask is folded into q by the wrapper: invalid
    # columns sit at 1e15, so their residual is ~1e30 — far past any tau —
    # and they contribute exactly 0 to counts and weights without a
    # per-entry mask multiply (or the mask input stream) in this kernel.
    # NOTE: an MXU formulation of the rotation application ([3,TK]x[3,TN]
    # dot_generals) was measured ~13% SLOWER end-to-end — contraction depth
    # 3 wastes the systolic array and HIGHEST precision multiplies passes.
    # Broadcast FMAs on the VPU are the right shape for this stage.
    #
    # Layout (r5): the score field is [TN (sublanes), TK (lanes)] — the
    # per-hypothesis scalars r/t arrive lane-major ([9|3, TK]) and
    # broadcast along sublanes with NO relayout; only the 6 point
    # coordinate rows need a lane->sublane transpose per N block. The
    # previous [TK, TN] orientation transposed all 12 hypothesis rows per
    # K tile instead: 2.57 -> 2.08 ms standalone at the bench shape, with
    # large (1024, 1024) tiles (shape sweep, r5).
    d2 = None
    for c in range(3):
        # x'_c = R[c,0] px + R[c,1] py + R[c,2] pz + t_c - q_c, all [TN, TK]
        acc = t_ref[c, :][None, :] - q_ref[c, :][:, None]
        for cc in range(3):
            acc += r_ref[3 * c + cc, :][None, :] * p_ref[cc, :][:, None]
        d2 = acc * acc if d2 is None else d2 + acc * acc

    inl = jnp.where((d2 < tau * tau), 1.0, 0.0)
    out_ref[0, :] += jnp.sum(inl, axis=0)
    if need_weights:
        # Soft MSAC weights need the sqrt; skipped entirely in count mode
        # (row 1 is zero-initialized at j == 0 and left untouched).
        d = jnp.sqrt(d2)
        wgt = jnp.maximum(0.0, 1.0 - d * (1.0 / tau))
        out_ref[1, :] += jnp.sum(wgt, axis=0)


def score_hypotheses_pallas(
    R: jnp.ndarray,
    t: jnp.ndarray,
    P: jnp.ndarray,
    Q: jnp.ndarray,
    tau: float,
    mask: Optional[jnp.ndarray] = None,
    mode: str = "count",
    axis_name: Optional[str] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for engine.score.score_hypotheses (AoS R/t)."""
    K = R.shape[0]
    return score_hypotheses_pallas_soa(
        R.astype(jnp.float32).reshape(K, 9).T, t.astype(jnp.float32).T,
        P, Q, tau, mask=mask, mode=mode, axis_name=axis_name,
        interpret=interpret,
    )


def score_hypotheses_pallas_soa(
    r9: jnp.ndarray,
    t3: jnp.ndarray,
    P: jnp.ndarray,
    Q: jnp.ndarray,
    tau: float,
    mask: Optional[jnp.ndarray] = None,
    mode: str = "count",
    axis_name: Optional[str] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SoA entry: rotations [9, K] row-major, translations [3, K] — the
    solve kernel's native output layout (kernels/solve3.solve3_pallas_soa),
    so the solve->score pair composes with no [K, 9] relayout."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    K = r9.shape[1]
    N = P.shape[0]
    tk = min(TILE_K, max(128, -(-K // 128) * 128))
    tn = min(TILE_N, max(128, -(-N // 128) * 128))
    Kp = -(-K // tk) * tk
    Np = -(-N // tn) * tn

    def padx(x, n, axis, value=0.0):
        pad = n - x.shape[axis]
        if pad <= 0:
            return x
        w = [(0, 0)] * x.ndim
        w[axis] = (0, pad)
        return jnp.pad(x, w, constant_values=value)

    m = jnp.ones((N,), jnp.float32) if mask is None else mask.astype(jnp.float32)
    r9 = padx(r9.astype(jnp.float32), Kp, 1)                  # [9, Kp]
    t3 = padx(t3.astype(jnp.float32), Kp, 1)                  # [3, Kp]
    pT = padx(P.astype(jnp.float32).T, Np, 1)
    # Mask folded into q (see kernel docstring): invalid correspondences'
    # targets move to 1e15; column padding (constant 1e15) covers Np > N.
    qT = jnp.where(m[None, :] > 0, Q.astype(jnp.float32).T, 1e15)
    qT = padx(qT, Np, 1, value=1e15)

    grid = (Kp // tk, Np // tn)
    out = pl.pallas_call(
        functools.partial(
            _score_kernel, tau=float(tau), need_weights=(mode == "weighted")
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, tk), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tk), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tk), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, Kp), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=40 * Kp * Np, bytes_accessed=(Kp + Np) * 48, transcendentals=0
        ),
    )(r9, t3, pT, qT)

    counts = out[0, :K]
    weights = out[1, :K]
    if axis_name is not None:
        counts = lax.psum(counts, axis_name)
        weights = lax.psum(weights, axis_name)
    scores = weights if mode == "weighted" else counts
    return scores.astype(jnp.float32), counts.astype(jnp.int32)
