"""Pallas TPU kernel: fused rigidity-compatibility degrees (hot loop #1).

The reference's O(N^2) compatibility-graph build (SURVEY.md section 2.1) is,
in this framework, never a materialized matrix — only its row sums
(weighted degrees) are consumed (engine/compat.py). This kernel fuses the
whole row-block computation on-chip: both distance evaluations, the
rigidity test, the score, masking, and the row reduction happen in VMEM
tile by tile; HBM traffic is O(N) points in, O(N) degrees out, nothing
quadratic ever leaves the chip.

Three kernels share the contract (the wrapper routes):

  _degree_kernel          — direct (a-b)^2 VPU form (r1-r4 default; kept as
                            the parity reference and `mxu=False` path).
  _degree_kernel_mxu      — r5 default: the distance multiply-accumulates
                            ride the MXU as exact split-bf16 Gram dots with
                            centered coordinates; ~1.7x at N=50k.
  _degree_kernel_mxu_tri  — symmetric full-matrix case (rows == cols): the
                            strictly-upper triangle is evaluated once with
                            row+col sums accumulated in a whole-row VMEM
                            scratch and sub-diagonal blocks skipped;
                            another ~1.5x at N=50k (42.0 -> 18.9 ms/pair
                            across the r5 compat work).

Grid: (row_tiles, col_tiles), col innermost; the [1, TR] output block stays
resident across the column sweep and accumulates (the tri kernel instead
carries the scratch accumulator across the whole grid).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from saccot_tpu.utils.params import SacCotParams

TILE_R = 256
TILE_C = 512
# MXU-Gram kernel tiles: matrix rows = wide resident lane dim, columns
# stream. (2048, 1024) measured fastest in the r5 sweep at N=50k (22.8 ms
# vs 25-28 for narrower row blocks; VMEM fails above [1024, 2048] f32 G
# blocks) while keeping pad waste small at both the 50k and 1k operating
# points (scripts/exp_compat_ops.py).
TR_MXU = 2048
TC_MXU = 1024


def _degree_kernel(
    rowoff_ref,  # SMEM [1, 1] int32: global index of row 0
    pr_ref,      # VMEM [3, TR] row-block source points (coord-major)
    qr_ref,      # VMEM [3, TR] row-block target points
    mr_ref,      # VMEM [1, TR] row mask
    pc_ref,      # VMEM [3, TC] col-block source points
    qc_ref,      # VMEM [3, TC] col-block target points
    mc_ref,      # VMEM [1, TC] col mask
    out_ref,     # VMEM [1, TR] accumulated degrees
    *,
    compat_tau: float,
    min_sep: float,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def d2(a_ref, b_ref):
        acc = None
        for c in range(3):
            diff = a_ref[c, :][:, None] - b_ref[c, :][None, :]  # [TR, TC]
            acc = diff * diff if acc is None else acc + diff * diff
        return acc

    dp = jnp.sqrt(d2(pr_ref, pc_ref))
    dq = jnp.sqrt(d2(qr_ref, qc_ref))
    delta = jnp.abs(dp - dq)
    ok = (delta < compat_tau) & (dp > min_sep) & (dq > min_sep)

    tr = out_ref.shape[1]
    tc = dp.shape[1]
    row_ids = rowoff_ref[0, 0] + i * tr + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 0)
    col_ids = j * tc + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 1)
    ok &= row_ids != col_ids

    s = jnp.where(ok, 1.0 - delta * (1.0 / compat_tau), 0.0)
    s = s * mr_ref[0, :][:, None] * mc_ref[0, :][None, :]
    out_ref[:] += jnp.sum(s, axis=1)[None, :]


def _degree_kernel_mxu(
    rowoff_ref,  # SMEM [1, 1] int32: global index of row 0
    rf_ref,      # VMEM [64, TR] bf16 row features (see _gram_features)
    nr_ref,      # VMEM [2, TR] f32 row squared norms (row 0 = P, row 1 = Q)
    mr_ref,      # VMEM [1, TR] row mask
    cf_ref,      # VMEM [64, TC] bf16 col features
    nc_ref,      # VMEM [2, TC] f32 col squared norms
    mc_ref,      # VMEM [1, TC] col mask
    out_ref,     # VMEM [1, TR] accumulated degrees
    *,
    compat_tau: float,
    min_sep: float,
    self_test: bool,
    has_mask: bool,
):
    """MXU-Gram variant of `_degree_kernel` (VERDICT r4 next #2).

    The VPU kernel's per-entry cost is dominated by the two 3-coordinate
    squared-distance evaluations (3 sub + 3 fma per cloud). Here those
    multiply-accumulates ride the MXU instead: dp^2 = |p_i|^2 + |p_j|^2
    - 2 p_i.p_j with the Gram blocks computed by ONE single-pass bf16
    dot_general per cloud over exactly-3-way-bf16-split coordinates
    (kernels/solve3._split3_f32's trick applied to a general product: the
    contraction enumerates all 9 part-pair products, so each partial
    product is exact in bf16xbf16->f32 and the result matches an f32 Gram
    to accumulation rounding). The VPU keeps only the O(1)-per-entry tail:
    two sqrts, the rigidity threshold, the affine score, and the row-sum —
    ~9 ops/entry vs ~25 for the direct form.

    Orientation receipts (r5, N=50k on v5e): per-step dot shapes bind the
    stage via MXU issue latency, not MAC count — at the original
    (TR=256, TC=512) tiles the two depth-32 dots alone cost 25.3 ms of the
    35.7 ms kernel. Streaming the COLUMN features through a wide resident
    row block ([TC, 32] x [32, TR] with TR up to 4096) amortizes that to
    ~12 ms and the full kernel to ~23 ms vs 39.4 ms for the direct VPU
    form (scripts/exp_compat_ops.py). G is therefore computed transposed:
    [TC, TR], lane dim = matrix rows, accumulated over axis 0.

    self_test=False drops the explicit i != j iota test: with min_sep > 0
    and centered coordinates (the wrapper subtracts the row centroid) the
    Gram cancellation noise on the self distance is ~|p|*7e-4 << min_sep,
    so the separation gate already excludes self-pairs. has_mask=False
    drops the two mask multiplies for unmasked calls. Together the two
    flags are worth ~4.5 ms at N=50k.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dn = (((0,), (0,)), ((), ()))
    Gp = jax.lax.dot_general(
        cf_ref[0:32, :], rf_ref[0:32, :], dn,
        preferred_element_type=jnp.float32,
    )  # [TC, TR]
    Gq = jax.lax.dot_general(
        cf_ref[32:64, :], rf_ref[32:64, :], dn,
        preferred_element_type=jnp.float32,
    )
    dp2 = nc_ref[0, :][:, None] + nr_ref[0, :][None, :] - 2.0 * Gp
    dq2 = nc_ref[1, :][:, None] + nr_ref[1, :][None, :] - 2.0 * Gq
    dp = jnp.sqrt(jnp.maximum(dp2, 0.0))
    dq = jnp.sqrt(jnp.maximum(dq2, 0.0))
    delta = jnp.abs(dp - dq)
    # max(0, 1 - delta/tau) folds the delta < tau test into the score.
    s = jnp.maximum(1.0 - delta * (1.0 / compat_tau), 0.0)
    ok = jnp.minimum(dp, dq) > min_sep

    tr = out_ref.shape[1]
    tc = dp2.shape[0]
    if self_test:
        row_ids = rowoff_ref[0, 0] + i * tr + jax.lax.broadcasted_iota(
            jnp.int32, (tc, tr), 1)
        col_ids = j * tc + jax.lax.broadcasted_iota(jnp.int32, (tc, tr), 0)
        ok &= row_ids != col_ids

    s = jnp.where(ok, s, 0.0)
    if has_mask:
        s = s * (mc_ref[0, :][:, None] * mr_ref[0, :][None, :])
    out_ref[:] += jnp.sum(s, axis=0)[None, :]


def _degree_kernel_mxu_tri(
    rf_ref,      # VMEM [64, TR] bf16 row features, block i
    nr_ref,      # VMEM [2, TR] f32 row squared norms
    mr_ref,      # VMEM [1, TR] row mask
    cf_ref,      # VMEM [64, TC] bf16 col features, block j
    nc_ref,      # VMEM [2, TC] f32 col squared norms
    mc_ref,      # VMEM [1, TC] col mask
    out_ref,     # VMEM [1, Np] final degrees (whole row, resident)
    acc_ref,     # VMEM scratch [1, Np] f32 accumulator
    *,
    compat_tau: float,
    min_sep: float,
    has_mask: bool,
    tr: int,
    tc: int,
):
    """Upper-triangle variant of `_degree_kernel_mxu` for the symmetric
    full-matrix case (rows == cols): S_ij is a symmetric function of the
    unordered pair, so each strictly-upper entry is computed ONCE and
    contributes its score to BOTH endpoints' degrees — the row-block sums
    accumulate at the row range and the column-block sums at the column
    range of a whole-row VMEM scratch (Np f32 = 200 KB at N=50k). Blocks
    entirely below the diagonal are skipped (`pl.when`), halving both the
    Gram dots and the VPU tail at multi-block N; the strict j > i in-block
    mask also subsumes the self-pair test. Single-block shapes gain
    nothing (every entry still evaluated), so the wrapper routes here only
    when the grid has enough blocks to win.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    row0 = i * tr
    col0 = j * tc

    # Any needed entry in this block? (strictly-upper: col > row)
    @pl.when(col0 + tc - 1 > row0)
    def _():
        dn = (((0,), (0,)), ((), ()))
        Gp = jax.lax.dot_general(
            cf_ref[0:32, :], rf_ref[0:32, :], dn,
            preferred_element_type=jnp.float32,
        )  # [TC, TR]
        Gq = jax.lax.dot_general(
            cf_ref[32:64, :], rf_ref[32:64, :], dn,
            preferred_element_type=jnp.float32,
        )
        dp2 = nc_ref[0, :][:, None] + nr_ref[0, :][None, :] - 2.0 * Gp
        dq2 = nc_ref[1, :][:, None] + nr_ref[1, :][None, :] - 2.0 * Gq
        dp = jnp.sqrt(jnp.maximum(dp2, 0.0))
        dq = jnp.sqrt(jnp.maximum(dq2, 0.0))
        delta = jnp.abs(dp - dq)
        s = jnp.maximum(1.0 - delta * (1.0 / compat_tau), 0.0)
        ok = jnp.minimum(dp, dq) > min_sep
        # Strict upper triangle (also removes self-pairs exactly). 1-D
        # iotas + broadcast compare: 2-D int32 iota fields cost 8 MB each
        # of scoped VMEM at these tiles (measured OOM).
        ci = col0 + jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0)
        ri = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, tr), 1)
        ok &= ci > ri
        s = jnp.where(ok, s, 0.0)
        if has_mask:
            s = s * (mc_ref[0, :][:, None] * mr_ref[0, :][None, :])
        acc_ref[0, pl.ds(row0, tr)] += jnp.sum(s, axis=0)
        acc_ref[0, pl.ds(col0, tc)] += jnp.sum(s, axis=1)

    @pl.when((i == ni - 1) & (j == nj - 1))
    def _():
        out_ref[...] = acc_ref[...]


_PAD_SENTINEL = 1e15


def _gram_features(P: jnp.ndarray, Q: jnp.ndarray, n_pad: int,
                   center=(None, None), pad_scale: float = 1.0):
    """Split-bf16 Gram features + f32 norms for the MXU degree kernel.

    Returns (row_feat [64, n_pad] bf16, col_feat [64, n_pad] bf16,
    norms [2, n_pad] f32). The contraction index d = (u, v, c) enumerates
    part-pair (u, v) x coordinate c; row features carry part u (repeated
    over v), col features part v (tiled over u), so a single depth-27
    bf16 dot yields sum_{u,v} part_u . part_v = the exact f32 Gram.
    Rows 0-26 (padded to 32) are cloud P, rows 32-58 (padded to 64) Q.

    `center` (cp, cq) is subtracted before splitting: distances are
    translation-invariant, and keeping |coords| at the scene radius keeps
    the Gram's cancellation noise on tiny distances (self-pairs!) at
    ~|p| * 7e-4, far below any positive min_separation in scene units.

    Padded slots get coordinates (k * _PAD_SENTINEL,) * 3 with a DIFFERENT
    multiple k per (cloud, side) via `pad_scale`: the P/Q pad distances of
    any pair involving padding then differ by >= sqrt(3) * _PAD_SENTINEL,
    so |dp - dq| >> tau deterministically (both distances round exactly in
    f32 because real coordinates sit below the sentinel's ulp) and padded
    entries contribute exactly 0 degree without any mask multiply.
    """
    from saccot_tpu.kernels.solve3 import _split3_f32

    def feats(X, c, k):
        xT = X.astype(jnp.float32).T
        if c is not None:
            xT = xT - c[:, None]
        xT = _pad_to(xT, n_pad, 1, value=k * _PAD_SENTINEL)   # [3, n_pad]
        h, m, l = _split3_f32(xT)
        zeros = jnp.zeros((5, n_pad), jnp.float32)
        row = jnp.concatenate([h, h, h, m, m, m, l, l, l, zeros], axis=0)
        col = jnp.concatenate([h, m, l, h, m, l, h, m, l, zeros], axis=0)
        norm = jnp.sum(xT * xT, axis=0, keepdims=True)        # [1, n_pad]
        return row, col, norm

    pr, pc, pn = feats(P, center[0], pad_scale)
    qr, qc, qn = feats(Q, center[1], 2.0 * pad_scale)
    row_feat = jnp.concatenate([pr, qr], axis=0).astype(jnp.bfloat16)
    col_feat = jnp.concatenate([pc, qc], axis=0).astype(jnp.bfloat16)
    norms = jnp.concatenate([pn, qn], axis=0)
    return row_feat, col_feat, norms


def _pad_to(x: jnp.ndarray, n: int, axis: int, value=0.0) -> jnp.ndarray:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def degrees_pallas(
    P_rows: jnp.ndarray,
    Q_rows: jnp.ndarray,
    P_cols: jnp.ndarray,
    Q_cols: jnp.ndarray,
    params: SacCotParams,
    row_offset=0,
    mask_rows: Optional[jnp.ndarray] = None,
    mask_cols: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
    mxu: Optional[bool] = None,
) -> jnp.ndarray:
    """Drop-in replacement for engine.compat.degrees (same contract).

    Falls back to interpret mode automatically off-TPU so the CPU test mesh
    exercises the identical kernel logic.

    mxu selects the Gram-trick kernel (`_degree_kernel_mxu`): the two O(N^2)
    distance multiply-accumulates ride the MXU via split-bf16 exact Grams
    and the VPU keeps only the threshold/score tail. Default True — measured
    1.9x at N=50k and ~1.2x at N=1000 over the direct-form VPU kernel at
    equal recall (BASELINE.md r5 receipts); pass False for the direct form.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mxu is None:
        mxu = True

    R = P_rows.shape[0]
    C = P_cols.shape[0]
    tr = min(TILE_R, max(8, R))
    tc = min(TILE_C, max(128, C))
    Rp = -(-R // tr) * tr
    Cp = -(-C // tc) * tc

    mr = jnp.ones((R,), jnp.float32) if mask_rows is None else mask_rows.astype(jnp.float32)
    mc = jnp.ones((C,), jnp.float32) if mask_cols is None else mask_cols.astype(jnp.float32)

    rowoff = jnp.asarray(row_offset, jnp.int32).reshape(1, 1)

    # Symmetric full-matrix fast path: rows and cols are the SAME
    # correspondence set, so the strictly-upper triangle covers every
    # unordered pair once — ~2x fewer blocks at KITTI scale (see
    # _degree_kernel_mxu_tri). Only profitable with multiple row blocks.
    if (
        mxu
        and P_rows is P_cols
        and Q_rows is Q_cols
        and int(row_offset) == 0
        and (mask_rows is None) == (mask_cols is None)
        and (mask_rows is mask_cols)
        and R > TR_MXU
    ):
        tr_m = TR_MXU
        tc_m = TC_MXU
        Np_pad = -(-R // tr_m) * tr_m  # multiple of tc_m too (1024 | 2048)
        has_mask = mask_rows is not None
        ctr_p = jnp.mean(P_rows.astype(jnp.float32), axis=0)
        ctr_q = jnp.mean(Q_rows.astype(jnp.float32), axis=0)
        rf, cf, nr = _gram_features(P_rows, Q_rows, Np_pad, (ctr_p, ctr_q),
                                    pad_scale=1.0)
        mrp = _pad_to(mr[None, :], Np_pad, 1)
        grid = (Np_pad // tr_m, Np_pad // tc_m)
        out = pl.pallas_call(
            functools.partial(
                _degree_kernel_mxu_tri,
                compat_tau=float(params.compat_tau),
                min_sep=float(params.min_separation),
                has_mask=has_mask,
                tr=tr_m, tc=tc_m,
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((64, tr_m), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, tr_m), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tr_m), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((64, tc_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, tc_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tc_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Np_pad), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, Np_pad), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, Np_pad), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=(15 * Np_pad * Np_pad + 2 * 2 * 32 * 4 * Np_pad * Np_pad) // 2,
                bytes_accessed=Np_pad * 280,
                transcendentals=0,
            ),
        )(rf, nr, mrp, cf, nr, mrp)
        return out[0, :R]

    if mxu:
        # Matrix rows are the wide resident side (lane dim of the
        # transposed G), columns stream: see _degree_kernel_mxu receipts.
        tr_m = min(TR_MXU, -(-R // 128) * 128)
        tc_m = min(TC_MXU, -(-C // 128) * 128)
        Rp_m = -(-R // tr_m) * tr_m
        Cp_m = -(-C // tc_m) * tc_m
        has_mask = mask_rows is not None or mask_cols is not None
        # min_sep > 0 excludes self-pairs via the separation gate; the
        # explicit id test is only needed for min_sep == 0 (see kernel
        # docstring noise-floor argument; coordinates are centered below).
        self_test = float(params.min_separation) <= 0.0
        # One shared center for rows and cols (distances are invariant);
        # rows are the stable side across ring steps.
        ctr_p = jnp.mean(P_rows.astype(jnp.float32), axis=0)
        ctr_q = jnp.mean(Q_rows.astype(jnp.float32), axis=0)
        rf, _, nr = _gram_features(P_rows, Q_rows, Rp_m, (ctr_p, ctr_q),
                                   pad_scale=4.0)
        _, cf, nc = _gram_features(P_cols, Q_cols, Cp_m, (ctr_p, ctr_q),
                                   pad_scale=1.0)
        mrp = _pad_to(mr[None, :], Rp_m, 1)
        mcp = _pad_to(mc[None, :], Cp_m, 1)
        grid = (Rp_m // tr_m, Cp_m // tc_m)
        out = pl.pallas_call(
            functools.partial(
                _degree_kernel_mxu,
                compat_tau=float(params.compat_tau),
                min_sep=float(params.min_separation),
                self_test=self_test,
                has_mask=has_mask,
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((64, tr_m), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, tr_m), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tr_m), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((64, tc_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, tc_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tc_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tr_m), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, Rp_m), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=9 * Rp_m * Cp_m + 2 * 2 * 32 * Rp_m * Cp_m,
                bytes_accessed=(Rp_m + Cp_m) * 140,
                transcendentals=0,
            ),
        )(rowoff, rf, nr, mrp, cf, nc, mcp)
        return out[0, :R]

    grid = (Rp // tr, Cp // tc)
    mrp = _pad_to(mr[None, :], Rp, 1)
    mcp = _pad_to(mc[None, :], Cp, 1)
    # Coordinate-major layout + padding. Padded rows are masked to 0 degree;
    # padded cols get mask 0 so they contribute nothing.
    prT = _pad_to(P_rows.astype(jnp.float32).T, Rp, 1)
    qrT = _pad_to(Q_rows.astype(jnp.float32).T, Rp, 1)
    pcT = _pad_to(P_cols.astype(jnp.float32).T, Cp, 1)
    qcT = _pad_to(Q_cols.astype(jnp.float32).T, Cp, 1)
    out = pl.pallas_call(
        functools.partial(
            _degree_kernel,
            compat_tau=float(params.compat_tau),
            min_sep=float(params.min_separation),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, tr), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tr), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Rp), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=22 * Rp * Cp, bytes_accessed=(Rp + Cp) * 32, transcendentals=0
        ),
    )(rowoff, prT, qrT, mrp, pcT, qcT, mcp)
    return out[0, :R]
