"""Pallas TPU kernel: fused rigidity-compatibility degrees (hot loop #1).

The reference's O(N^2) compatibility-graph build (SURVEY.md section 2.1) is,
in this framework, never a materialized matrix — only its row sums
(weighted degrees) are consumed (engine/compat.py). This kernel fuses the
whole row-block computation on-chip: both distance evaluations, the
rigidity test, the score, masking, and the row reduction happen in VMEM
tile by tile; HBM traffic is O(N) points in, O(N) degrees out, nothing
quadratic ever leaves the chip.

Layout: points are passed coordinate-major ([3, N], lane dim = points) so
column tiles hit the (8, 128) f32 tiling natively; distances use the direct
(a-b)^2 form on the VPU (better numerics than the Gram trick, and the
3-wide contraction would waste the MXU anyway).

Grid: (row_tiles, col_tiles), col innermost; the [1, TR] output block stays
resident across the column sweep and accumulates.
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
) -> jnp.ndarray:
    """Drop-in replacement for engine.compat.degrees (same contract).

    Falls back to interpret mode automatically off-TPU so the CPU test mesh
    exercises the identical kernel logic.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    R = P_rows.shape[0]
    C = P_cols.shape[0]
    tr = min(TILE_R, max(8, R))
    tc = min(TILE_C, max(128, C))
    Rp = -(-R // tr) * tr
    Cp = -(-C // tc) * tc

    mr = jnp.ones((R,), jnp.float32) if mask_rows is None else mask_rows.astype(jnp.float32)
    mc = jnp.ones((C,), jnp.float32) if mask_cols is None else mask_cols.astype(jnp.float32)

    # Coordinate-major layout + padding. Padded rows are masked to 0 degree;
    # padded cols get mask 0 so they contribute nothing.
    prT = _pad_to(P_rows.astype(jnp.float32).T, Rp, 1)
    qrT = _pad_to(Q_rows.astype(jnp.float32).T, Rp, 1)
    pcT = _pad_to(P_cols.astype(jnp.float32).T, Cp, 1)
    qcT = _pad_to(Q_cols.astype(jnp.float32).T, Cp, 1)
    mrp = _pad_to(mr[None, :], Rp, 1)
    mcp = _pad_to(mc[None, :], Cp, 1)
    rowoff = jnp.asarray(row_offset, jnp.int32).reshape(1, 1)

    grid = (Rp // tr, Cp // tc)
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
