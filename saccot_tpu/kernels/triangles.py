"""Pallas TPU kernel: fused anchor-row scoring + top-B neighbor selection
(hot loop #2, the triangle/COT sampling stage).

The reference enumerates 3-cliques of the compatibility graph on the CPU
(SURVEY.md section 2.1, "Triangle (COT) enumeration"). This framework's
static-shape contract (engine/triangles.py) needs, per high-degree anchor
node, its B strongest compatibility edges; the XLA path materializes the
[A, N] anchor rows in HBM and runs `lax.top_k` over them. This kernel fuses
the whole stage on-chip: each anchor tile's score row block is computed in
VMEM (same rigidity test as kernels/compat.py) and immediately reduced to
its top-B (score, index) pairs by an iterative branchless argmax sweep —
the [A, N] row block never leaves the chip; HBM traffic is O(A + N) points
in, O(A*B) selections out.

Selection semantics match `lax.top_k` exactly: values descending, ties
broken by lowest column index. Padded columns are held at -1 (below every
real score, which lives in [0, 1]) so they are only selected after all real
columns; their s=0/invalid entries are discarded by the pool's validity
mask downstream.

The kernel keeps the full padded column axis resident per tile, so it is
used for N up to `MAX_N_FUSED`; beyond that the caller falls back to the
blockwise XLA path (which at KITTI scale is HBM-bound on the [A, N] rows
anyway, not selection-bound).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_A = 128
MAX_N_FUSED = 4096  # [TILE_A, N] f32 row block must fit comfortably in VMEM


def _anchor_topb_kernel(
    aid_ref,   # VMEM [1, TA] int32: global node index of each anchor in the tile
    amr_ref,   # VMEM [1, TA] anchor (row) mask
    pa_ref,    # VMEM [3, TA] anchor source points (coord-major)
    qa_ref,    # VMEM [3, TA] anchor target points
    pc_ref,    # VMEM [3, NP] all source points
    qc_ref,    # VMEM [3, NP] all target points
    mc_ref,    # VMEM [1, NP] column mask (0 beyond N and for invalid corrs)
    s_out,     # VMEM [B, TA] neighbor scores, descending per anchor
    i_out,     # VMEM [B, TA] neighbor column indices
    *,
    compat_tau: float,
    min_sep: float,
    num_neighbors: int,
    n_cols: int,
):
    ta = s_out.shape[1]
    np_cols = pc_ref.shape[1]

    def d2(a_ref, b_ref):
        acc = None
        for c in range(3):
            diff = a_ref[c, :][:, None] - b_ref[c, :][None, :]  # [TA, NP]
            acc = diff * diff if acc is None else acc + diff * diff
        return acc

    dp = jnp.sqrt(d2(pa_ref, pc_ref))
    dq = jnp.sqrt(d2(qa_ref, qc_ref))
    delta = jnp.abs(dp - dq)
    ok = (delta < compat_tau) & (dp > min_sep) & (dq > min_sep)

    col = jax.lax.broadcasted_iota(jnp.int32, (ta, np_cols), 1)
    ok &= aid_ref[0, :][:, None] != col  # self-pairs

    S = jnp.where(ok, 1.0 - delta * (1.0 / compat_tau), 0.0)
    S = S * mc_ref[0, :][None, :] * amr_ref[0, :][:, None]
    # Padded columns sit strictly below every real score (scores are >= 0)
    # so selection drains all real columns first — matching top_k over an
    # unpadded row.
    S = jnp.where(col >= n_cols, -1.0, S)

    # Iterative branchless argmax: B sweeps of (row max, lowest-index
    # witness, knockout). Exactly lax.top_k's ordering.
    for b in range(num_neighbors):
        vmax = jnp.max(S, axis=1)  # [TA]
        hit = S == vmax[:, None]
        idx = jnp.min(jnp.where(hit, col, np_cols), axis=1).astype(jnp.int32)
        s_out[b, :] = vmax
        i_out[b, :] = idx
        S = jnp.where(col == idx[:, None], -jnp.inf, S)


def anchor_neighbors_pallas(
    P: jnp.ndarray,          # [N, 3] source points
    Q: jnp.ndarray,          # [N, 3] target points
    anchors: jnp.ndarray,    # [A] int32 global anchor indices
    num_neighbors: int,
    compat_tau: float,
    min_separation: float,
    mask: Optional[jnp.ndarray] = None,       # [N] column validity
    anchor_mask: Optional[jnp.ndarray] = None,  # [A] anchor validity
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-B compatibility neighbors of each anchor, fused on-chip.

    Returns (nbr_s [A, B] float32 descending, nbr_idx [A, B] int32), equal to
    `lax.top_k(score_block(P[anchors], ..., P, Q, ...), B)` on the XLA path
    up to f32 rounding of the two distance formulations.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    N = P.shape[0]
    A = anchors.shape[0]
    B = num_neighbors
    ta = min(TILE_A, max(8, A))
    Ap = -(-A // ta) * ta
    Np = max(128, -(-N // 128) * 128)

    def padx(x, n, axis, value=0.0):
        pad = n - x.shape[axis]
        if pad <= 0:
            return x
        w = [(0, 0)] * x.ndim
        w[axis] = (0, pad)
        return jnp.pad(x, w, constant_values=value)

    anchors = anchors.astype(jnp.int32)
    Pa = P[anchors].astype(jnp.float32)  # [A, 3] tiny gather, done in XLA
    Qa = Q[anchors].astype(jnp.float32)
    mc = jnp.ones((N,), jnp.float32) if mask is None else mask.astype(jnp.float32)
    ma = (
        jnp.ones((A,), jnp.float32)
        if anchor_mask is None
        else anchor_mask.astype(jnp.float32)
    )

    # Padded anchors get id -1 (never equal to a column) and mask 0.
    aid = padx(anchors[None, :], Ap, 1, value=-1)
    map_ = padx(ma[None, :], Ap, 1)
    paT = padx(Pa.T, Ap, 1)
    qaT = padx(Qa.T, Ap, 1)
    pcT = padx(P.astype(jnp.float32).T, Np, 1)
    qcT = padx(Q.astype(jnp.float32).T, Np, 1)
    mcp = padx(mc[None, :], Np, 1)

    grid = (Ap // ta,)
    s_out, i_out = pl.pallas_call(
        functools.partial(
            _anchor_topb_kernel,
            compat_tau=float(compat_tau),
            min_sep=float(min_separation),
            num_neighbors=B,
            n_cols=N,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Np), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Np), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Ap), jnp.float32),
            jax.ShapeDtypeStruct((B, Ap), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(22 + 3 * B) * Ap * Np,
            bytes_accessed=(Ap + Np) * 32 + Ap * B * 8,
            transcendentals=0,
        ),
    )(aid, map_, paT, qaT, pcT, qcT, mcp)

    nbr_s = s_out[:, :A].T  # [A, B]
    nbr_idx = i_out[:, :A].T
    # Padded-column selections carry index >= N; clamp for safe downstream
    # gathers (their score is <= 0 so the triangles are already invalid).
    nbr_idx = jnp.minimum(nbr_idx, N - 1)
    return nbr_s, nbr_idx
