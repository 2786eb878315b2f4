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
    cand_out,  # VMEM [PAIRSp, TA] candidate triangle scores (or None)
    *,
    compat_tau: float,
    min_sep: float,
    num_neighbors: int,
    n_cols: int,
    emit_candidates: bool,
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
    # witness, knockout). Exactly lax.top_k's ordering. When candidates are
    # emitted, each sweep also extracts the winning neighbor's coordinates
    # via a tiny one-hot dot_general (MXU): sel [TA, NP] is exactly one-hot
    # per row, so pc [3, NP] x sel^T -> the selected [3, TA] columns.
    sel_p = []  # per-sweep selected source coords [3, TA]
    sel_q = []
    svals = []
    for b in range(num_neighbors):
        vmax = jnp.max(S, axis=1)  # [TA]
        hit = S == vmax[:, None]
        idx = jnp.min(jnp.where(hit, col, np_cols), axis=1).astype(jnp.int32)
        s_out[b, :] = vmax
        i_out[b, :] = idx
        if emit_candidates:
            sel = (col == idx[:, None]).astype(jnp.float32)  # [TA, NP] one-hot
            dn = (((1,), (1,)), ((), ()))  # contract NP with NP
            sel_p.append(jax.lax.dot_general(
                pc_ref[...], sel, dn, preferred_element_type=jnp.float32))
            sel_q.append(jax.lax.dot_general(
                qc_ref[...], sel, dn, preferred_element_type=jnp.float32))
            svals.append(vmax)
        S = jnp.where(col == idx[:, None], -jnp.inf, S)

    if not emit_candidates:
        return

    # Candidate triangle scores for every unordered neighbor pair (b1 < b2):
    # score = s_ij + s_ik + s_jk with s_jk recomputed from the selected
    # coordinates — same rigidity formula as the rows above. All [TA]
    # vector math; the B(B-1)/2 pairs unroll statically.
    inv_tau = 1.0 / compat_tau
    pair = 0
    for b1 in range(num_neighbors):
        for b2 in range(b1 + 1, num_neighbors):
            dp2 = jnp.zeros((ta,), jnp.float32)
            dq2 = jnp.zeros((ta,), jnp.float32)
            for c in range(3):
                dpc = sel_p[b1][c, :] - sel_p[b2][c, :]
                dqc = sel_q[b1][c, :] - sel_q[b2][c, :]
                dp2 += dpc * dpc
                dq2 += dqc * dqc
            dpn = jnp.sqrt(dp2)
            dqn = jnp.sqrt(dq2)
            dl = jnp.abs(dpn - dqn)
            okjk = (dl < compat_tau) & (dpn > min_sep) & (dqn > min_sep)
            s_jk = jnp.where(okjk, 1.0 - dl * inv_tau, 0.0)
            score = svals[b1] + svals[b2] + s_jk
            valid = (svals[b1] > 0) & (svals[b2] > 0) & (s_jk > 0)
            cand_out[pair, :] = jnp.where(valid, score, -1.0)
            pair += 1
    # Pad rows (pair..PAIRSp) stay at whatever the init value is; mark them
    # invalid explicitly so downstream top-K never selects them.
    for p in range(pair, cand_out.shape[0]):
        cand_out[p, :] = jnp.full((ta,), -1.0, jnp.float32)


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
    emit_candidates: bool = False,
):
    """Top-B compatibility neighbors of each anchor, fused on-chip.

    Returns (nbr_s [A, B] float32 descending, nbr_idx [A, B] int32), equal to
    `lax.top_k(score_block(P[anchors], ..., P, Q, ...), B)` on the XLA path
    up to f32 rounding of the two distance formulations.

    With emit_candidates=True additionally returns cand [A, B*(B-1)/2]
    float32: the score (s_ij + s_ik + s_jk, -1 when invalid) of every
    candidate triangle (anchor, nbr b1, nbr b2), b1 < b2 in the row-major
    upper-triangle order of np.triu_indices(B, k=1). This fuses the pool's
    neighbor-gather and candidate-scoring stages into the kernel — the
    selected neighbor coordinates are extracted on-chip via one-hot
    dot_generals, so the [A, B, 3] gathers and the badly-tiled [A, Pairs]
    elementwise stage never exist in XLA (profiled at ~60% of the whole
    pool stage, scripts/exp_pool_breakdown.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    N = P.shape[0]
    A = anchors.shape[0]
    B = num_neighbors
    n_pairs = B * (B - 1) // 2
    pairs_p = max(8, -(-n_pairs // 8) * 8)  # pad to the f32 sublane tile
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
    out_specs = [
        pl.BlockSpec((B, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, Ap), jnp.float32),
        jax.ShapeDtypeStruct((B, Ap), jnp.int32),
    ]
    if emit_candidates:
        out_specs.append(
            pl.BlockSpec((pairs_p, ta), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((pairs_p, Ap), jnp.float32))

    kernel = functools.partial(
        _anchor_topb_kernel,
        compat_tau=float(compat_tau),
        min_sep=float(min_separation),
        num_neighbors=B,
        n_cols=N,
        emit_candidates=emit_candidates,
    )
    if not emit_candidates:
        # Keep the 2-output arity when no candidate output exists.
        base = kernel

        def kernel(aid, amr, pa, qa, pc, qc, mc, s_o, i_o):  # noqa: F811
            return base(aid, amr, pa, qa, pc, qc, mc, s_o, i_o, None)

    outs = pl.pallas_call(
        kernel,
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
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(22 + 3 * B) * Ap * Np
            + (Ap * Np * 6 * B + 25 * Ap * n_pairs if emit_candidates else 0),
            bytes_accessed=(Ap + Np) * 32 + Ap * B * 8
            + (Ap * pairs_p * 4 if emit_candidates else 0),
            transcendentals=0,
        ),
    )(aid, map_, paT, qaT, pcT, qcT, mcp)

    s_out, i_out = outs[0], outs[1]
    nbr_s = s_out[:, :A].T  # [A, B]
    nbr_idx = i_out[:, :A].T
    # Padded-column selections carry index >= N; clamp for safe downstream
    # gathers (their score is <= 0 so the triangles are already invalid).
    nbr_idx = jnp.minimum(nbr_idx, N - 1)
    if emit_candidates:
        cand = outs[2][:n_pairs, :A].T  # [A, Pairs]
        return nbr_s, nbr_idx, cand
    return nbr_s, nbr_idx
