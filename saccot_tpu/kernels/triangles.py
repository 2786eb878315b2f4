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
TILE_N_STREAM = 2048  # column-block width of the streaming (N-unbounded) kernel


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
    cand_out,  # VMEM [PAIRSp|Tp, TA] candidate scores (or None)
    ji_out,    # VMEM [Tp, TA] int32 global node id of neighbor b1 (top_t>0)
    ki_out,    # VMEM [Tp, TA] int32 global node id of neighbor b2 (top_t>0)
    *,
    compat_tau: float,
    min_sep: float,
    num_neighbors: int,
    n_cols: int,
    emit_candidates: bool,
    top_t: int,
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
    svals = []
    idxs = []
    for b in range(num_neighbors):
        vmax = jnp.max(S, axis=1)  # [TA]
        hit = S == vmax[:, None]
        idx = jnp.min(jnp.where(hit, col, np_cols), axis=1).astype(jnp.int32)
        s_out[b, :] = vmax
        i_out[b, :] = idx
        svals.append(vmax)
        idxs.append(idx)
        S = jnp.where(col == idx[:, None], -jnp.inf, S)

    if not emit_candidates:
        return

    B = num_neighbors
    # Selected-neighbor coordinate extraction: ONE chunked one-hot
    # contraction per cloud instead of a dot per sweep (small-matmul MXU
    # latency dominated the per-sweep form). Chunk size adapts to the
    # padded column count so the [NP, cs*TA] one-hot tile stays ~2 MB of
    # VMEM at any N up to MAX_N_FUSED (cs=4 at N=1024, cs=1 at N=4096).
    cs = max(1, min(B, (512 * 1024 // max(np_cols, 1)) // ta))
    ps_rows = []  # per-sweep [3, TA] coordinate rows
    qs_rows = []
    rows_ta = jax.lax.broadcasted_iota(jnp.int32, (np_cols, ta), 0)
    for c0 in range(0, B, cs):
        chunk = idxs[c0:c0 + cs]
        # One-hot [NP, cs*TA], assembled along the (tile-aligned) lane axis.
        oh = jnp.concatenate(
            [(rows_ta == idx[None, :]).astype(jnp.float32) for idx in chunk],
            axis=1,
        )
        dn = (((1,), (0,)), ((), ()))                            # [3,NP]x[NP,m]
        pg = jax.lax.dot_general(pc_ref[...], oh, dn,
                                 preferred_element_type=jnp.float32)
        qg = jax.lax.dot_general(qc_ref[...], oh, dn,
                                 preferred_element_type=jnp.float32)
        for s in range(len(chunk)):
            ps_rows.append(pg[:, s * ta:(s + 1) * ta])           # [3, TA]
            qs_rows.append(qg[:, s * ta:(s + 1) * ta])

    # Vectorized pairwise rigidity over the B selected neighbors: stack the
    # per-sweep coords to [B, TA] per coordinate and broadcast to
    # [B, B, TA] — every op runs on full sublane tiles instead of B(B-1)/2
    # unrolled single-row instructions.
    sv = jnp.stack(svals, axis=0)                                # [B, TA]
    dp2 = jnp.zeros((B, B, ta), jnp.float32)
    dq2 = jnp.zeros((B, B, ta), jnp.float32)
    for c in range(3):
        pc_c = jnp.stack([r[c, :] for r in ps_rows], axis=0)     # [B, TA]
        qc_c = jnp.stack([r[c, :] for r in qs_rows], axis=0)
        dpc = pc_c[:, None, :] - pc_c[None, :, :]                # [B, B, TA]
        dqc = qc_c[:, None, :] - qc_c[None, :, :]
        dp2 += dpc * dpc
        dq2 += dqc * dqc
    dpn = jnp.sqrt(dp2)
    dqn = jnp.sqrt(dq2)
    dl = jnp.abs(dpn - dqn)
    okjk = (dl < compat_tau) & (dpn > min_sep) & (dqn > min_sep)
    s_jk = jnp.where(okjk, 1.0 - dl * (1.0 / compat_tau), 0.0)
    score3 = sv[:, None, :] + sv[None, :, :] + s_jk              # [B, B, TA]
    valid3 = (sv[:, None, :] > 0) & (sv[None, :, :] > 0) & (s_jk > 0)
    # Keep only the upper triangle b1 < b2 (unordered pairs, no self-pairs).
    r1 = jax.lax.broadcasted_iota(jnp.int32, (B, B, ta), 0)
    r2 = jax.lax.broadcasted_iota(jnp.int32, (B, B, ta), 1)
    valid3 &= r1 < r2
    cand3 = jnp.where(valid3, score3, -1.0)                      # [B, B, TA]

    if top_t == 0:
        # Emit the B(B-1)/2 candidate rows in np.triu_indices order.
        pair = 0
        for b1 in range(B):
            for b2 in range(b1 + 1, B):
                cand_out[pair, :] = cand3[b1, b2, :]
                pair += 1
        for p in range(pair, cand_out.shape[0]):
            cand_out[p, :] = jnp.full((ta,), -1.0, jnp.float32)
        return

    # Per-anchor top-T pre-reduction: T argmax sweeps over the [B, B]
    # candidate grid per anchor lane. Emits (score, global node id of each
    # selected neighbor pair): the b1/b2 -> node-id decode happens here as
    # two B-row masked reductions per sweep — in XLA it was two [K]-element
    # 2D gathers per pool, the single most expensive piece of the whole
    # pool stage (1.7 of 4.5 ms/batch at the bench point, r4 split).
    pair_id = r1 * B + r2                                        # [B, B, TA]
    idx_mat = jnp.stack(idxs, axis=0)                            # [B, TA]
    rowb = jax.lax.broadcasted_iota(jnp.int32, (B, ta), 0)
    Sc = cand3
    for t in range(top_t):
        vmax = jnp.max(Sc, axis=(0, 1))                          # [TA]
        hit = Sc == vmax[None, None, :]
        slot = jnp.min(jnp.where(hit, pair_id, B * B), axis=(0, 1)).astype(jnp.int32)
        # Exhausted anchors yield vmax=-inf / degenerate slots; clamp to the
        # plain invalid form (-1 score; the decoded ids of slot B*B-1 give
        # j == k, discarded downstream anyway).
        slot = jnp.minimum(slot, B * B - 1)
        b1 = slot // B
        b2 = slot % B
        cand_out[t, :] = jnp.maximum(vmax, -1.0)
        ji_out[t, :] = jnp.sum(
            jnp.where(rowb == b1[None, :], idx_mat, 0), axis=0)
        ki_out[t, :] = jnp.sum(
            jnp.where(rowb == b2[None, :], idx_mat, 0), axis=0)
        Sc = jnp.where(pair_id == slot[None, None, :], -jnp.inf, Sc)
    for t in range(top_t, cand_out.shape[0]):
        cand_out[t, :] = jnp.full((ta,), -1.0, jnp.float32)
        ji_out[t, :] = jnp.zeros((ta,), jnp.int32)
        ki_out[t, :] = jnp.zeros((ta,), jnp.int32)


def _anchor_topb_stream_kernel(
    aid_ref,   # VMEM [1, TA] int32 global anchor node ids
    amr_ref,   # VMEM [1, TA] anchor (row) mask
    pa_ref,    # VMEM [3, TA] anchor source points
    qa_ref,    # VMEM [3, TA] anchor target points
    pc_ref,    # VMEM [3, TN] source-point COLUMN BLOCK j
    qc_ref,    # VMEM [3, TN] target-point column block j
    mc_ref,    # VMEM [1, TN] column-mask block j
    s_out,     # VMEM [B, TA] running top-B scores (persists across j)
    i_out,     # VMEM [B, TA] running top-B global indices
    *,
    compat_tau: float,
    min_sep: float,
    num_neighbors: int,
    n_cols: int,
):
    """Streaming top-B: grid = (anchor tiles, column blocks).

    The column axis is the *inner* (sequential) grid dimension, so for a
    fixed anchor tile the output block stays resident in VMEM while column
    blocks j = 0..NC-1 stream through: each step scores its [TA, TN] block
    and merges it into the running top-B by B branchless argmax sweeps over
    the block plus the carried B entries. Global column indices break ties
    exactly like `lax.top_k` over the whole row (values descending, lowest
    index first), so the streamed result is bit-identical to the
    single-block kernel's — this is what removes MAX_N_FUSED: VMEM holds
    one [TA, TN] block regardless of N (VERDICT r3 next #2).
    """
    j = pl.program_id(1)
    ta = s_out.shape[1]
    tn = pc_ref.shape[1]
    B = num_neighbors
    BIG = jnp.int32(1 << 29)

    @pl.when(j == 0)
    def _init():
        # Distinct huge indices per slot keep knockouts one-at-a-time even
        # among invalid entries (mirrors the single-block kernel's behavior
        # of draining padded columns individually).
        s_out[...] = jnp.full((B, ta), -1.0, jnp.float32)
        i_out[...] = BIG + jax.lax.broadcasted_iota(jnp.int32, (B, ta), 0)

    def d2(a_ref, b_ref):
        acc = None
        for c in range(3):
            diff = a_ref[c, :][:, None] - b_ref[c, :][None, :]  # [TA, TN]
            acc = diff * diff if acc is None else acc + diff * diff
        return acc

    dp = jnp.sqrt(d2(pa_ref, pc_ref))
    dq = jnp.sqrt(d2(qa_ref, qc_ref))
    delta = jnp.abs(dp - dq)
    ok = (delta < compat_tau) & (dp > min_sep) & (dq > min_sep)

    gcol = jax.lax.broadcasted_iota(jnp.int32, (ta, tn), 1) + j * tn
    ok &= aid_ref[0, :][:, None] != gcol  # self-pairs

    Sb = jnp.where(ok, 1.0 - delta * (1.0 / compat_tau), 0.0)
    Sb = Sb * mc_ref[0, :][None, :] * amr_ref[0, :][:, None]
    Sb = jnp.where(gcol >= n_cols, -1.0, Sb)

    old_v = s_out[...]  # [B, TA]
    old_i = i_out[...]
    for b in range(B):
        vb = jnp.max(Sb, axis=1)                                  # [TA]
        gb = jnp.min(jnp.where(Sb == vb[:, None], gcol, BIG), axis=1)
        vo = jnp.max(old_v, axis=0)                               # [TA]
        go = jnp.min(jnp.where(old_v == vo[None, :], old_i, BIG), axis=0)
        v = jnp.maximum(vb, vo)
        g = jnp.where(
            vb > vo, gb, jnp.where(vo > vb, go, jnp.minimum(gb, go))
        )
        s_out[b, :] = v
        i_out[b, :] = g
        Sb = jnp.where(gcol == g[:, None], -jnp.inf, Sb)
        old_v = jnp.where(old_i == g[None, :], -jnp.inf, old_v)


def anchor_neighbors_stream_pallas(
    P: jnp.ndarray,
    Q: jnp.ndarray,
    anchors: jnp.ndarray,
    num_neighbors: int,
    compat_tau: float,
    min_separation: float,
    mask: Optional[jnp.ndarray] = None,
    anchor_mask: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
    tile_n: int = TILE_N_STREAM,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """N-unbounded top-B neighbors: (nbr_s [A, B], nbr_idx [A, B]).

    Column-blocked variant of `anchor_neighbors_pallas` for N beyond the
    single-block VMEM budget (KITTI-scale): identical selection semantics,
    VMEM usage O(TILE_A * tile_n) independent of N. Candidate scoring runs
    separately (`candidate_topt_pallas`) from the gathered neighbor
    coordinates — an O(A*B) gather, N-independent.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = P.shape[0]
    A = anchors.shape[0]
    B = num_neighbors
    ta = min(TILE_A, max(8, A))
    Ap = -(-A // ta) * ta
    tn = min(tile_n, max(128, -(-N // 128) * 128))
    Np = -(-N // tn) * tn

    def padx(x, n, axis, value=0.0):
        pad = n - x.shape[axis]
        if pad <= 0:
            return x
        w = [(0, 0)] * x.ndim
        w[axis] = (0, pad)
        return jnp.pad(x, w, constant_values=value)

    anchors = anchors.astype(jnp.int32)
    Pa = P[anchors].astype(jnp.float32)
    Qa = Q[anchors].astype(jnp.float32)
    mc = jnp.ones((N,), jnp.float32) if mask is None else mask.astype(jnp.float32)
    ma = (
        jnp.ones((A,), jnp.float32)
        if anchor_mask is None
        else anchor_mask.astype(jnp.float32)
    )

    aid = padx(anchors[None, :], Ap, 1, value=-1)
    map_ = padx(ma[None, :], Ap, 1)
    paT = padx(Pa.T, Ap, 1)
    qaT = padx(Qa.T, Ap, 1)
    pcT = padx(P.astype(jnp.float32).T, Np, 1)
    qcT = padx(Q.astype(jnp.float32).T, Np, 1)
    mcp = padx(mc[None, :], Np, 1)

    grid = (Ap // ta, Np // tn)  # column blocks innermost => sequential
    s_out, i_out = pl.pallas_call(
        functools.partial(
            _anchor_topb_stream_kernel,
            compat_tau=float(compat_tau),
            min_sep=float(min_separation),
            num_neighbors=B,
            n_cols=N,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ta), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ta), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ta), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ta), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, ta), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, ta), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Ap), jnp.float32),
            jax.ShapeDtypeStruct((B, Ap), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(22 + 3 * B) * Ap * Np,
            bytes_accessed=(Ap // ta) * Np * 28 + Ap * B * 8,
            transcendentals=0,
        ),
    )(aid, map_, paT, qaT, pcT, qcT, mcp)

    nbr_s = s_out[:, :A].T
    nbr_idx = i_out[:, :A].T
    # Invalid selections carry huge sentinel indices; clamp for safe gathers
    # (their score is <= 0 so downstream already discards them).
    nbr_idx = jnp.minimum(nbr_idx, N - 1)
    return nbr_s, nbr_idx


def _candidate_topt_kernel(
    sv_ref,    # VMEM [B, TA] per-anchor neighbor scores (descending)
    ni_ref,    # VMEM [B, TA] int32 neighbor global node ids
    pn_ref,    # VMEM [3*B, TA] neighbor source coords, row = c*B + b
    qn_ref,    # VMEM [3*B, TA] neighbor target coords
    vm_ref,    # VMEM [B, TA] neighbor validity (1 = real selection)
    cand_out,  # VMEM [Tp, TA] top-T candidate scores
    ji_out,    # VMEM [Tp, TA] int32 global node id of neighbor b1
    ki_out,    # VMEM [Tp, TA] int32 global node id of neighbor b2
    *,
    compat_tau: float,
    min_sep: float,
    num_neighbors: int,
    top_t: int,
):
    """Candidate-triangle scoring + per-anchor top-T from neighbor coords.

    The N-independent second half of `_anchor_topb_kernel`'s fused path:
    consumes the [A, B] selections (coords gathered in XLA — O(A*B) rows)
    instead of extracting them from the resident point set, so it composes
    with the streaming top-B kernel at any N. Same candidate semantics:
    score = s_ij + s_ik + s_jk over the b1 < b2 upper triangle.
    """
    ta = sv_ref.shape[1]
    B = num_neighbors
    sv = sv_ref[...] * vm_ref[...]  # zero out invalid selections

    dp2 = jnp.zeros((B, B, ta), jnp.float32)
    dq2 = jnp.zeros((B, B, ta), jnp.float32)
    for c in range(3):
        pc_c = pn_ref[c * B:(c + 1) * B, :]              # [B, TA]
        qc_c = qn_ref[c * B:(c + 1) * B, :]
        dpc = pc_c[:, None, :] - pc_c[None, :, :]        # [B, B, TA]
        dqc = qc_c[:, None, :] - qc_c[None, :, :]
        dp2 += dpc * dpc
        dq2 += dqc * dqc
    dpn = jnp.sqrt(dp2)
    dqn = jnp.sqrt(dq2)
    dl = jnp.abs(dpn - dqn)
    okjk = (dl < compat_tau) & (dpn > min_sep) & (dqn > min_sep)
    s_jk = jnp.where(okjk, 1.0 - dl * (1.0 / compat_tau), 0.0)
    score3 = sv[:, None, :] + sv[None, :, :] + s_jk
    valid3 = (sv[:, None, :] > 0) & (sv[None, :, :] > 0) & (s_jk > 0)
    r1 = jax.lax.broadcasted_iota(jnp.int32, (B, B, ta), 0)
    r2 = jax.lax.broadcasted_iota(jnp.int32, (B, B, ta), 1)
    valid3 &= r1 < r2
    Sc = jnp.where(valid3, score3, -1.0)

    pair_id = r1 * B + r2
    idx_mat = ni_ref[...]                                # [B, TA]
    rowb = jax.lax.broadcasted_iota(jnp.int32, (B, ta), 0)
    for t in range(top_t):
        vmax = jnp.max(Sc, axis=(0, 1))
        hit = Sc == vmax[None, None, :]
        slot = jnp.min(jnp.where(hit, pair_id, B * B), axis=(0, 1)).astype(jnp.int32)
        slot = jnp.minimum(slot, B * B - 1)
        b1 = slot // B
        b2 = slot % B
        cand_out[t, :] = jnp.maximum(vmax, -1.0)
        ji_out[t, :] = jnp.sum(
            jnp.where(rowb == b1[None, :], idx_mat, 0), axis=0)
        ki_out[t, :] = jnp.sum(
            jnp.where(rowb == b2[None, :], idx_mat, 0), axis=0)
        Sc = jnp.where(pair_id == slot[None, None, :], -jnp.inf, Sc)
    for t in range(top_t, cand_out.shape[0]):
        cand_out[t, :] = jnp.full((ta,), -1.0, jnp.float32)
        ji_out[t, :] = jnp.zeros((ta,), jnp.int32)
        ki_out[t, :] = jnp.zeros((ta,), jnp.int32)


def candidate_topt_pallas(
    nbr_s: jnp.ndarray,    # [A, B] neighbor scores (descending, <=0 invalid)
    nbr_idx: jnp.ndarray,  # [A, B] int32 neighbor global node ids
    nbr_p: jnp.ndarray,    # [A, B, 3] neighbor source coords
    nbr_q: jnp.ndarray,    # [A, B, 3] neighbor target coords
    top_t: int,
    compat_tau: float,
    min_separation: float,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-anchor top-T candidate triangles from gathered neighbor coords.

    Returns (cand_s [A, T], cand_j [A, T], cand_k [A, T]) with global node
    ids decoded in-kernel — the same contract as
    `anchor_neighbors_pallas(top_t=...)`'s last three outputs.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    A, B = nbr_s.shape
    ta = min(TILE_A, max(8, A))
    Ap = -(-A // ta) * ta
    tp_p = max(8, -(-top_t // 8) * 8)

    def padx(x, n, axis, value=0.0):
        pad = n - x.shape[axis]
        if pad <= 0:
            return x
        w = [(0, 0)] * x.ndim
        w[axis] = (0, pad)
        return jnp.pad(x, w, constant_values=value)

    svT = padx(nbr_s.astype(jnp.float32).T, Ap, 1)           # [B, Ap]
    niT = padx(nbr_idx.astype(jnp.int32).T, Ap, 1)           # [B, Ap]
    vmT = (svT > 0).astype(jnp.float32)
    # [A, B, 3] -> [3, B, A] -> [3*B, A]: row = c*B + b.
    pnT = padx(
        jnp.transpose(nbr_p.astype(jnp.float32), (2, 1, 0)).reshape(3 * B, A),
        Ap, 1,
    )
    qnT = padx(
        jnp.transpose(nbr_q.astype(jnp.float32), (2, 1, 0)).reshape(3 * B, A),
        Ap, 1,
    )

    grid = (Ap // ta,)
    cand, ji, ki = pl.pallas_call(
        functools.partial(
            _candidate_topt_kernel,
            compat_tau=float(compat_tau),
            min_sep=float(min_separation),
            num_neighbors=B,
            top_t=top_t,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * B, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * B, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tp_p, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tp_p, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tp_p, ta), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp_p, Ap), jnp.float32),
            jax.ShapeDtypeStruct((tp_p, Ap), jnp.int32),
            jax.ShapeDtypeStruct((tp_p, Ap), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=25 * Ap * B * B + 4 * top_t * Ap * B * B,
            bytes_accessed=Ap * B * 40 + Ap * tp_p * 12,
            transcendentals=0,
        ),
    )(svT, niT, pnT, qnT, vmT)
    return (cand[:top_t, :A].T,
            ji[:top_t, :A].T,
            ki[:top_t, :A].T)


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
    top_t: int = 0,
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

    With top_t > 0 (implies emit_candidates) the kernel additionally
    pre-reduces each anchor's candidates to its top-T on-chip and returns
    (nbr_s, nbr_idx, cand_s [A, T], cand_j [A, T], cand_k [A, T]) with the
    selected pair's global node ids decoded in-kernel — shrinking the
    global top-K reduction input by Pairs/T (~15x at the bench budgets)
    and eliminating the XLA-side slot->id gathers entirely.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if top_t:
        emit_candidates = True

    N = P.shape[0]
    A = anchors.shape[0]
    B = num_neighbors
    n_pairs = B * (B - 1) // 2
    pairs_p = max(8, -(-n_pairs // 8) * 8)  # pad to the f32 sublane tile
    tp_p = max(8, -(-top_t // 8) * 8) if top_t else 0
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
        cand_rows = tp_p if top_t else pairs_p
        out_specs.append(
            pl.BlockSpec((cand_rows, ta), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((cand_rows, Ap), jnp.float32))
    if top_t:
        for _ in range(2):  # ji / ki global-id planes
            out_specs.append(
                pl.BlockSpec((tp_p, ta), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((tp_p, Ap), jnp.int32))

    base = functools.partial(
        _anchor_topb_kernel,
        compat_tau=float(compat_tau),
        min_sep=float(min_separation),
        num_neighbors=B,
        n_cols=N,
        emit_candidates=emit_candidates,
        top_t=top_t,
    )
    # Pad the variadic output arity with Nones for the absent refs.
    if top_t:
        kernel = base
    elif emit_candidates:
        def kernel(aid, amr, pa, qa, pc, qc, mc, s_o, i_o, c_o):
            return base(aid, amr, pa, qa, pc, qc, mc, s_o, i_o, c_o, None, None)
    else:
        def kernel(aid, amr, pa, qa, pc, qc, mc, s_o, i_o):
            return base(aid, amr, pa, qa, pc, qc, mc, s_o, i_o, None, None, None)

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
    if top_t:
        cand_s = outs[2][:top_t, :A].T                 # [A, T]
        # Decoded global node ids; clamp like nbr_idx (invalid selections
        # carry score <= 0 and are discarded downstream).
        cand_j = jnp.clip(outs[3][:top_t, :A].T, 0, N - 1)
        cand_k = jnp.clip(outs[4][:top_t, :A].T, 0, N - 1)
        return nbr_s, nbr_idx, cand_s, cand_j, cand_k
    if emit_candidates:
        cand = outs[2][:n_pairs, :A].T  # [A, Pairs]
        return nbr_s, nbr_idx, cand
    return nbr_s, nbr_idx
