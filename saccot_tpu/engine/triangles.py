"""Compatibility-triangle (COT) pool: ranking + guided sampling, static shapes.

The reference enumerates all 3-cliques of the compatibility graph into an
adjacency-list structure, ranks them, and samples in ranked order
(SURVEY.md section 2.1, "Triangle (COT) enumeration"/"Triangle ranking").
That enumeration is inherently data-dependent-size; XLA requires static
shapes. This module implements the behaviorally-equivalent fixed-budget
contract:

  1. anchors: the `num_anchors` nodes with the highest weighted degree
     (degree = row-sum of the score matrix — well-connected correspondences
     are overwhelmingly the true inliers);
  2. per anchor, its `neighbors_per_anchor` strongest edges (top-k by score);
  3. candidate triangles = anchor + every pair of its selected neighbors,
     scored s_ij + s_ik + s_jk and validated (all three edges present,
     indices distinct);
  4. canonicalize (sorted triple), lexicographic de-duplication, and a
     global top-`max_hypotheses` by score.

With num_anchors >= N and neighbors_per_anchor >= N-1 the candidate set is a
superset of the exhaustive clique enumeration, so ranked truncation matches
the oracle exactly — that regime is what the parity tests run. Production
configs use budgets that keep the pool a few x max_hypotheses.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from saccot_tpu.utils.params import SacCotParams


class TrianglePool(NamedTuple):
    triples: jnp.ndarray  # [K, 3] int32, canonical i<j<k; padded entries arbitrary
    scores: jnp.ndarray   # [K] float32, -1 for padded/invalid entries
    valid: jnp.ndarray    # [K] bool


def edge_scores_from_points(
    P: jnp.ndarray,
    Q: jnp.ndarray,
    idx_a: jnp.ndarray,
    idx_b: jnp.ndarray,
    params: SacCotParams,
) -> jnp.ndarray:
    """Compatibility score of edges (idx_a, idx_b) recomputed from raw points.

    Shares the exact formula with `engine.compat.compat_matrix` but gathers
    only the needed point rows — this is what the blockwise/large-N path
    uses where the dense S matrix is never materialized.
    """
    pa, pb = P[idx_a], P[idx_b]
    qa, qb = Q[idx_a], Q[idx_b]
    dp = jnp.linalg.norm(pa - pb, axis=-1)
    dq = jnp.linalg.norm(qa - qb, axis=-1)
    delta = jnp.abs(dp - dq)
    ok = (
        (delta < params.compat_tau)
        & (dp > params.min_separation)
        & (dq > params.min_separation)
    )
    return jnp.where(ok, 1.0 - delta / params.compat_tau, 0.0)


def triangle_pool(
    S: jnp.ndarray,
    params: SacCotParams,
    P: Optional[jnp.ndarray] = None,
    Q: Optional[jnp.ndarray] = None,
) -> TrianglePool:
    """Build the ranked triangle pool from a dense score matrix S [N, N].

    If P/Q are given, the neighbor-neighbor edge score s_jk is recomputed
    from points (gathering 3-vectors instead of S entries); otherwise it is
    gathered from S. Both are exact.
    """
    N = S.shape[-1]
    A = min(params.num_anchors, N)
    B = min(params.neighbors_per_anchor, N - 1)
    K = params.max_hypotheses

    deg = jnp.sum(S, axis=-1)  # weighted degree [N]
    _, anchors = lax.top_k(deg, A)  # [A]
    rows = S[anchors]  # [A, N]
    nbr_s, nbr_idx = lax.top_k(rows, B)  # [A, B] scores + indices

    # Static neighbor-pair template (b1 < b2).
    b1, b2 = np.triu_indices(B, k=1)
    b1 = jnp.asarray(b1, dtype=jnp.int32)
    b2 = jnp.asarray(b2, dtype=jnp.int32)

    i = jnp.broadcast_to(anchors[:, None], (A, b1.shape[0]))  # [A, Pairs]
    j = nbr_idx[:, b1]
    k = nbr_idx[:, b2]
    s_ij = nbr_s[:, b1]
    s_ik = nbr_s[:, b2]
    if P is not None and Q is not None:
        s_jk = edge_scores_from_points(P, Q, j, k, params)
    else:
        s_jk = S[j, k]

    score = s_ij + s_ik + s_jk
    valid = (s_ij > 0) & (s_ik > 0) & (s_jk > 0) & (i != j) & (i != k) & (j != k)
    score = jnp.where(valid, score, -1.0)

    # Canonicalize and flatten the candidate pool.
    tri = jnp.sort(
        jnp.stack([i, j, k], axis=-1).reshape(-1, 3).astype(jnp.int32), axis=-1
    )  # [C, 3] with i<j<k
    score = score.reshape(-1)

    # Lexicographic de-dup: sort by (i, j, k), invalidate non-first copies.
    # All copies of one triangle carry the same score, so keeping the first
    # is exact.
    si, sj, sk, ss = lax.sort(
        (tri[:, 0], tri[:, 1], tri[:, 2], score), num_keys=3
    )
    dup = jnp.concatenate(
        [
            jnp.zeros((1,), dtype=bool),
            (si[1:] == si[:-1]) & (sj[1:] == sj[:-1]) & (sk[1:] == sk[:-1]),
        ]
    )
    ss = jnp.where(dup, -1.0, ss)

    top_s, top_i = lax.top_k(ss, min(K, ss.shape[0]))
    triples = jnp.stack([si[top_i], sj[top_i], sk[top_i]], axis=-1)
    if top_s.shape[0] < K:  # pad to the static budget
        pad = K - top_s.shape[0]
        triples = jnp.concatenate([triples, jnp.zeros((pad, 3), jnp.int32)], axis=0)
        top_s = jnp.concatenate([top_s, jnp.full((pad,), -1.0, top_s.dtype)], axis=0)
    return TrianglePool(triples=triples, scores=top_s, valid=top_s > 0)
