"""The SAC-COT estimator — jitted end-to-end per-pair registration.

This is the API centerpiece (SURVEY.md section 2.3): the TPU-native
equivalent of the reference's `sac_cot(correspondences, params) -> T,
inliers` entry point (SURVEY.md section 1.2, L4). One trace compiles the
whole estimator — blockwise compatibility degrees, triangle
ranking/sampling, batched 3-point SVD, hypothesis scoring, argmax, and a
branchless inlier re-fit — into a single XLA program with static shapes
throughout. The dense N x N compatibility matrix is never materialized (see
engine/compat.py).

Two execution modes share this code path:

- single-device / vmapped batch: `corr_axis=None`; P, Q are the full [N, 3]
  correspondence arrays.
- correspondence-axis sharded (SP, SURVEY.md section 2.2): called inside
  `shard_map` with `corr_axis` naming the mesh axis; P, Q are each device's
  [N/d, 3] shard. One [N, 3] point all-gather feeds the (replicated) pool
  stage; degree rows, hypothesis scoring, and refinement stay sharded with
  psum reductions. ICI traffic is O(N), never O(N^2).

Correspondences are taken as input (points plus a validity mask for
padding), exactly like the reference's estimator layer: upstream
keypoint/descriptor/matching stages live in `saccot_tpu.features` /
`saccot_tpu.match`, and external correspondences (e.g. FCGF-style learned
features for the 3DMatch config) plug in directly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from saccot_tpu.engine import compat as compat_mod
from saccot_tpu.engine import score as score_mod
from saccot_tpu.engine import triangles as tri_mod
from saccot_tpu.engine.svd3 import umeyama, transform_from_rt
from saccot_tpu.utils.params import SacCotParams


class RegistrationResult(NamedTuple):
    R: jnp.ndarray            # [3, 3]
    t: jnp.ndarray            # [3]
    T: jnp.ndarray            # [4, 4]
    inliers: jnp.ndarray      # [N] bool (the local shard under corr_axis)
    num_inliers: jnp.ndarray  # int32 scalar (global under corr_axis)
    best_score: jnp.ndarray   # float32 scalar (pre-refinement hypothesis score)
    num_valid_triangles: jnp.ndarray  # int32 scalar: valid entries in the pool
    success: jnp.ndarray      # bool scalar: at least one valid triangle existed


def _register_pair(
    P: jnp.ndarray,
    Q: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    params: SacCotParams,
    compat_impl: str,
    score_impl: str,
    corr_axis: Optional[str] = None,
    pool_impl: str = "jnp",
    solve_impl: str = "jnp",
    hyp_axis: Optional[str] = None,
) -> RegistrationResult:
    P = P.astype(jnp.float32)
    Q = Q.astype(jnp.float32)
    N_local = P.shape[0]
    m = jnp.ones((N_local,), jnp.float32) if mask is None else mask.astype(jnp.float32)

    if corr_axis is not None:
        # One tiny all-gather of raw points; everything quadratic stays sharded.
        P_full = lax.all_gather(P, corr_axis, tiled=True)
        Q_full = lax.all_gather(Q, corr_axis, tiled=True)
        m_full = lax.all_gather(m, corr_axis, tiled=True)
        row_offset = lax.axis_index(corr_axis) * N_local
    else:
        P_full, Q_full, m_full = P, Q, m
        row_offset = 0

    with jax.named_scope("saccot_degrees"):
        if corr_axis is not None and params.ring_compat:
            from saccot_tpu.dist.ring import degrees_ring
            deg_local = degrees_ring(
                P, Q, params, corr_axis, mask_loc=m, impl=compat_impl
            )
        elif compat_impl == "pallas":
            from saccot_tpu.kernels.compat import degrees_pallas
            # Passing None masks (not the all-ones m) when the caller gave
            # no mask lets the MXU degree kernel skip its two per-entry
            # mask multiplies entirely (~2.5 ms at N=50k).
            deg_local = degrees_pallas(
                P, Q, P_full, Q_full, params,
                row_offset=row_offset,
                mask_rows=None if mask is None else m,
                mask_cols=None if mask is None else m_full,
            )
        else:
            deg_local = compat_mod.degrees(
                P, Q, P_full, Q_full, params,
                row_offset=row_offset, mask_rows=m, mask_cols=m_full,
                block_rows=min(params.degree_block_rows, N_local),
            )
        deg_full = (
            lax.all_gather(deg_local, corr_axis, tiled=True)
            if corr_axis is not None
            else deg_local
        )

    with jax.named_scope("saccot_triangles"):
        pool = tri_mod.triangle_pool_from_points(
            P_full, Q_full, deg_full, params, mask=m_full, impl=pool_impl,
            anchor_axis=corr_axis,
        )

    if hyp_axis is not None:
        # TP (SURVEY.md section 2.2): shard the K hypotheses over a mesh
        # axis — each device solves and scores its K/d slice of the
        # (replicated) triangle pool; the best hypothesis is reduced
        # globally below, and the refine tail stays replicated.
        d_h = lax.axis_size(hyp_axis)
        K = pool.scores.shape[0]
        if K % d_h:
            raise ValueError(
                f"max_hypotheses={K} must be divisible by the hyp axis size {d_h}"
            )
        k_loc = K // d_h
        k0 = lax.axis_index(hyp_axis) * k_loc
        triples = lax.dynamic_slice_in_dim(pool.triples, k0, k_loc, axis=0)
        hyp_valid = lax.dynamic_slice_in_dim(pool.valid, k0, k_loc, axis=0)
    else:
        triples, hyp_valid = pool.triples, pool.valid

    use_soa = (
        solve_impl == "pallas" and score_impl == "pallas"
    )
    with jax.named_scope("saccot_svd3"):
        from saccot_tpu.kernels.solve3 import (
            MAX_N_SOLVE, solve3_pallas, solve3_pallas_soa,
        )
        r9 = t3 = None
        if solve_impl == "pallas" and P_full.shape[0] <= MAX_N_SOLVE:
            # Fused gather + Horn solve; ~5x over the XLA gather + SoA
            # iteration at the bench operating point (same quaternion core).
            # Above MAX_N_SOLVE the streaming kernel exists
            # (kernels/solve3._solve3_stream, parity-tested) but its one-hot
            # MXU work scales with N*K and measures ~1 ms/pair SLOWER than
            # the XLA gather at N=50k/K=2048 (scripts/exp_kitti_stages.py,
            # r4) — the gather cost scales with rows gathered (3K), not N,
            # so XLA is the right tool there. Routed accordingly.
            if use_soa:
                # SoA end to end: the solve's native [9, K]/[3, K] layout
                # feeds the scoring kernel directly — no [K, 9] relayout.
                r9, t3 = solve3_pallas_soa(P_full, Q_full, triples)
            else:
                R, t = solve3_pallas(P_full, Q_full, triples)
        else:
            tp = P_full[triples]  # [K, 3, 3]
            tq = Q_full[triples]
            R, t = umeyama(tp, tq)
            if use_soa:
                K_ = triples.shape[0]
                r9 = R.reshape(K_, 9).T
                t3 = t.T

    with jax.named_scope("saccot_score"):
        if score_impl == "pallas":
            from saccot_tpu.kernels.score import (
                score_hypotheses_pallas, score_hypotheses_pallas_soa,
            )
            if use_soa:
                scores, counts = score_hypotheses_pallas_soa(
                    r9, t3, P, Q, params.inlier_tau, mask=m,
                    mode=params.scoring, axis_name=corr_axis,
                )
            else:
                scores, counts = score_hypotheses_pallas(
                    R, t, P, Q, params.inlier_tau, mask=m, mode=params.scoring,
                    axis_name=corr_axis,
                )
        else:
            scores, counts = score_mod.score_hypotheses(
                R, t, P, Q, params.inlier_tau, mask=m, mode=params.scoring,
                block_k=params.score_block_k, axis_name=corr_axis,
            )
        scores = jnp.where(hyp_valid, scores, -1.0)
        best = jnp.argmax(scores)
        best_score = scores[best]
        if use_soa:
            # Champion extraction from SoA: two tiny lane gathers.
            Rb = r9[:, best].reshape(3, 3)
            tb = t3[:, best]
        else:
            Rb, tb = R[best], t[best]
        if hyp_axis is not None:
            # Global best across hypothesis shards: gather each shard's
            # champion (tiny: d_h scalars + transforms) and argmax. Shards
            # are gathered in axis order, so the combined argmax keeps the
            # single-device first-maximum tie-break exactly.
            g_scores = lax.all_gather(best_score, hyp_axis)  # [d_h]
            g_R = lax.all_gather(Rb, hyp_axis)               # [d_h, 3, 3]
            g_t = lax.all_gather(tb, hyp_axis)               # [d_h, 3]
            g_best = jnp.argmax(g_scores)
            best_score = g_scores[g_best]
            Rb, tb = g_R[g_best], g_t[g_best]

    with jax.named_scope("saccot_refine"):
        inl = score_mod.inlier_mask(Rb, tb, P, Q, params.inlier_tau, mask=m)
        for _ in range(params.refine_iters):
            w = inl.astype(jnp.float32) * m
            n = jnp.sum(w)
            if corr_axis is not None:
                n = lax.psum(n, corr_axis)
            Rf, tf = umeyama(P, Q, w=w, axis_name=corr_axis)
            # Branchless guard: keep the previous fit when <3 inliers.
            keep = n >= 3.0
            Rb = jnp.where(keep, Rf, Rb)
            tb = jnp.where(keep, tf, tb)
            inl = score_mod.inlier_mask(Rb, tb, P, Q, params.inlier_tau, mask=m)

    success = jnp.any(pool.valid)
    eye = jnp.eye(3, dtype=jnp.float32)
    Rb = jnp.where(success, Rb, eye)
    tb = jnp.where(success, tb, jnp.zeros((3,), jnp.float32))
    inl = inl & success
    n_inl = jnp.sum(inl).astype(jnp.int32)
    if corr_axis is not None:
        n_inl = lax.psum(n_inl, corr_axis)
    return RegistrationResult(
        R=Rb,
        t=tb,
        T=transform_from_rt(Rb, tb),
        inliers=inl,
        num_inliers=n_inl,
        best_score=best_score,
        num_valid_triangles=jnp.sum(pool.valid).astype(jnp.int32),
        success=success,
    )


@functools.partial(
    jax.jit,
    static_argnames=("params", "compat_impl", "score_impl", "pool_impl", "solve_impl"),
)
def register_pair(
    P: jnp.ndarray,
    Q: jnp.ndarray,
    params: SacCotParams,
    mask: Optional[jnp.ndarray] = None,
    compat_impl: str = "jnp",
    score_impl: str = "jnp",
    pool_impl: str = "jnp",
    solve_impl: str = "jnp",
) -> RegistrationResult:
    """Register one correspondence set: (P, Q, mask) -> best rigid transform.

    Args:
      P, Q: [N, 3] matched source/target keypoints (row i of P corresponds
        to row i of Q).
      params: static estimator configuration.
      mask: optional [N] validity mask for padded correspondences.
      compat_impl / score_impl / pool_impl / solve_impl: "jnp" (pure-XLA
        path) or "pallas" (fused TPU kernels).
    """
    return _register_pair(
        P, Q, mask, params, compat_impl, score_impl,
        pool_impl=pool_impl, solve_impl=solve_impl,
    )


def register_pair_sp(
    P_shard: jnp.ndarray,
    Q_shard: jnp.ndarray,
    params: SacCotParams,
    corr_axis: str,
    mask_shard: Optional[jnp.ndarray] = None,
    compat_impl: str = "jnp",
    score_impl: str = "jnp",
    pool_impl: str = "jnp",
    solve_impl: str = "jnp",
    hyp_axis: Optional[str] = None,
) -> RegistrationResult:
    """Correspondence-axis-sharded estimator body, for use inside shard_map.

    Each device passes its [N/d, 3] shard; the returned `inliers` is the
    local shard (stitch with out_specs P(corr_axis)); scalar fields are
    replicated/global. Pass `hyp_axis` to additionally shard the hypothesis
    pool over a second mesh axis (the TP analog, SURVEY.md section 2.2).
    """
    return _register_pair(
        P_shard, Q_shard, mask_shard, params, compat_impl, score_impl,
        corr_axis=corr_axis, pool_impl=pool_impl, solve_impl=solve_impl,
        hyp_axis=hyp_axis,
    )


def register_pair_tp(
    P: jnp.ndarray,
    Q: jnp.ndarray,
    params: SacCotParams,
    hyp_axis: str,
    mask: Optional[jnp.ndarray] = None,
    compat_impl: str = "jnp",
    score_impl: str = "jnp",
    pool_impl: str = "jnp",
    solve_impl: str = "jnp",
) -> RegistrationResult:
    """Hypothesis-axis (TP) sharded estimator body, for use inside shard_map.

    Points are replicated on every device; the K-hypothesis pool is sliced
    K/d per device, solve+scoring run on the slice, and the global best is
    argmax-reduced via a tiny all_gather (SURVEY.md section 2.2, TP row).
    All returned fields are replicated.
    """
    return _register_pair(
        P, Q, mask, params, compat_impl, score_impl,
        pool_impl=pool_impl, solve_impl=solve_impl, hyp_axis=hyp_axis,
    )


@functools.partial(
    jax.jit,
    static_argnames=("params", "compat_impl", "score_impl", "pool_impl", "solve_impl"),
)
def register_batch(
    P: jnp.ndarray,
    Q: jnp.ndarray,
    params: SacCotParams,
    mask: Optional[jnp.ndarray] = None,
    compat_impl: str = "jnp",
    score_impl: str = "jnp",
    pool_impl: str = "jnp",
    solve_impl: str = "jnp",
) -> RegistrationResult:
    """vmap of `register_pair` over a leading batch axis of scan pairs.

    P, Q: [B, N, 3]; mask: optional [B, N]. This is the unit the data-parallel
    sweep shards over devices (SURVEY.md section 2.2, DP row). Jitted at the
    API boundary: the eager op-by-op vmap dispatch is pathologically slow on
    every backend, and one trace per (shape, params) is the semantics every
    caller wants anyway.
    """
    if mask is None:
        # Keep mask=None visible to the estimator: the degree kernel then
        # skips its per-entry mask multiplies (see _register_pair).
        fn0 = lambda p, q: _register_pair(
            p, q, None, params, compat_impl, score_impl,
            pool_impl=pool_impl, solve_impl=solve_impl,
        )
        return jax.vmap(fn0)(P, Q)
    fn = lambda p, q, mk: _register_pair(
        p, q, mk, params, compat_impl, score_impl,
        pool_impl=pool_impl, solve_impl=solve_impl,
    )
    return jax.vmap(fn)(P, Q, mask)
