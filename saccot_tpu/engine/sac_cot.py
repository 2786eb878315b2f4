"""The SAC-COT estimator — jitted end-to-end per-pair registration.

This is the API centerpiece (SURVEY.md section 2.3): the TPU-native
equivalent of the reference's `sac_cot(correspondences, params) -> T,
inliers` entry point (SURVEY.md section 1.2, L4). One trace compiles the
whole estimator — compatibility matrix, triangle ranking/sampling, batched
3-point SVD, hypothesis scoring, argmax, and a branchless inlier re-fit —
into a single XLA program with static shapes throughout.

Correspondences are taken as input (points P, Q plus a validity mask for
padding), exactly like the reference's estimator layer: the upstream
keypoint/descriptor/matching stages live in `saccot_tpu.features` and
`saccot_tpu.match`, and external correspondences (e.g. FCGF-style learned
features for the 3DMatch config) plug in directly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from saccot_tpu.engine import compat as compat_mod
from saccot_tpu.engine import score as score_mod
from saccot_tpu.engine import triangles as tri_mod
from saccot_tpu.engine.svd3 import umeyama, transform_from_rt
from saccot_tpu.utils.params import SacCotParams


class RegistrationResult(NamedTuple):
    R: jnp.ndarray            # [3, 3]
    t: jnp.ndarray            # [3]
    T: jnp.ndarray            # [4, 4]
    inliers: jnp.ndarray      # [N] bool
    num_inliers: jnp.ndarray  # int32 scalar
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
) -> RegistrationResult:
    P = P.astype(jnp.float32)
    Q = Q.astype(jnp.float32)
    N = P.shape[0]
    m = jnp.ones((N,), jnp.float32) if mask is None else mask.astype(jnp.float32)

    with jax.named_scope("saccot_compat"):
        if compat_impl == "pallas":
            from saccot_tpu.kernels.compat import compat_matrix_pallas
            S = compat_matrix_pallas(P, Q, params, mask=m)
        else:
            S = compat_mod.compat_matrix(P, Q, params, mask=m)

    with jax.named_scope("saccot_triangles"):
        pool = tri_mod.triangle_pool(S, params, P, Q)

    with jax.named_scope("saccot_svd3"):
        tp = P[pool.triples]  # [K, 3, 3]
        tq = Q[pool.triples]
        R, t = umeyama(tp, tq)

    with jax.named_scope("saccot_score"):
        if score_impl == "pallas":
            from saccot_tpu.kernels.score import score_hypotheses_pallas
            scores, counts = score_hypotheses_pallas(
                R, t, P, Q, params.inlier_tau, mask=m, mode=params.scoring
            )
        else:
            scores, counts = score_mod.score_hypotheses(
                R, t, P, Q, params.inlier_tau, mask=m, mode=params.scoring
            )
        scores = jnp.where(pool.valid, scores, -1.0)
        best = jnp.argmax(scores)
        best_score = scores[best]
        Rb, tb = R[best], t[best]

    with jax.named_scope("saccot_refine"):
        inl = score_mod.inlier_mask(Rb, tb, P, Q, params.inlier_tau, mask=m)
        for _ in range(params.refine_iters):
            w = inl.astype(jnp.float32) * m
            n = jnp.sum(w)
            Rf, tf = umeyama(P, Q, w=w)
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
    return RegistrationResult(
        R=Rb,
        t=tb,
        T=transform_from_rt(Rb, tb),
        inliers=inl,
        num_inliers=jnp.sum(inl).astype(jnp.int32),
        best_score=best_score,
        num_valid_triangles=jnp.sum(pool.valid).astype(jnp.int32),
        success=success,
    )


@functools.partial(
    jax.jit, static_argnames=("params", "compat_impl", "score_impl")
)
def register_pair(
    P: jnp.ndarray,
    Q: jnp.ndarray,
    params: SacCotParams,
    mask: Optional[jnp.ndarray] = None,
    compat_impl: str = "jnp",
    score_impl: str = "jnp",
) -> RegistrationResult:
    """Register one correspondence set: (P, Q, mask) -> best rigid transform.

    Args:
      P, Q: [N, 3] matched source/target keypoints (row i of P corresponds
        to row i of Q).
      params: static estimator configuration.
      mask: optional [N] validity mask for padded correspondences.
      compat_impl / score_impl: "jnp" (pure-XLA reference path) or "pallas"
        (fused TPU kernels).
    """
    return _register_pair(P, Q, mask, params, compat_impl, score_impl)


def register_batch(
    P: jnp.ndarray,
    Q: jnp.ndarray,
    params: SacCotParams,
    mask: Optional[jnp.ndarray] = None,
    compat_impl: str = "jnp",
    score_impl: str = "jnp",
) -> RegistrationResult:
    """vmap of `register_pair` over a leading batch axis of scan pairs.

    P, Q: [B, N, 3]; mask: optional [B, N]. This is the unit the data-parallel
    sweep shards over devices (SURVEY.md section 2.2, DP row).
    """
    fn = lambda p, q, mk: _register_pair(p, q, mk, params, compat_impl, score_impl)
    if mask is None:
        mask = jnp.ones(P.shape[:2], jnp.float32)
    return jax.vmap(fn)(P, Q, mask)
