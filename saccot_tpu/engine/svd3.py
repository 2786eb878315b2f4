"""Batched weighted rigid alignment (Horn/Umeyama) for the TPU engine.

Replaces the reference's per-sample Eigen 3x3 SVD (SURVEY.md section 2.1,
"Guided sampler + 3-pt solver") with a fully batched, branchless version:
one `jnp.linalg.svd` over a [K, 3, 3] stack of cross-covariances computes all
K hypothesis transforms at once. The det<0 reflection case is fixed by a
sign flip on the last singular vector (no control flow, vmap/jit safe), and
degenerate inputs (collinear/coincident triples, all-zero weights) are
guarded so they produce *a* valid rotation rather than NaNs — such
hypotheses are then discarded by scoring, never by control flow.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def umeyama(
    p: jnp.ndarray,
    q: jnp.ndarray,
    w: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted rigid alignment, batched over leading dims.

    Finds (R, t) minimizing sum_i w_i ||R p_i + t - q_i||^2 (no scale).

    Args:
      p: [..., M, 3] source points.
      q: [..., M, 3] target points.
      w: [..., M] nonnegative weights (default uniform). An all-zero weight
         row yields R=I-ish garbage-but-finite output, not NaN.
      axis_name: if set (inside shard_map/pmap), the point axis M is sharded
        across that mesh axis — all moment sums are psum-reduced so every
        device gets the global fit. This is how the SP refinement path runs
        (SURVEY.md section 2.2).

    Returns:
      R: [..., 3, 3] rotations, t: [..., 3] translations.
    """
    p = jnp.asarray(p)
    q = jnp.asarray(q)
    if w is None:
        w = jnp.ones(p.shape[:-1], dtype=p.dtype)
    w = w.astype(p.dtype)

    def _reduce(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    wsum = _reduce(jnp.sum(w, axis=-1, keepdims=True))  # [..., 1]
    wsum = jnp.maximum(wsum, 1e-9)
    pbar = _reduce(jnp.sum(w[..., None] * p, axis=-2)) / wsum  # [..., 3]
    qbar = _reduce(jnp.sum(w[..., None] * q, axis=-2)) / wsum
    pc = p - pbar[..., None, :]
    qc = q - qbar[..., None, :]
    # Weighted cross-covariance H = sum_i w_i pc_i qc_i^T  -> [..., 3, 3]
    H = _reduce(
        jnp.einsum(
            "...m,...mi,...mj->...ij", w, pc, qc, precision=jax.lax.Precision.HIGHEST
        )
    )

    R = _procrustes_rotation(H)
    t = qbar - jnp.einsum("...ij,...j->...i", R, pbar)
    return R, t


def _procrustes_rotation(H: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation to the polar factor of H^T-aligned frame: R = V D U^T.

    H: [..., 3, 3] cross-covariance. D = diag(1, 1, det(V U^T)) fixes
    reflections branchlessly.
    """
    # Tiny diagonal jitter keeps SVD well-defined for exactly-degenerate H
    # (e.g. padded hypotheses with identical points).
    eye = jnp.eye(3, dtype=H.dtype)
    Hj = H + 1e-12 * eye
    U, _, Vt = jnp.linalg.svd(Hj, full_matrices=False)
    V = jnp.swapaxes(Vt, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", V, Ut))
    # Flip the last column of V by sign(det): R = V diag(1,1,s) U^T.
    s = jnp.sign(det)
    s = jnp.where(s == 0, 1.0, s).astype(H.dtype)
    V_fixed = V.at[..., :, 2].multiply(s[..., None])
    return jnp.einsum("...ij,...jk->...ik", V_fixed, Ut)


def transform_from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Pack [..., 3, 3] + [..., 3] into homogeneous [..., 4, 4]."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T
