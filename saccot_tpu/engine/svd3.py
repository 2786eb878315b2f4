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
    method: str = "quat",
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
      method: "quat" (default) — Horn's quaternion method solved by a
        branchless shifted matrix-power iteration: 5 batched 4x4 squarings
        + a few power steps, all MXU/VPU arithmetic, no data-dependent
        loops. Orders of magnitude faster under vmap on TPU than "svd"
        (jnp.linalg.svd's while-loop Jacobi), and quaternions produce a
        proper rotation by construction (no reflection fix needed).
        "svd" keeps the classic Procrustes path for cross-checking.

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

    if method == "quat":
        R = _quaternion_rotation(H)
    else:
        R = _procrustes_rotation(H)
    t = qbar - jnp.einsum("...ij,...j->...i", R, pbar)
    return R, t


def _quaternion_rotation(H: jnp.ndarray) -> jnp.ndarray:
    """Optimal rotation from the cross-covariance via Horn's quaternion.

    The rotation maximizing trace(R^T H) is R(q*) where q* is the dominant
    eigenvector of Horn's symmetric 4x4 matrix N(H). We find it with a
    shift-and-square power method: A = N/|N|_F + 1.05 I is PSD with the
    same dominant eigenvector; eight squarings give A^256, whose largest
    column is the eigenvector to ~((l2+s)/(l1+s))^256 accuracy; two plain
    power steps polish. Everything is batched matmuls — no SVD/eigh
    while-loops, vmap-friendly.

    Degeneracy: for near-collinear point sets the top two eigenvalues of N
    coalesce (the rotation about the line is unobservable) and the returned
    rotation is an arbitrary member of the optimal set — exactly like SVD
    on the same input. Such hypotheses score badly downstream and are
    rejected, mirroring the reference's degenerate-sample handling.
    """
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]

    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], axis=-1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], axis=-1),
            jnp.stack([Szx - Sxz, Sxy + Syx, Syy - Sxx - Szz, Syz + Szy], axis=-1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, Szz - Sxx - Syy], axis=-1),
        ],
        axis=-2,
    )  # [..., 4, 4], symmetric; |eig| <= |N|_F

    fro = jnp.sqrt(jnp.sum(N * N, axis=(-2, -1), keepdims=True)) + 1e-12
    eye = jnp.eye(4, dtype=H.dtype)
    # Minimal PSD shift: normalized eigenvalues lie in [-1, 1], so +1.05
    # makes A PSD while barely compressing the top gap (a large shift would
    # stall the power iteration).
    A = N / fro + 1.05 * eye

    mm = lambda a, b: jnp.einsum(
        "...ij,...jk->...ik", a, b, precision=jax.lax.Precision.HIGHEST
    )
    for _ in range(8):  # A^256, renormalized to avoid overflow
        A = mm(A, A)
        A = A / (jnp.sqrt(jnp.sum(A * A, axis=(-2, -1), keepdims=True)) + 1e-30)

    # Dominant eigenvector ~ the largest column of A^32.
    col_n = jnp.sqrt(jnp.sum(A * A, axis=-2))  # [..., 4]
    best = jnp.argmax(col_n, axis=-1)
    v = jnp.take_along_axis(A, best[..., None, None], axis=-1)[..., 0]  # [..., 4]

    B = N / fro + 1.05 * eye
    for _ in range(2):  # polish
        v = jnp.einsum("...ij,...j->...i", B, v, precision=jax.lax.Precision.HIGHEST)
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-30)

    qw, qx, qy, qz = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)], axis=-1),
            jnp.stack([2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)], axis=-1),
            jnp.stack([2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)], axis=-1),
        ],
        axis=-2,
    )
    return R


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
