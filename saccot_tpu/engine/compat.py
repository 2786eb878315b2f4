"""Rigidity-compatibility matrix — XLA (jnp) reference path.

Replaces the reference's O(N^2) CPU pair test + adjacency list
(SURVEY.md section 2.1, "Compatibility graph") with a dense matrix compute
that XLA maps onto the MXU: both intra-cloud distance matrices come from
Gram matrices (one batched matmul each), the rigidity test and score are
fused elementwise on the VPU. `saccot_tpu.kernels.compat` provides the
Pallas-fused and blockwise/ring variants for large N; this module is the
semantic reference they are tested against.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from saccot_tpu.utils.params import SacCotParams


def pairwise_distances(x: jnp.ndarray) -> jnp.ndarray:
    """Dense Euclidean distance matrix via the Gram trick (MXU-friendly).

    x: [..., N, 3] -> [..., N, N]. Uses max(0, .) clamping against negative
    round-off before the sqrt.
    """
    sq = jnp.sum(x * x, axis=-1)  # [..., N]
    # HIGHEST precision: the TPU MXU's default bf16 matmul is far too coarse
    # for the rigidity test |dp - dq| < tau (tau is ~1e-2 of the scene scale).
    g = jnp.einsum("...ik,...jk->...ij", x, x, precision=jax.lax.Precision.HIGHEST)
    d2 = sq[..., :, None] + sq[..., None, :] - 2.0 * g
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def compat_matrix(
    P: jnp.ndarray,
    Q: jnp.ndarray,
    params: SacCotParams,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dense compatibility score matrix S [..., N, N], matching the oracle.

    S[i,j] = (1 - |dp-dq|/tau) if |dp-dq| < tau and min(dp, dq) > min_sep,
    else 0; diagonal 0; masked rows/cols 0. Scores in (0, 1].
    """
    dp = pairwise_distances(P)
    dq = pairwise_distances(Q)
    delta = jnp.abs(dp - dq)
    ok = (
        (delta < params.compat_tau)
        & (dp > params.min_separation)
        & (dq > params.min_separation)
    )
    S = jnp.where(ok, 1.0 - delta / params.compat_tau, 0.0)
    n = S.shape[-1]
    S = S * (1.0 - jnp.eye(n, dtype=S.dtype))
    if mask is not None:
        m = mask.astype(S.dtype)
        S = S * m[..., :, None] * m[..., None, :]
    return S
