"""Sharded bundle adjustment: Schur-complement Gauss-Newton over psum.

The distributed-BA capability from the north star (SURVEY.md sections 2.2,
3.5): joint refinement of scan poses T_i and map landmarks l_k from
point-to-point observations, scaled by sharding the *landmark* axis across
the device mesh. Each device eliminates its own landmark blocks locally
(3x3 inverses — trivially parallel), assembles its partial reduced camera
system, and one `psum` produces the global [6M, 6M] Schur complement that
every device solves replicated; back-substitution is local again. ICI
traffic per GN iteration is exactly one [6M, 6M] + [6M] reduction,
independent of the landmark count.

Layout: observations are grouped by landmark with a fixed per-landmark
budget G (padded, weight 0) — the static-shape convention; a landmark's
whole group lives on one device, which is what makes local elimination
exact.

Residual (world-frame point-to-point):
    r = R_i z + t_i - l_k          for observation (pose i, landmark k, z)
Jacobians (right perturbation T <- T exp(v, w)):
    d r / d v = R_i,   d r / d w = -R_i [z]_x,   d r / d l = -I
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from saccot_tpu.slam import se3


class BAProblem(NamedTuple):
    poses: jnp.ndarray      # [M, 4, 4]
    landmarks: jnp.ndarray  # [L, 3] (the local shard under sharding)
    obs_pose: jnp.ndarray   # [L, G] int32 pose index per observation slot
    obs_z: jnp.ndarray      # [L, G, 3] observed point in scan frame
    obs_w: jnp.ndarray      # [L, G] weights; 0 marks padding


class BAResult(NamedTuple):
    poses: jnp.ndarray
    landmarks: jnp.ndarray
    initial_cost: jnp.ndarray  # global under sharding
    final_cost: jnp.ndarray


def _residuals(poses, landmarks, prob: BAProblem):
    """r [L, G, 3] and rotations gathered per slot."""
    R = poses[prob.obs_pose][..., :3, :3]  # [L, G, 3, 3]
    t = poses[prob.obs_pose][..., :3, 3]   # [L, G, 3]
    world = jnp.einsum("lgij,lgj->lgi", R, prob.obs_z) + t
    r = world - landmarks[:, None, :]
    return r, R


def ba_cost(poses, landmarks, prob: BAProblem, axis_name=None):
    r, _ = _residuals(poses, landmarks, prob)
    c = jnp.sum(prob.obs_w * jnp.sum(r * r, axis=-1))
    if axis_name is not None:
        c = lax.psum(c, axis_name)
    return c


def _gn_system(poses, landmarks, prob: BAProblem, num_poses: int, lm_damping: float):
    """One device's contribution to the reduced camera system.

    Returns (H_red [6M, 6M], b_red [6M], Hll_inv [L, 3, 3], b_l [L, 3],
    W [L, G, 6, 3]) — the last three are kept for back-substitution.
    """
    M = num_poses
    r, R = _residuals(poses, landmarks, prob)  # [L,G,3], [L,G,3,3]
    w = prob.obs_w  # [L, G]

    # Pose Jacobian A = [R | -R [z]x]  -> [L, G, 3, 6]
    zhat = se3.hat(prob.obs_z)  # [L, G, 3, 3]
    A = jnp.concatenate([R, -jnp.einsum("lgij,lgjk->lgik", R, zhat)], axis=-1)
    # Landmark Jacobian B = -I (constant).

    wA = w[..., None, None] * A
    # H_pp diagonal blocks: sum_o A^T w A  keyed by pose. [L*G] scatter.
    AtA = jnp.einsum("lgai,lgaj->lgij", A, wA)  # [L, G, 6, 6]
    Atr = jnp.einsum("lgai,lga->lgi", A, w[..., None] * r)  # [L, G, 6]
    pose_ids = prob.obs_pose.reshape(-1)
    Hpp = jax.ops.segment_sum(AtA.reshape(-1, 6, 6), pose_ids, num_segments=M)
    bp = jax.ops.segment_sum(Atr.reshape(-1, 6), pose_ids, num_segments=M)

    # Landmark blocks: H_ll = (sum_g w) I + damping; b_l = -sum_g w r.
    wsum = jnp.sum(w, axis=-1)  # [L]
    Hll_inv = jnp.eye(3)[None] / (wsum + lm_damping)[:, None, None]  # [L,3,3]
    bl = -jnp.sum(w[..., None] * r, axis=1)  # [L, 3]

    # Coupling blocks W_{k,g} = A^T w B = -A^T w  -> [L, G, 6, 3]
    W = -jnp.swapaxes(wA, -1, -2)  # [L, G, 6, 3]

    # Schur fill-in: for each landmark, F_{g,g'} = W_g Hll^{-1} W_{g'}^T.
    WH = jnp.einsum("lgab,lbc->lgac", W, Hll_inv)  # [L, G, 6, 3]
    F = jnp.einsum("lgac,lhdc->lghad", WH, W)  # [L, G, G, 6, 6]
    gi = jnp.broadcast_to(prob.obs_pose[:, :, None], F.shape[:3]).reshape(-1)
    gj = jnp.broadcast_to(prob.obs_pose[:, None, :], F.shape[:3]).reshape(-1)
    Hfill = jax.ops.segment_sum(
        F.reshape(-1, 6, 6), gi * M + gj, num_segments=M * M
    ).reshape(M, M, 6, 6)

    # b fill-in: sum_k W_g Hll^{-1} b_l
    bfill = jnp.einsum("lgac,lc->lga", WH, bl)  # [L, G, 6]
    bfill = jax.ops.segment_sum(bfill.reshape(-1, 6), pose_ids, num_segments=M)

    H_red = jnp.zeros((M, M, 6, 6)).at[jnp.arange(M), jnp.arange(M)].set(Hpp) - Hfill
    H_red = H_red.transpose(0, 2, 1, 3).reshape(M * 6, M * 6)
    b_red = (bp - bfill).reshape(M * 6)
    return H_red, b_red, Hll_inv, bl, W


@functools.partial(
    jax.jit, static_argnames=("iters", "axis_name")
)
def bundle_adjust(
    prob: BAProblem,
    iters: int = 5,
    damping: float = 1e-6,
    lm_damping: float = 1e-6,
    axis_name: Optional[str] = None,
) -> BAResult:
    """Fixed-iteration Schur-complement GN; landmark-sharded when axis_name set."""
    M = prob.poses.shape[0]
    initial_cost = ba_cost(prob.poses, prob.landmarks, prob, axis_name)

    def gn_step(state, _):
        poses, landmarks, cost = state  # cost of current iterate, carried
        H, b, Hll_inv, bl, W = _gn_system(poses, landmarks, prob, M, lm_damping)
        if axis_name is not None:
            H = lax.psum(H, axis_name)
            b = lax.psum(b, axis_name)
        # Gauge fix: pin pose 0.
        free = (jnp.arange(M * 6) >= 6).astype(H.dtype)
        H = H * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        b = b * free
        H = H + damping * jnp.eye(M * 6, dtype=H.dtype)
        dx = jnp.linalg.solve(H, -b).reshape(M, 6)

        # Back-substitute landmarks: dl = -Hll^{-1} (bl + Hlp dx) with
        # Hlp dx = sum_g W_g^T dx_{pose(g)}.
        dx_slots = dx[prob.obs_pose]  # [L, G, 6]
        Wtdx = jnp.einsum("lgac,lga->lc", W, dx_slots)  # [L, 3]
        dl = -jnp.einsum("lab,lb->la", Hll_inv, bl + Wtdx)

        new_poses = se3.compose(poses, se3.exp_se3(dx))
        new_landmarks = landmarks + dl
        # Monotonicity guard (cost is global under sharding, so the accept
        # decision is identical on every device).
        new_cost = ba_cost(new_poses, new_landmarks, prob, axis_name)
        better = new_cost <= cost
        poses = jnp.where(better, new_poses, poses)
        landmarks = jnp.where(better, new_landmarks, landmarks)
        cost = jnp.where(better, new_cost, cost)
        return (poses, landmarks, cost), None

    (poses, landmarks, final_cost), _ = lax.scan(
        gn_step, (prob.poses, prob.landmarks, initial_cost), None, length=iters
    )
    return BAResult(
        poses=poses,
        landmarks=landmarks,
        initial_cost=initial_cost,
        final_cost=final_cost,
    )
