"""SLAM front end: pairwise SAC-COT edges -> pose graph -> optional BA.

The full config-5 flow (SURVEY.md section 3.5):

  1. batch-register every sequence edge (odometry + loop closures) with the
     SAC-COT estimator — one vmapped/sharded sweep, the same unit the DP
     mesh axis shards;
  2. convert per-edge transforms to pose-graph measurements with weights
     from inlier counts; chain odometry for the initial guess;
  3. Gauss-Newton pose-graph optimization;
  4. optionally promote the per-edge inlier correspondences to landmark
     observations and run Schur-complement bundle adjustment for the final
     trajectory + map.

Frame conventions: `register_pair(P_i, Q_j)` returns M with q ~= M p (p in
scan i's frame, q in scan j's). With poses T_i: world <- scan, a shared
point satisfies p_j = T_j^{-1} T_i p_i, so the pose-graph measurement
Z_ij = T_i^{-1} T_j = M^{-1}.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from saccot_tpu.engine.sac_cot import RegistrationResult, register_batch
from saccot_tpu.slam import se3
from saccot_tpu.slam.ba import BAProblem, bundle_adjust, BAResult
from saccot_tpu.slam.posegraph import (
    PoseGraph, PGOResult, odometry_chain_init, optimize_pose_graph,
)
from saccot_tpu.utils.params import SacCotParams


class SequenceResult(NamedTuple):
    poses: jnp.ndarray               # [M, 4, 4] final trajectory
    pose_graph_result: PGOResult
    registration: RegistrationResult  # batched per-edge results
    ba_result: Optional[BAResult]
    num_failed_edges: int            # edges below min_inliers / unsuccessful


def edge_information(
    reg: RegistrationResult,     # batched over E
    edge_P: jnp.ndarray,         # [E, N, 3] source points (frame i)
    edge_Q: jnp.ndarray,         # [E, N, 3] target points (frame j)
    sigma_floor: float = 1e-3,
) -> jnp.ndarray:
    """[E, 6, 6] information matrices from the estimator's inlier statistics.

    First-order propagation of the registration's Gauss-Newton information:
    each inlier residual r_n = R p_n + t - q_n has Jacobian
    J_n = R [I | -hat(p_n)] w.r.t. a right perturbation of the estimated
    transform, so (R drops out under J^T J)

        H = (1/sigma^2) sum_n w_n [[I,        -hat(p_n)     ],
                                   [hat(p_n), |p_n|^2 I - p_n p_n^T]]

    with sigma^2 the *per-coordinate* residual variance — the weighted mean
    of |r|^2 divided by 3, since J^T J / sigma^2 whitens each of the three
    residual components — floored at sigma_floor^2 so near-perfect fits
    don't produce unbounded confidence. (Using the full 3-component mean
    would understate the information 3x and break the chi^2_6 delta
    calibration documented in posegraph.robust_weight.)
    The closed form needs only three inlier moments (sum w, sum w p,
    sum w p p^T) — no per-point 6x6 products are materialized. Edges with
    <3 inliers get a tiny isotropic information so the graph keeps static
    shapes without letting failed edges constrain anything.
    """
    P = edge_P.astype(jnp.float32)
    Q = edge_Q.astype(jnp.float32)
    w = reg.inliers.astype(jnp.float32)  # [E, N]

    # Residuals under the estimated transforms (for sigma^2).
    x = jnp.einsum("eij,enj->eni", reg.R, P) + reg.t[:, None, :] - Q
    d2 = jnp.sum(x * x, axis=-1)                       # [E, N]
    S0 = jnp.sum(w, axis=-1)                           # [E]
    sigma2 = jnp.sum(w * d2, axis=-1) / (3.0 * jnp.maximum(S0, 1.0))
    sigma2 = jnp.maximum(sigma2, sigma_floor**2)       # [E]

    S1 = jnp.einsum("en,eni->ei", w, P)                # [E, 3]
    S2 = jnp.einsum("en,eni,enj->eij", w, P, P)        # [E, 3, 3]
    eye3 = jnp.eye(3, dtype=P.dtype)

    def hat(v):
        zeros = jnp.zeros_like(v[..., 0])
        return jnp.stack([
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ], axis=-2)

    tl = S0[:, None, None] * eye3                      # [E, 3, 3]
    tr = -hat(S1)
    br = jnp.trace(S2, axis1=-2, axis2=-1)[:, None, None] * eye3 - S2
    H = jnp.concatenate([
        jnp.concatenate([tl, tr], axis=-1),
        jnp.concatenate([-tr, br], axis=-1),
    ], axis=-2) / sigma2[:, None, None]                # [E, 6, 6]

    ok = (reg.success & (S0 >= 3.0))[:, None, None]
    tiny = 1e-6 * jnp.broadcast_to(jnp.eye(6, dtype=P.dtype), H.shape)
    return jnp.where(ok, H, tiny)


def registrations_to_graph(
    n_scans: int,
    edges: jnp.ndarray,          # [E, 2] (i, j)
    reg: RegistrationResult,     # batched over E
    min_inliers: int = 5,
    edge_P: Optional[jnp.ndarray] = None,
    edge_Q: Optional[jnp.ndarray] = None,
) -> PoseGraph:
    """Build a PoseGraph from batched edge registrations.

    With `edge_P`/`edge_Q` given, full [E, 6, 6] information matrices are
    derived from the estimator's inlier statistics (`edge_information`);
    otherwise edge weight = inlier count (a crude but effective information
    proxy). Failed edges (few inliers / no triangles) get weight ~0 so they
    don't corrupt the solve but keep static shapes.

    Caveat surfaced via SequenceResult.num_failed_edges: a *failed odometry*
    edge leaves every later pose initialized at the break point (its
    identity measurement is still chained) and, absent a loop closure
    spanning the gap, only damping constrains those poses — callers must
    treat a nonzero failed-edge count on the odometry chain as a broken
    trajectory segment, exactly as the reference's serial pipeline would
    produce an unregistered pair.
    """
    Z = se3.inv(reg.T)  # measurement T_i^{-1} T_j (see module docstring)
    ok = reg.success & (reg.num_inliers >= min_inliers)
    w = jnp.where(ok, reg.num_inliers.astype(jnp.float32), 1e-6)

    info = None
    if edge_P is not None and edge_Q is not None:
        info = edge_information(reg, jnp.asarray(edge_P), jnp.asarray(edge_Q))
        info = jnp.where(
            ok[:, None, None], info,
            1e-6 * jnp.broadcast_to(jnp.eye(6, dtype=info.dtype), info.shape),
        )

    # Initial guess: chain the odometry edges (assumed to be the first
    # n_scans-1 edges, in order — the sequence harness guarantees this).
    odo = Z[: n_scans - 1]
    poses0 = odometry_chain_init(odo)
    return PoseGraph(
        poses=poses0,
        edge_i=edges[:, 0].astype(jnp.int32),
        edge_j=edges[:, 1].astype(jnp.int32),
        meas=Z,
        weight=w,
        info=info,
    )


def correspondences_to_ba(
    poses: jnp.ndarray,            # [M, 4, 4] pose-graph output
    edges: np.ndarray,             # [E, 2]
    edge_P: np.ndarray,            # [E, N, 3] points in frame i
    edge_Q: np.ndarray,            # [E, N, 3] points in frame j
    inliers: np.ndarray,           # [E, N] bool from registration
    max_landmarks: int = 2048,
    obs_per_landmark: int = 2,
) -> BAProblem:
    """Promote inlier correspondences to landmark observations (host-side).

    Each surviving correspondence becomes one landmark observed twice (in
    scan i at P and scan j at Q); the landmark is initialized at the mean of
    the two world-frame estimates. Fixed budgets keep shapes static.
    """
    poses_np = np.asarray(poses, np.float64)
    lm, op, oz, ow = [], [], [], []
    E, N = inliers.shape
    for e in range(E):
        i, j = int(edges[e, 0]), int(edges[e, 1])
        idx = np.nonzero(inliers[e])[0]
        for n in idx:
            p_w = poses_np[i] @ np.append(edge_P[e, n], 1.0)
            q_w = poses_np[j] @ np.append(edge_Q[e, n], 1.0)
            lm.append((p_w[:3] + q_w[:3]) * 0.5)
            op.append([i, j])
            oz.append([edge_P[e, n], edge_Q[e, n]])
            ow.append([1.0, 1.0])
            if len(lm) >= max_landmarks:
                break
        if len(lm) >= max_landmarks:
            break

    L = max_landmarks
    G = obs_per_landmark
    landmarks = np.zeros((L, 3), np.float32)
    obs_pose = np.zeros((L, G), np.int32)
    obs_z = np.zeros((L, G, 3), np.float32)
    obs_w = np.zeros((L, G), np.float32)
    n_real = min(len(lm), L)
    if n_real:
        landmarks[:n_real] = np.asarray(lm[:n_real], np.float32)
        obs_pose[:n_real] = np.asarray(op[:n_real], np.int32)[:, :G]
        obs_z[:n_real] = np.asarray(oz[:n_real], np.float32)[:, :G]
        obs_w[:n_real] = np.asarray(ow[:n_real], np.float32)[:, :G]

    return BAProblem(
        poses=jnp.asarray(np.asarray(poses, np.float32)),
        landmarks=jnp.asarray(landmarks),
        obs_pose=jnp.asarray(obs_pose),
        obs_z=jnp.asarray(obs_z),
        obs_w=jnp.asarray(obs_w),
    )


def propose_loop_candidates(
    poses: np.ndarray,
    min_gap: int = 3,
    radius: float = 1.0,
    max_candidates: int = 32,
) -> np.ndarray:
    """Loop-closure candidates by trajectory proximity (host-side).

    After odometry chaining, scans whose estimated positions fall within
    `radius` of each other but are at least `min_gap` apart in time are
    candidate loop closures (SURVEY.md section 3.5, "odometry + loop
    candidates") — the registration engine then confirms or rejects each by
    actually registering the pair. Returns [C, 2] (i, j) with i < j, closest
    first, capped at max_candidates.
    """
    t = np.asarray(poses, np.float64)[:, :3, 3]  # [M, 3]
    d = np.linalg.norm(t[:, None, :] - t[None, :, :], axis=-1)
    M = t.shape[0]
    ii, jj = np.triu_indices(M, k=min_gap)
    sel = d[ii, jj] < radius
    ii, jj = ii[sel], jj[sel]
    order = np.argsort(d[ii, jj], kind="stable")[:max_candidates]
    return np.stack([ii[order], jj[order]], axis=1).astype(np.int64)


def run_sequence(
    n_scans: int,
    edges: np.ndarray,
    edge_P: np.ndarray,
    edge_Q: np.ndarray,
    params: SacCotParams,
    pgo_iters: int = 10,
    run_ba: bool = True,
    ba_iters: int = 5,
    max_landmarks: int = 2048,
    use_info: bool = True,
    robust: Optional[str] = "huber",
    robust_delta: float = 3.0,
) -> SequenceResult:
    """Full sequence SLAM on one device (the sharded variant lives in
    dist/sweep.py + slam/dryrun.py composition).

    use_info derives [E, 6, 6] information matrices from the inlier
    statistics (edge_information); robust selects the pose-graph loss
    ("huber"/"dcs"/None) with threshold `robust_delta` on the whitened
    residual.
    """
    reg = register_batch(jnp.asarray(edge_P), jnp.asarray(edge_Q), params)
    graph = registrations_to_graph(
        n_scans, jnp.asarray(edges), reg,
        edge_P=jnp.asarray(edge_P) if use_info else None,
        edge_Q=jnp.asarray(edge_Q) if use_info else None,
    )
    pgo = optimize_pose_graph(graph, iters=pgo_iters, robust=robust,
                              delta=robust_delta)
    n_failed = int(
        np.sum(~(np.asarray(reg.success) & (np.asarray(reg.num_inliers) >= 5)))
    )

    ba_res = None
    poses = pgo.poses
    if run_ba:
        prob = correspondences_to_ba(
            pgo.poses, edges, edge_P, edge_Q, np.asarray(reg.inliers),
            max_landmarks=max_landmarks,
        )
        ba_res = bundle_adjust(prob, iters=ba_iters)
        poses = ba_res.poses
    return SequenceResult(
        poses=poses,
        pose_graph_result=pgo,
        registration=reg,
        ba_result=ba_res,
        num_failed_edges=n_failed,
    )
