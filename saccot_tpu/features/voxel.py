"""Voxel-grid downsampling with static output shapes.

Replaces `pcl::VoxelGrid` (SURVEY.md section 2.1, "Preprocess"). The
data-dependent "number of occupied voxels" becomes a `max_points` budget:
points are lexicographically sorted by integer voxel coordinate
(`lax.sort` with 3 keys — no hash collisions, no int64), run boundaries
become compact segment ids, and per-voxel centroids come from one
segment-sum. Voxels beyond the budget are dropped deterministically (sort
order); the validity mask carries the effective count.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def voxel_downsample(
    points: jnp.ndarray,
    voxel_size: float,
    max_points: int,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[N, 3] -> (centroids [max_points, 3], valid [max_points] bool)."""
    N = points.shape[0]
    m = jnp.ones((N,), bool) if mask is None else mask.astype(bool)
    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    # Invalid points sort to the very end (and never match a real voxel).
    SENTINEL = jnp.int32(2**31 - 1)
    coords = jnp.where(m[:, None], coords, SENTINEL)

    cx, cy, cz, px, py, pz, mv = lax.sort(
        (coords[:, 0], coords[:, 1], coords[:, 2],
         points[:, 0], points[:, 1], points[:, 2], m.astype(jnp.int32)),
        num_keys=3,
    )
    new_run = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (cx[1:] != cx[:-1]) | (cy[1:] != cy[:-1]) | (cz[1:] != cz[:-1]),
        ]
    )
    seg = jnp.cumsum(new_run.astype(jnp.int32)) - 1  # [N] compact voxel id
    valid_pt = mv.astype(bool)
    seg = jnp.where(valid_pt, seg, max_points)  # overflow bucket for invalid
    seg = jnp.minimum(seg, max_points)          # and for voxels past budget

    pts_sorted = jnp.stack([px, py, pz], axis=-1)
    ones = valid_pt.astype(points.dtype)
    sums = jax.ops.segment_sum(
        pts_sorted * ones[:, None], seg, num_segments=max_points + 1
    )[:max_points]
    cnts = jax.ops.segment_sum(ones, seg, num_segments=max_points + 1)[:max_points]
    valid = cnts > 0
    centroids = sums / jnp.maximum(cnts, 1.0)[:, None]
    return jnp.where(valid[:, None], centroids, 0.0), valid
