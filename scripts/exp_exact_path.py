"""Exact-vs-fast config measurement at the bench operating point (r5).

The exact config (dedup + exact top-K, no per-anchor cap) is the
reference-faithful mode; this script produces its receipts alongside the
fast config in one process so the ratio is tunnel-consistent. The r5
pipeline under test: sort-free cross-anchor membership dedup
(engine/triangles._mark_cross_anchor_duplicates), min/max canonical
network, packed-key arithmetic, exact selection via
approx_max_k(recall_target=1.0), one [K] key gather.

Usage: python scripts/exp_exact_path.py [reps]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/saccot_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from saccot_tpu.engine.sac_cot import register_batch
from saccot_tpu.io.synthetic import correspondence_problem
from saccot_tpu.utils import se3np
from saccot_tpu.utils.params import SacCotParams

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 15
B, N = 128, 1000
base = SacCotParams(
    compat_tau=0.03, min_separation=0.05, inlier_tau=0.03,
    num_anchors=256, neighbors_per_anchor=12, max_hypotheses=1024)
fast = dataclasses.replace(base, dedup_triangles=False, approx_topk=True,
                           per_anchor_candidates=4)
exact = dataclasses.replace(base, dedup_triangles=True, approx_topk=False,
                            per_anchor_candidates=0)
probs = [correspondence_problem(seed=1000 + i, n=N, outlier_ratio=0.8,
                                noise=0.004) for i in range(B)]
P = jnp.stack([jnp.asarray(p["P"]) for p in probs])
Q = jnp.stack([jnp.asarray(p["Q"]) for p in probs])
impls = dict(compat_impl="pallas", pool_impl="pallas", solve_impl="pallas",
             score_impl="pallas")

res = {}
for name, params in [("fast", fast), ("exact", exact)] * 2:
    fn = jax.jit(lambda a, b, params=params: register_batch(
        a, b, params, **impls))
    r = fn(P, Q)
    _ = np.asarray(r.num_inliers)  # transfer barrier (block_until_ready lies)
    t0 = time.time()
    for _ in range(reps):
        r = fn(P, Q)
    _ = np.asarray(r.num_inliers)
    dt = (time.time() - t0) / reps
    res.setdefault(name, []).append(dt)
    T_all = np.asarray(r.T, np.float64)
    ok = sum(
        1 for b, p in enumerate(probs)
        if se3np.rotation_angle_deg(
            (T_all[b] @ np.linalg.inv(p["T_gt"]))[:3, :3]) < 5.0
        and np.linalg.norm((T_all[b] @ np.linalg.inv(p["T_gt"]))[:3, 3]) < 0.05
    )
    print(f"{name:6s}: {dt*1e3:7.2f} ms/batch = {B/dt:6.0f} pairs/s  "
          f"recall {ok}/{B}", flush=True)

f = min(res["fast"])
e = min(res["exact"])
print(f"ratio exact/fast = {e/f:.2f}  ({B/e:.0f} vs {B/f:.0f} pairs/s)")
