"""N=50k stage attribution on the real TPU (VERDICT r3 next #2).

Times the kitti-config estimator steady-state under several per-stage
implementation mixes, using the incremental (in-context) method: the cost
of a stage's kernel vs its XLA fallback is the difference between two
full-program timings that differ only in that stage. Transfer-forced
timing barrier throughout (block_until_ready returns early on this
backend).

Usage: python scripts/exp_kitti_stages.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from saccot_tpu.cli.configs import CONFIGS
from saccot_tpu.engine.sac_cot import register_pair
from saccot_tpu.io.synthetic import correspondence_problem

cfg = CONFIGS["kitti"]
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10

scale = 30.0
prob = correspondence_problem(
    seed=cfg.seed, n=cfg.n_corr, outlier_ratio=cfg.outlier_ratio,
    noise=cfg.noise / scale, n_points=4 * cfg.n_corr, max_angle=0.3,
    max_trans=3.0,
)
P = jnp.asarray(prob["P"] * scale)
Q = jnp.asarray(prob["Q"] * scale)

MIXES = {
    # progressive kernel adoption, so adjacent rows isolate one stage
    "all_jnp":              dict(compat_impl="jnp", pool_impl="jnp", solve_impl="jnp", score_impl="jnp"),
    "+compat_pallas":       dict(compat_impl="pallas", pool_impl="jnp", solve_impl="jnp", score_impl="jnp"),
    "+score_pallas":        dict(compat_impl="pallas", pool_impl="jnp", solve_impl="jnp", score_impl="pallas"),
    "+pool_stream_pallas":  dict(compat_impl="pallas", pool_impl="pallas", solve_impl="jnp", score_impl="pallas"),
    "+solve_stream_pallas": dict(compat_impl="pallas", pool_impl="pallas", solve_impl="pallas", score_impl="pallas"),
}

results = {}
for name, impls in MIXES.items():
    fn = jax.jit(lambda a, b, impls=impls: register_pair(a, b, cfg.params, **impls))
    r = fn(P, Q)
    _ = np.asarray(r.num_inliers)  # warm + barrier
    t0 = time.time()
    for _ in range(reps):
        r = fn(P, Q)
    _ = np.asarray(r.num_inliers)  # one barrier drains the queued reps
    dt = (time.time() - t0) / reps
    results[name] = dt
    print(f"{name:22s} {dt*1e3:8.2f} ms/pair   inliers={int(r.num_inliers)}", flush=True)

base = results["all_jnp"]
print("\nincremental deltas (stage kernel vs its XLA fallback):")
prev = None
for name, dt in results.items():
    if prev is not None:
        print(f"  {name:22s} {1e3*(dt - prev):+8.2f} ms")
    prev = dt

# ---- absolute per-stage receipts (incremental prefix programs) + bounds ----
from saccot_tpu.engine import triangles as tri_mod
from saccot_tpu.engine import score as score_mod
from saccot_tpu.engine.svd3 import umeyama
from saccot_tpu.kernels.compat import degrees_pallas
from saccot_tpu.kernels.score import score_hypotheses_pallas
from saccot_tpu.evaluation.roofline import (
    ChipPeaks, compat_degrees_model, pool_model, scoring_model, solve_model,
    stage_bound_seconds,
)

params = cfg.params
N = cfg.n_corr
mask1 = jnp.ones((N,), jnp.float32)

def upto(stage):
    def one(p, q, m):
        deg = degrees_pallas(p, q, p, q, params, mask_rows=m, mask_cols=m)
        if stage == 1:
            return jnp.sum(deg)
        pool = tri_mod.triangle_pool_from_points(
            p, q, deg, params, mask=m, impl="pallas")
        if stage == 2:
            return jnp.sum(pool.scores) + jnp.sum(pool.triples)
        tp = p[pool.triples]  # XLA gather: the routed path at N > MAX_N_SOLVE
        tq = q[pool.triples]
        R, t = umeyama(tp, tq)
        if stage == 3:
            return jnp.sum(R) + jnp.sum(t)
        scores, _ = score_hypotheses_pallas(R, t, p, q, params.inlier_tau, mask=m)
        return jnp.max(jnp.where(pool.valid, scores, -1.0))
    return jax.jit(one)

print("\nper-stage receipts at N=%d (incremental prefixes):" % N, flush=True)
a_, b_, t_, k_ = (params.num_anchors, params.neighbors_per_anchor,
                  max(params.per_anchor_candidates, 1), params.max_hypotheses)
bounds_ms = [
    stage_bound_seconds(compat_degrees_model(N, symmetric=True)) * 1e3,
    stage_bound_seconds(pool_model(N, a_, b_, t_)) * 1e3,
    stage_bound_seconds(solve_model(N, k_), highest=True) * 1e3,
    stage_bound_seconds(scoring_model(N, k_)) * 1e3,
]
names = ["compat", "pool", "solve(XLA)", "score"]
prev = 0.0
for s in range(1, 5):
    fns = upto(s)
    out = fns(P, Q, mask1)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fns(P, Q, mask1)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / reps * 1e3
    d = dt - prev
    prev = dt
    bd = bounds_ms[s - 1]
    print(f"  {names[s-1]:10s} {d:7.2f} ms in-context   bound {bd:6.2f} ms"
          f" -> {bd / max(d, 1e-9):5.2f} of bound", flush=True)
