"""r5 in-context per-stage receipts at the bench operating point (B=128).

Incremental-prefix method (exp_stage_attrib.py), updated to the r5 bench
semantics: mask=None end to end (mask-elided degree kernel), MXU-Gram
compat A/B, SoA solve->score, per-anchor top-4 pool. Prints the stage
table that goes into BASELINE.md.

Usage: python scripts/exp_stages_r5.py [B] [reps]
"""
import functools, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/saccot_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from saccot_tpu.engine import triangles as tri_mod
from saccot_tpu.engine import score as score_mod
from saccot_tpu.engine.svd3 import umeyama, quaternion_from_cross_covariance, rotation_entries_from_quaternion
from saccot_tpu.io.synthetic import correspondence_problem
from saccot_tpu.kernels.compat import degrees_pallas
from saccot_tpu.kernels.score import score_hypotheses_pallas_soa
from saccot_tpu.kernels.solve3 import solve3_pallas_soa
from saccot_tpu.utils.params import SacCotParams

N = 1000
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 40

params = SacCotParams(
    compat_tau=0.03, min_separation=0.05, inlier_tau=0.03,
    num_anchors=256, neighbors_per_anchor=12, max_hypotheses=1024,
    degree_block_rows=256, score_block_k=256, dedup_triangles=False,
    approx_topk=True, per_anchor_candidates=4)
probs = [correspondence_problem(seed=1000 + s, n=N, outlier_ratio=0.8)
         for s in range(B)]
P = jnp.stack([jnp.asarray(p["P"]) for p in probs])
Q = jnp.stack([jnp.asarray(p["Q"]) for p in probs])


def timed(name, fn, *args):
    out = fn(*args); _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    for _ in range(3):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(2):  # min of 2 passes vs tunnel noise
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.time() - t0) / reps * 1e3)
    print(f"{name:>28}: {best:7.2f} ms/batch", flush=True)
    return best


# Null program: dispatch floor.
null = jax.jit(lambda a, b: jnp.sum(a[:, 0, 0] + b[:, 0, 0]))
floor = timed("null(dispatch floor)", null, P, Q)


def upto(stage, mxu=True):
    def one(p, q):
        deg = degrees_pallas(p, q, p, q, params, mxu=mxu)
        if stage == 1:
            return jnp.sum(deg)
        pool = tri_mod.triangle_pool_from_points(p, q, deg, params, impl="pallas")
        if stage == 2:
            return jnp.sum(pool.scores) + jnp.sum(pool.triples)
        r9, t3 = solve3_pallas_soa(p, q, pool.triples)
        if stage == 3:
            return jnp.sum(r9) + jnp.sum(t3)
        scores, counts = score_hypotheses_pallas_soa(
            r9, t3, p, q, params.inlier_tau)
        scores = jnp.where(pool.valid, scores, -1.0)
        best = jnp.argmax(scores)
        if stage == 4:
            return scores[best] * 1.0
        Rb = r9[:, best].reshape(3, 3)
        tb = t3[:, best]
        inl = score_mod.inlier_mask(Rb, tb, p, q, params.inlier_tau)
        for _ in range(params.refine_iters):
            w = inl.astype(jnp.float32)
            n = jnp.sum(w)
            Rf, tf = umeyama(p, q, w=w)
            keep = n >= 3.0
            Rb = jnp.where(keep, Rf, Rb)
            tb = jnp.where(keep, tf, tb)
            inl = score_mod.inlier_mask(Rb, tb, p, q, params.inlier_tau)
        return jnp.sum(inl)
    return jax.jit(lambda a, b: jax.vmap(one)(a, b))


print(f"\nB={B} N={N} K={params.max_hypotheses} (mask=None, SoA)")
t_direct = timed("degrees direct(VPU)", upto(1, mxu=False), P, Q)
prev = 0.0
names = ["degrees MXU-gram", "+pool", "+solve(SoA)", "+score/argmax", "+refine(full)"]
stage_ms = []
for s in range(1, 6):
    dt = timed(names[s - 1], upto(s), P, Q)
    stage_ms.append(dt - prev if s > 1 else dt - floor)
    prev = dt
print(f"\nin-context stages (minus dispatch floor {floor:.2f} ms):")
for name, ms in zip(names, stage_ms):
    print(f"  {name:>18}: {ms:6.2f} ms")
print(f"  degrees mxu vs direct: {stage_ms[0]:.2f} vs {t_direct - floor:.2f} ms")
print(f"  total: {prev:.2f} ms/batch = {B / prev * 1e3:.0f} pairs/s")

# Full register_batch in the same process: the delta vs the deepest prefix
# is the result-packing / champion-extraction tail.
from saccot_tpu.engine.sac_cot import register_batch
fn_full = jax.jit(lambda a, b: register_batch(
    a, b, params, compat_impl="pallas", score_impl="pallas",
    pool_impl="pallas", solve_impl="pallas"))
t_full = timed("register_batch(full)", fn_full, P, Q)
print(f"  tail beyond prefix: {t_full - prev - floor:.2f} ms"
      f"  -> {B / t_full * 1e3:.0f} pairs/s end-to-end")
