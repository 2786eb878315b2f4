"""In-context per-stage attribution of the estimator (one fused program).

Builds successive prefixes of the register_batch pipeline (degrees -> pool
-> solve -> score/argmax -> refine) as separate jitted programs whose
incremental time differences give honest in-context stage costs — unlike
standalone stage timings, which carry ~0.5-0.8 ms of dispatch inflation
each. Source of the per-stage receipts in BASELINE.md. Also probes the
per-batch dispatch overhead by running two batches inside one executable.

Usage: python scripts/exp_stage_attrib.py   (run on the TPU backend)
"""

import dataclasses, sys, time
import numpy as np
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/saccot_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax
from saccot_tpu.engine import triangles as tri_mod
from saccot_tpu.engine import score as score_mod
from saccot_tpu.engine.svd3 import umeyama, transform_from_rt
from saccot_tpu.io.synthetic import correspondence_problem
from saccot_tpu.kernels.compat import degrees_pallas
from saccot_tpu.kernels.score import score_hypotheses_pallas
from saccot_tpu.kernels.solve3 import solve3_pallas
from saccot_tpu.utils.params import SacCotParams

N, B = 1000, 64  # the bench operating point (r3)
params = SacCotParams(compat_tau=0.03, min_separation=0.05, inlier_tau=0.03,
    num_anchors=256, neighbors_per_anchor=16, max_hypotheses=1024,
    degree_block_rows=256, score_block_k=256, dedup_triangles=False, approx_topk=True,
    per_anchor_candidates=4)
probs = [correspondence_problem(seed=1000+s, n=N, outlier_ratio=0.8) for s in range(B)]
P = jnp.stack([jnp.asarray(p["P"]) for p in probs])
Q = jnp.stack([jnp.asarray(p["Q"]) for p in probs])
mask = jnp.ones((B, N), jnp.float32)

def timed(name, fn, reps=60):
    out = fn(P, Q, mask); _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    for _ in range(3): out = fn(P, Q, mask)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(reps): out = fn(P, Q, mask)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time()-t0)/reps*1e3
    print(f"{name:>26}: {dt:7.2f} ms/batch", flush=True)
    return dt

def upto(stage):
    def one(p, q, m):
        deg = degrees_pallas(p, q, p, q, params, mask_rows=m, mask_cols=m)
        if stage == 1: return jnp.sum(deg)
        pool = tri_mod.triangle_pool_from_points(p, q, deg, params, mask=m, impl="pallas")
        if stage == 2: return jnp.sum(pool.scores) + jnp.sum(pool.triples)
        R, t = solve3_pallas(p, q, pool.triples)
        if stage == 3: return jnp.sum(R) + jnp.sum(t)
        scores, counts = score_hypotheses_pallas(R, t, p, q, params.inlier_tau, mask=m)
        scores = jnp.where(pool.valid, scores, -1.0)
        best = jnp.argmax(scores)
        if stage == 4: return scores[best] * 1.0
        Rb, tb = R[best], t[best]
        inl = score_mod.inlier_mask(Rb, tb, p, q, params.inlier_tau, mask=m)
        for _ in range(params.refine_iters):
            w = inl.astype(jnp.float32) * m
            n = jnp.sum(w)
            Rf, tf = umeyama(p, q, w=w)
            keep = n >= 3.0
            Rb = jnp.where(keep, Rf, Rb)
            tb = jnp.where(keep, tf, tb)
            inl = score_mod.inlier_mask(Rb, tb, p, q, params.inlier_tau, mask=m)
        return jnp.sum(inl)
    return jax.jit(lambda a, b, m: jax.vmap(one)(a, b, m))

prev = 0.0
names = ["degrees", "+pool", "+solve", "+score/argmax", "+refine(full)"]
for s in range(1, 6):
    dt = timed(names[s-1], upto(s))
    print(f"{'delta':>26}: {dt-prev:7.2f} ms", flush=True)
    prev = dt

# dispatch overhead probe: run two batches inside one executable
def two(p, q, m):
    f = upto(5)
    return None
def one_full(p, q, m):
    return upto(5)
fn5 = upto(5)
def dbl(a, b, m):
    r1 = fn5(a, b, m)
    r2 = fn5(a + 1e-6, b, m)
    return r1 + r2
fnd = jax.jit(dbl)
out = fnd(P, Q, mask); _=np.asarray(out)
t0=time.time()
for _ in range(60): out = fnd(P, Q, mask)
_=np.asarray(out)
print(f"{'double-batch program':>26}: {(time.time()-t0)/60*1e3:7.2f} ms (/2 = per batch)", flush=True)
