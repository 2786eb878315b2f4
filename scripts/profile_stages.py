"""Per-stage timing of the SAC-COT estimator on the real backend.

Times each stage of the jitted estimator separately (degrees, triangle
pool, 3-pt solve, scoring, refine) plus the full pipeline, at the bench
operating point (N=1000, K=1024, batch 16). Each stage is jitted standalone
with its inputs precomputed on device, so stage times include only that
stage's work. Timing barrier is an explicit device->host transfer (see
BASELINE.md round-1 notes).

Usage: python scripts/profile_stages.py [N] [BATCH]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# Run as `python scripts/profile_stages.py` from the repo root: the script
# dir (not the cwd) lands on sys.path, so add the repo root explicitly.
# (Do NOT use PYTHONPATH for this — it breaks the environment's backend
# plugin registration via sitecustomize.)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/saccot_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from saccot_tpu.engine import compat as compat_mod
    from saccot_tpu.engine import score as score_mod
    from saccot_tpu.engine import triangles as tri_mod
    from saccot_tpu.engine.sac_cot import register_batch
    from saccot_tpu.engine.svd3 import umeyama
    from saccot_tpu.io.synthetic import correspondence_problem
    from saccot_tpu.utils.params import SacCotParams

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    params = SacCotParams(
        compat_tau=0.03,
        min_separation=0.05,
        inlier_tau=0.03,
        num_anchors=256,
        neighbors_per_anchor=16,
        max_hypotheses=1024,
        degree_block_rows=256,
        score_block_k=256,
    )
    print(f"backend: {jax.default_backend()}  N={N} B={B}", flush=True)

    probs = [
        correspondence_problem(seed=1000 + s, n=N, outlier_ratio=0.8, noise=0.004)
        for s in range(B)
    ]
    P = jnp.stack([jnp.asarray(p["P"]) for p in probs])
    Q = jnp.stack([jnp.asarray(p["Q"]) for p in probs])
    mask = jnp.ones((B, N), jnp.float32)

    def timed(name, fn, *args, reps=20):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])  # barrier
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.time() - t0) / reps
        print(f"{name:>28}: {dt * 1e3 / B:8.3f} ms/pair  ({dt * 1e3:7.2f} ms/batch)", flush=True)
        return out

    # Stage 1: degrees
    deg_fn = jax.jit(
        jax.vmap(
            lambda p, q, m: compat_mod.degrees(
                p, q, p, q, params, mask_rows=m, mask_cols=m,
                block_rows=min(params.degree_block_rows, N),
            )
        )
    )
    deg = timed("degrees", deg_fn, P, Q, mask)

    # Stage 2: triangle pool
    pool_fn = jax.jit(
        jax.vmap(lambda p, q, d, m: tri_mod.triangle_pool_from_points(p, q, d, params, mask=m))
    )
    pool = timed("triangle pool", pool_fn, P, Q, deg, mask)

    # Stage 3: batched 3-pt solve
    def solve(p, q, triples):
        return umeyama(p[triples], q[triples])

    rt_fn = jax.jit(jax.vmap(solve))
    R, t = timed("3-pt solve (umeyama)", rt_fn, P, Q, pool.triples)

    # Stage 4: scoring
    score_fn = jax.jit(
        jax.vmap(
            lambda r, tt, p, q, m: score_mod.score_hypotheses(
                r, tt, p, q, params.inlier_tau, mask=m, mode=params.scoring,
                block_k=params.score_block_k,
            )
        )
    )
    timed("scoring (jnp)", score_fn, R, t, P, Q, mask)

    # Full pipeline
    full_fn = jax.jit(lambda a, b, m: register_batch(a, b, params, mask=m))
    timed("FULL register_batch", full_fn, P, Q, mask, reps=10)

    # Pool micro-breakdown: rows recompute vs pool-from-rows
    A = min(params.num_anchors, N)

    def rows_only(p, q, d, m):
        _, anchors = jax.lax.top_k(d, A)
        return compat_mod.score_block(
            p[anchors], q[anchors], p, q, params,
            row_ids=anchors, mask_rows=m[anchors], mask_cols=m,
        )

    rows_fn = jax.jit(jax.vmap(rows_only))
    timed("pool: anchor rows only", rows_fn, P, Q, deg, mask)


if __name__ == "__main__":
    main()
