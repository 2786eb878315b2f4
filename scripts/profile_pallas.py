"""Per-stage timing of the estimator with the Pallas kernel paths enabled.

Like scripts/profile_stages.py but exercising the production (pallas) impls
and the refine stage, at a configurable batch. Stages are jitted standalone;
the sum of stages slightly exceeds the fused pipeline (intermediate
transfers), so treat deltas, not totals, as the signal.

Usage: python scripts/profile_pallas.py [N] [BATCH]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/saccot_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from saccot_tpu.engine import score as score_mod
    from saccot_tpu.engine import triangles as tri_mod
    from saccot_tpu.engine.sac_cot import register_batch
    from saccot_tpu.engine.svd3 import umeyama
    from saccot_tpu.io.synthetic import correspondence_problem
    from saccot_tpu.kernels.compat import degrees_pallas
    from saccot_tpu.kernels.score import score_hypotheses_pallas
    from saccot_tpu.utils.params import SacCotParams

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
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

    def timed(name, fn, *args, reps=30):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])  # barrier
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.time() - t0) / reps
        print(f"{name:>28}: {dt * 1e3 / B:8.4f} ms/pair  ({dt * 1e3:7.2f} ms/batch)", flush=True)
        return out

    deg_fn = jax.jit(
        jax.vmap(lambda p, q, m: degrees_pallas(p, q, p, q, params, mask_rows=m, mask_cols=m))
    )
    deg = timed("degrees (pallas)", deg_fn, P, Q, mask)

    pool_fn = jax.jit(
        jax.vmap(
            lambda p, q, d, m: tri_mod.triangle_pool_from_points(
                p, q, d, params, mask=m, impl="pallas"
            )
        )
    )
    pool = timed("triangle pool (pallas)", pool_fn, P, Q, deg, mask)

    rt_fn = jax.jit(jax.vmap(lambda p, q, tri: umeyama(p[tri], q[tri])))
    R, t = timed("3-pt solve (quat)", rt_fn, P, Q, pool.triples)

    score_fn = jax.jit(
        jax.vmap(
            lambda r, tt, p, q, m: score_hypotheses_pallas(
                r, tt, p, q, params.inlier_tau, mask=m, mode=params.scoring
            )
        )
    )
    timed("scoring (pallas)", score_fn, R, t, P, Q, mask)

    # Refine stage (argmax + 2 weighted re-fits), isolated.
    def refine(r, tt, p, q, m, scores):
        best = jnp.argmax(scores)
        Rb, tb = r[best], tt[best]
        inl = score_mod.inlier_mask(Rb, tb, p, q, params.inlier_tau, mask=m)
        for _ in range(params.refine_iters):
            w = inl.astype(jnp.float32) * m
            Rf, tf = umeyama(p, q, w=w)
            keep = jnp.sum(w) >= 3.0
            Rb = jnp.where(keep, Rf, Rb)
            tb = jnp.where(keep, tf, tb)
            inl = score_mod.inlier_mask(Rb, tb, p, q, params.inlier_tau, mask=m)
        return Rb, tb, inl

    scores0 = jnp.where(pool.valid, jnp.ones_like(pool.scores), -1.0)
    ref_fn = jax.jit(jax.vmap(refine))
    timed("refine (argmax + 2 refits)", ref_fn, R, t, P, Q, mask, scores0)

    full_fn = jax.jit(
        lambda a, b, m: register_batch(
            a, b, params, mask=m,
            compat_impl="pallas", score_impl="pallas", pool_impl="pallas",
        )
    )
    timed("FULL register_batch", full_fn, P, Q, mask, reps=30)


if __name__ == "__main__":
    main()
