"""Sub-stage breakdown of the triangle-pool stage at the bench config.

The pool is the dominant hot stage (~5.2 of ~6.4 ms/batch, exp_hotstages);
this splits it into (a) the fused anchor/top-B Pallas kernel, (b) neighbor
point gathers, (c) candidate scoring, (d) the global top-K reduction, plus
degree/score/solve stage timings, so BASELINE.md can carry per-stage
roofline fractions and the optimization targets the real cost.

Usage: python scripts/exp_pool_breakdown.py
"""

from __future__ import annotations

import dataclasses
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
    from jax import lax

    from saccot_tpu.engine import triangles as tri_mod
    from saccot_tpu.engine.sac_cot import register_batch
    from saccot_tpu.io.synthetic import correspondence_problem
    from saccot_tpu.kernels.compat import degrees_pallas
    from saccot_tpu.kernels.score import score_hypotheses_pallas
    from saccot_tpu.kernels.solve3 import solve3_pallas
    from saccot_tpu.kernels.triangles import anchor_neighbors_pallas
    from saccot_tpu.utils.params import SacCotParams

    N, B = 1000, 32
    params = SacCotParams(
        compat_tau=0.03, min_separation=0.05, inlier_tau=0.03,
        num_anchors=256, neighbors_per_anchor=16, max_hypotheses=1024,
        degree_block_rows=256, score_block_k=256,
        dedup_triangles=False, approx_topk=True,
    )
    A, NB, K = params.num_anchors, params.neighbors_per_anchor, params.max_hypotheses
    probs = [
        correspondence_problem(seed=1000 + s, n=N, outlier_ratio=0.8)
        for s in range(B)
    ]
    P = jnp.stack([jnp.asarray(p["P"]) for p in probs])
    Q = jnp.stack([jnp.asarray(p["Q"]) for p in probs])
    mask = jnp.ones((B, N), jnp.float32)

    def timed(name, fn, *args, reps=50):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        for _ in range(3):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.time() - t0) / reps
        print(f"{name:>42}: {dt * 1e3:7.2f} ms/batch", flush=True)
        return out, dt

    # Stage: degrees.
    deg_fn = jax.jit(jax.vmap(
        lambda p, q, m: degrees_pallas(p, q, p, q, params, mask_rows=m, mask_cols=m)))
    deg, t_deg = timed("degrees (pallas)", deg_fn, P, Q, mask)

    # Pool sub-stage (a): anchors (top_k on degrees) + fused kernel.
    def anchors_and_nbrs(p, q, d, m):
        _, anchors = lax.top_k(d, A)
        return anchor_neighbors_pallas(
            p, q, anchors, NB, params.compat_tau, params.min_separation,
            mask=m, anchor_mask=m[anchors],
        )
    ab_fn = jax.jit(jax.vmap(anchors_and_nbrs))
    (nbr_s, nbr_idx), t_ab = timed("pool.a anchors+topB kernel", ab_fn, P, Q, deg, mask)

    def anchors_only(d):
        return lax.top_k(d, A)[1]
    anc_fn = jax.jit(jax.vmap(anchors_only))
    anchors, t_anc = timed("pool.a1 anchor top_k only", anc_fn, deg)

    # Pool sub-stage (b): neighbor point gathers.
    gat_fn = jax.jit(jax.vmap(lambda p, q, ni: (p[ni], q[ni])))
    (nbr_p, nbr_q), t_gat = timed("pool.b neighbor gathers", gat_fn, P, Q, nbr_idx)

    # Pool sub-stage (c): candidate scoring from gathered neighbors.
    b1, b2 = np.triu_indices(NB, k=1)
    b1 = jnp.asarray(b1, jnp.int32)
    b2 = jnp.asarray(b2, jnp.int32)

    def cand_scores(anchors_, ns, ni, npnts, nq):
        j = ni[:, b1]
        k = ni[:, b2]
        s_jk = tri_mod.pair_scores(
            npnts[:, b1, :], npnts[:, b2, :], nq[:, b1, :], nq[:, b2, :], params)
        s_jk = jnp.where(j != k, s_jk, 0.0)
        sc = ns[:, b1] + ns[:, b2] + s_jk
        i = jnp.broadcast_to(anchors_[:, None], j.shape)
        valid = (ns[:, b1] > 0) & (ns[:, b2] > 0) & (s_jk > 0) & (i != j) & (i != k) & (j != k)
        return jnp.where(valid, sc, -1.0), i, j, k
    cs_fn = jax.jit(jax.vmap(cand_scores))
    (scores, ti, tj, tk), t_cs = timed(
        "pool.c candidate scores", cs_fn, anchors, nbr_s, nbr_idx, nbr_p, nbr_q)

    # Pool sub-stage (d): global top-K reduction + triple gather.
    def topk_stage(sc, i, j, kk):
        flat = sc.reshape(-1)
        top_s, top_i = lax.approx_max_k(flat, K)
        tri = jnp.stack([i.reshape(-1)[top_i], j.reshape(-1)[top_i], kk.reshape(-1)[top_i]], axis=-1)
        return top_s, tri
    tk_fn = jax.jit(jax.vmap(topk_stage))
    _, t_tk = timed("pool.d approx top-K + gather", tk_fn, scores, ti, tj, tk)

    # Whole pool for reference.
    pool_fn = jax.jit(jax.vmap(
        lambda p, q, d, m: tri_mod.triangle_pool_from_points(
            p, q, d, params, mask=m, impl="pallas")))
    pool, t_pool = timed("pool (whole, pallas)", pool_fn, P, Q, deg, mask)

    # Solve + score stages at bench config.
    sv_fn = jax.jit(jax.vmap(solve3_pallas))
    (R, t), t_sv = timed("solve3 (pallas fused)", sv_fn, P, Q, pool.triples)
    sc2_fn = jax.jit(jax.vmap(
        lambda r, tt, p, q, m: score_hypotheses_pallas(
            r, tt, p, q, params.inlier_tau, mask=m)))
    _, t_sc = timed("score (pallas)", sc2_fn, R, t, P, Q, mask)

    full_fn = jax.jit(lambda a, b, m: register_batch(
        a, b, params, mask=m,
        compat_impl="pallas", score_impl="pallas", pool_impl="pallas",
        solve_impl="pallas"))
    _, t_full = timed("FULL estimator (bench config)", full_fn, P, Q, mask)

    print(f"\nstage sum = {1e3*(t_deg+t_pool+t_sv+t_sc):.2f} ms vs full {1e3*t_full:.2f} ms")
    print(f"pool sub-stage sum = {1e3*(t_ab+t_gat+t_cs+t_tk):.2f} ms vs pool {1e3*t_pool:.2f} ms")

    # Roofline fractions at the stage level.
    from saccot_tpu.evaluation.roofline import (
        ChipPeaks, compat_degrees_model, scoring_model, roofline_fraction)
    for nm, model, tt in [
        ("degrees", compat_degrees_model(N, B), t_deg),
        ("scoring", scoring_model(N, K, B), t_sc),
    ]:
        rf = roofline_fraction(model, tt)
        print(f"roofline {nm}: {rf}")


if __name__ == "__main__":
    main()
