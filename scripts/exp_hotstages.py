"""One-off experiments on the two hottest stages (pool, 3-pt solve).

E1: pool variants (dedup on/off x exact/approx top-k)
E2: solve = gather + quat split; one-hot MXU gather alternative
E3: full pipeline with the fastest settings + recall check

Usage: python scripts/exp_hotstages.py
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

    from saccot_tpu.engine import triangles as tri_mod
    from saccot_tpu.engine.sac_cot import register_batch
    from saccot_tpu.engine.svd3 import umeyama
    from saccot_tpu.io.synthetic import correspondence_problem
    from saccot_tpu.kernels.compat import degrees_pallas
    from saccot_tpu.utils import se3np
    from saccot_tpu.utils.params import SacCotParams

    N, B = 1000, 32
    base = SacCotParams(
        compat_tau=0.03, min_separation=0.05, inlier_tau=0.03,
        num_anchors=256, neighbors_per_anchor=16, max_hypotheses=1024,
        degree_block_rows=256, score_block_k=256,
    )
    probs = [
        correspondence_problem(seed=1000 + s, n=N, outlier_ratio=0.8, noise=0.004)
        for s in range(B)
    ]
    P = jnp.stack([jnp.asarray(p["P"]) for p in probs])
    Q = jnp.stack([jnp.asarray(p["Q"]) for p in probs])
    mask = jnp.ones((B, N), jnp.float32)

    def timed(name, fn, *args, reps=30):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.time() - t0) / reps
        print(f"{name:>34}: {dt * 1e3:7.2f} ms/batch", flush=True)
        return out

    deg = jax.jit(
        jax.vmap(lambda p, q, m: degrees_pallas(p, q, p, q, base, mask_rows=m, mask_cols=m))
    )(P, Q, mask)

    # E1: pool variants
    pools = {}
    for name, dd, ap in [
        ("pool dedup=T exact", True, False),
        ("pool dedup=F exact", False, False),
        ("pool dedup=T approx", True, True),
        ("pool dedup=F approx", False, True),
    ]:
        pp = dataclasses.replace(base, dedup_triangles=dd, approx_topk=ap)
        fn = jax.jit(
            jax.vmap(
                lambda p, q, d, m, _pp=pp: tri_mod.triangle_pool_from_points(
                    p, q, d, _pp, mask=m, impl="pallas"
                )
            )
        )
        pools[name] = timed(name, fn, P, Q, deg, mask)

    pool = pools["pool dedup=T exact"]

    # E2: solve split
    gather_fn = jax.jit(jax.vmap(lambda p, q, tri: (p[tri], q[tri])))
    tp, tq = timed("solve: gather only", gather_fn, P, Q, pool.triples)
    quat_fn = jax.jit(jax.vmap(lambda a, b: umeyama(a, b)))
    timed("solve: quat only (pre-gathered)", quat_fn, tp, tq)

    def onehot_gather(p, q, tri):
        # [K,3] indices -> one-hot [3K, N] -> MXU matmul gather.
        K = tri.shape[0]
        oh = jax.nn.one_hot(tri.reshape(-1), p.shape[0], dtype=jnp.float32)
        tp = (oh @ p).reshape(K, 3, 3)
        tq = (oh @ q).reshape(K, 3, 3)
        return tp, tq

    oh_fn = jax.jit(jax.vmap(onehot_gather))
    tp2, tq2 = timed("solve: one-hot MXU gather", oh_fn, P, Q, pool.triples)
    err = float(jnp.max(jnp.abs(tp2 - tp)))
    print(f"  one-hot gather max err: {err:.2e}", flush=True)

    full_gather_fn = jax.jit(
        jax.vmap(lambda p, q, tri: umeyama(p[tri], q[tri]))
    )
    timed("solve full: gather+quat", full_gather_fn, P, Q, pool.triples)
    full_oh_fn = jax.jit(jax.vmap(lambda p, q, tri: umeyama(*onehot_gather(p, q, tri))))
    timed("solve full: onehot+quat", full_oh_fn, P, Q, pool.triples)

    # E3: full pipeline fastest combo + recall
    for name, dd, ap in [("full base", True, False), ("full fast-pool", False, True)]:
        pp = dataclasses.replace(base, dedup_triangles=dd, approx_topk=ap)
        fn = jax.jit(
            lambda a, b, m, _pp=pp: register_batch(
                a, b, _pp, mask=m,
                compat_impl="pallas", score_impl="pallas", pool_impl="pallas",
                solve_impl="pallas",
            )
        )
        res = timed(name, fn, P, Q, mask)
        T_all = np.asarray(res.T, np.float64)
        ok = 0
        for bb, p in enumerate(probs):
            E = T_all[bb] @ np.linalg.inv(p["T_gt"])
            if se3np.rotation_angle_deg(E[:3, :3]) < 5.0 and np.linalg.norm(E[:3, 3]) < 0.05:
                ok += 1
        print(f"  recall: {ok}/{B}", flush=True)


if __name__ == "__main__":
    main()
