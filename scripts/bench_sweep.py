"""Batch-size / impl sweep of steady-state registration throughput on TPU.

Explores the bench operating point (N=1000, K=1024): batch size and
kernel-impl combinations, printing steady-state pairs/s/chip for each.
Usage: python scripts/bench_sweep.py [batches...]
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

    from saccot_tpu.engine.sac_cot import register_batch
    from saccot_tpu.io.synthetic import correspondence_problem
    from saccot_tpu.utils.params import SacCotParams

    N = 1000
    batches = [int(a) for a in sys.argv[1:]] or [16, 32, 64, 128]
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
    print(f"backend: {jax.default_backend()}", flush=True)

    maxB = max(batches)
    probs = [
        correspondence_problem(seed=1000 + s, n=N, outlier_ratio=0.8, noise=0.004)
        for s in range(maxB)
    ]
    P_all = jnp.stack([jnp.asarray(p["P"]) for p in probs])
    Q_all = jnp.stack([jnp.asarray(p["Q"]) for p in probs])

    for impl in [("pallas", "pallas", "pallas")]:
        ci, si, pi = impl
        for B in batches:
            P, Q = P_all[:B], Q_all[:B]
            fn = jax.jit(
                lambda a, b: register_batch(
                    a, b, params, compat_impl=ci, score_impl=si, pool_impl=pi
                )
            )
            t0 = time.time()
            res = fn(P, Q)
            _ = np.asarray(res.num_inliers)
            c = time.time() - t0
            reps = max(8, min(64, 2048 // B))
            for _ in range(3):
                res = fn(P, Q)
            _ = np.asarray(res.num_inliers)
            t0 = time.time()
            for _ in range(reps):
                res = fn(P, Q)
            _ = np.asarray(res.num_inliers)
            dt = time.time() - t0
            rate = B * reps / dt
            print(
                f"impl={ci:>6} B={B:4d}: {rate:9.1f} pairs/s/chip "
                f"({dt / reps * 1e3:7.2f} ms/batch, compile {c:.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
