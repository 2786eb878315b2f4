"""Full-pipeline timing with the fused solve kernel + packed dedup."""

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

    from saccot_tpu.engine.sac_cot import register_batch
    from saccot_tpu.io.synthetic import correspondence_problem
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

    def run(name, pp, solve):
        fn = jax.jit(
            lambda a, b: register_batch(
                a, b, pp, compat_impl="pallas", score_impl="pallas",
                pool_impl="pallas", solve_impl=solve,
            )
        )
        res = fn(P, Q)
        _ = np.asarray(res.num_inliers)
        reps = 64
        for _ in range(3):
            res = fn(P, Q)
        _ = np.asarray(res.num_inliers)
        t0 = time.time()
        for _ in range(reps):
            res = fn(P, Q)
        _ = np.asarray(res.num_inliers)
        dt = (time.time() - t0) / reps
        T_all = np.asarray(res.T, np.float64)
        ok = sum(
            1 for bb, p in enumerate(probs)
            if se3np.rotation_angle_deg(
                (T_all[bb] @ np.linalg.inv(p["T_gt"]))[:3, :3]) < 5.0
            and np.linalg.norm((T_all[bb] @ np.linalg.inv(p["T_gt"]))[:3, 3]) < 0.05
        )
        print(f"{name:>34}: {dt * 1e3:7.2f} ms/batch  "
              f"{B / dt:8.1f} pairs/s  recall {ok}/{B}", flush=True)

    run("packed dedup, solve=jnp", base, "jnp")
    run("packed dedup, solve=pallas", base, "pallas")
    fast = dataclasses.replace(base, dedup_triangles=False, approx_topk=True)
    run("no-dedup approx, solve=pallas", fast, "pallas")


if __name__ == "__main__":
    main()
