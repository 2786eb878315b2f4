"""Cold-compile breakdown of the bench program (VERDICT r2 weak #2 / next #3).

Measures, per stage and for the full estimator at the bench operating point
(B=32, N=1000, K=1024), the host trace+lower wall time and the backend
compile wall time, with the persistent compilation cache OFF so the numbers
are honestly cold. Prints a table; run on the TPU backend.

Usage: python scripts/exp_compile.py [--impl pallas|jnp] [--stage all|full]
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

    # NO persistent cache: cold numbers.
    import jax.numpy as jnp

    from saccot_tpu.engine import triangles as tri_mod
    from saccot_tpu.engine.sac_cot import register_batch
    from saccot_tpu.io.synthetic import correspondence_problem
    from saccot_tpu.kernels.compat import degrees_pallas
    from saccot_tpu.kernels.score import score_hypotheses_pallas
    from saccot_tpu.kernels.solve3 import solve3_pallas
    from saccot_tpu.utils.params import SacCotParams

    impl = "pallas"
    only = "all"
    for a in sys.argv[1:]:
        if a.startswith("--impl"):
            impl = a.split("=")[1] if "=" in a else "pallas"
        if a.startswith("--stage"):
            only = a.split("=")[1]

    N, B, K = 1000, 32, 1024
    params = SacCotParams(
        compat_tau=0.03, min_separation=0.05, inlier_tau=0.03,
        num_anchors=256, neighbors_per_anchor=16, max_hypotheses=K,
        degree_block_rows=256, score_block_k=256,
        dedup_triangles=False, approx_topk=True,
    )
    probs = [
        correspondence_problem(seed=1000 + s, n=N, outlier_ratio=0.8)
        for s in range(B)
    ]
    P = jnp.stack([jnp.asarray(p["P"]) for p in probs])
    Q = jnp.stack([jnp.asarray(p["Q"]) for p in probs])
    mask = jnp.ones((B, N), jnp.float32)

    def cold(name, fn, *args):
        t0 = time.time()
        lowered = jax.jit(fn).lower(*args)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        out = compiled(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        t3 = time.time()
        print(
            f"{name:>38}: trace+lower {t1 - t0:7.1f}s  compile {t2 - t1:7.1f}s"
            f"  first-run {t3 - t2:6.1f}s",
            flush=True,
        )
        return out

    if only in ("all",):
        deg = cold(
            "degrees (pallas, vmap B)",
            jax.vmap(lambda p, q, m: degrees_pallas(
                p, q, p, q, params, mask_rows=m, mask_cols=m)),
            P, Q, mask,
        )
        pool = cold(
            f"pool ({impl}, vmap B)",
            jax.vmap(lambda p, q, d, m: tri_mod.triangle_pool_from_points(
                p, q, d, params, mask=m, impl=impl)),
            P, Q, deg, mask,
        )
        R, t = cold(
            "solve3 (pallas, vmap B)",
            jax.vmap(solve3_pallas),
            P, Q, pool.triples,
        )
        cold(
            "score (pallas, vmap B)",
            jax.vmap(lambda r, tt, p, q, m: score_hypotheses_pallas(
                r, tt, p, q, params.inlier_tau, mask=m)),
            R, t, P, Q, mask,
        )

    cold(
        f"FULL register_batch ({impl} x4)",
        lambda a, b, m: register_batch(
            a, b, params, mask=m,
            compat_impl=impl, score_impl=impl, pool_impl=impl,
            solve_impl=impl,
        ),
        P, Q, mask,
    )


if __name__ == "__main__":
    main()
