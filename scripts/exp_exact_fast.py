"""Exact-vs-fast recall evidence at scene scale (VERDICT r3 next #7).

Co-runs the estimator in its exact configuration (dedup + exact top-k, no
per-anchor candidate cap) and its fast configuration (dedup off +
approx_topk + per_anchor_candidates=4) on:

  1. the `threedmatch` driver config's operating point (N=2048, K=2048,
     90% outliers, 32 pairs), and
  2. the on-disk external-3DMatch fixture scene (per-fragment .npz
     descriptors + gt.log through cli/external.run_external).

Reports recall + throughput for both variants of both; recall parity is
the claim being evidenced (BASELINE.md).

Usage: python scripts/exp_exact_fast.py   (TPU backend)
"""
import dataclasses
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/saccot_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from saccot_tpu.cli.configs import CONFIGS
from saccot_tpu.engine.sac_cot import register_batch
from saccot_tpu.evaluation.metrics import is_registered
from saccot_tpu.io.synthetic import correspondence_problem
from saccot_tpu.utils.params import SacCotParams


def variants(params: SacCotParams):
    exact = dataclasses.replace(
        params, dedup_triangles=True, approx_topk=False, per_anchor_candidates=0
    )
    fast = dataclasses.replace(
        params, dedup_triangles=False, approx_topk=True, per_anchor_candidates=4
    )
    return {"exact": exact, "fast": fast}


def run_threedmatch():
    cfg = CONFIGS["threedmatch"]
    probs = [
        correspondence_problem(
            seed=cfg.seed + s, n=cfg.n_corr, outlier_ratio=cfg.outlier_ratio,
            noise=cfg.noise,
        )
        for s in range(cfg.n_pairs)
    ]
    B = 8
    print(f"threedmatch point: N={cfg.n_corr} K={cfg.params.max_hypotheses} "
          f"outliers={cfg.outlier_ratio} pairs={cfg.n_pairs}")
    for name, params in variants(cfg.params).items():
        fn = jax.jit(lambda a, b, params=params: register_batch(
            a, b, params, compat_impl="pallas", score_impl="pallas",
            pool_impl="pallas", solve_impl="pallas"))
        hits, t_total = 0, 0.0
        for s0 in range(0, cfg.n_pairs, B):
            chunk = probs[s0:s0 + B]
            chunk = chunk + [chunk[-1]] * (B - len(chunk))
            Pa = jnp.stack([jnp.asarray(p["P"]) for p in chunk])
            Qa = jnp.stack([jnp.asarray(p["Q"]) for p in chunk])
            if s0 == 0:
                _ = np.asarray(fn(Pa, Qa).num_inliers)  # warm
            t0 = time.time()
            res = fn(Pa, Qa)
            T = np.asarray(res.T, np.float64)
            t_total += time.time() - t0
            for k in range(B):
                if s0 + k < cfg.n_pairs:
                    hits += is_registered(
                        T[k], probs[s0 + k]["T_gt"],
                        cfg.rot_thresh_deg, cfg.trans_thresh)
        print(f"  {name:5s}: recall {hits / cfg.n_pairs:.3f}  "
              f"{cfg.n_pairs / t_total:7.1f} pairs/s (incl. host loop)")


def run_external_fixture():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from pathlib import Path

    from test_cli_external import _write_scene
    from saccot_tpu.cli.external import run_external

    with tempfile.TemporaryDirectory() as td:
        frag_dir, gt_path, pairs = _write_scene(Path(td))
        base = SacCotParams(
            compat_tau=0.05, min_separation=0.1, inlier_tau=0.05,
            num_anchors=128, neighbors_per_anchor=12, max_hypotheses=512,
            degree_block_rows=128,
        )
        print(f"external fixture: {len(pairs)} gt pairs, 4 fragments")
        for name, params in variants(base).items():
            out = run_external(frag_dir, gt_path, params=params,
                               max_correspondences=256, batch=4)
            print(f"  {name:5s}: recall {out['recall']:.3f}  "
                  f"mean_inliers {out['mean_inliers']:.0f}  "
                  f"{out['pairs_per_sec']:.1f} pairs/s")


if __name__ == "__main__":
    run_threedmatch()
    run_external_fixture()
