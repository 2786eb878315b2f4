"""Descriptor robustness A/B: hard vs soft (interpolated) binning
(VERDICT r4 next #5).

Sweeps point noise on the structured two-view generator and measures, for
SHOT and FPFH with hard vs quadrilinear/linear-interpolated binning:
  - matching precision: fraction of mutual-filtered correspondences that
    are geometrically correct under the planted transform;
  - end-to-end registration success (SAC-COT on the matches).
The noise level where hard binning's matching collapses vs soft is the
number VERDICT asked for; the winner is wired as PipelineConfig's default.

Usage: python scripts/exp_shot_soft.py [n_pairs]
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/saccot_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from saccot_tpu.features.pipeline import (
    PipelineConfig, extract_scan_features, register_scan_features)
from saccot_tpu.io.synthetic import two_view_pair
from saccot_tpu.utils import se3np

n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
NOISE = [0.002, 0.005, 0.01, 0.02]

def run(descriptor, soft, noise, seed):
    pair = two_view_pair(seed=seed, n_points=4000, overlap=0.8, noise=noise)
    cfg = PipelineConfig(descriptor=descriptor, descriptor_soft=soft,
                         max_keypoints=512, max_correspondences=512)
    fs = extract_scan_features(jnp.asarray(pair["source"]), cfg)
    ft = extract_scan_features(jnp.asarray(pair["target"]), cfg)
    out = register_scan_features(fs, ft, cfg)
    # Matching precision: correspondences within 4 mesh resolutions of the
    # planted map (matches are compacted, so the first n rows are valid).
    P = np.asarray(out.corr_P); Q = np.asarray(out.corr_Q)
    n = int(out.num_correspondences)
    T = pair["T_gt"]
    mapped = P[:n] @ T[:3, :3].T + T[:3, 3]
    dist = np.linalg.norm(mapped - Q[:n], axis=-1)
    tol = 4.0 * float(out.resolution)
    prec = float((dist < tol).mean()) if n else 0.0
    E = np.asarray(out.registration.T, np.float64) @ np.linalg.inv(T)
    ok = (se3np.rotation_angle_deg(E[:3, :3]) < 5.0
          and np.linalg.norm(E[:3, 3]) < 0.05)
    return prec, ok


print(f"{'descriptor':>6s} {'bin':>5s} " +
      " ".join(f"noise={n:<6g}" for n in NOISE) + "   (match precision | recall)")
for descriptor in ["shot", "fpfh"]:
    for soft in [False, True]:
        cols = []
        for noise in NOISE:
            precs, oks = [], []
            for s in range(n_pairs):
                p, o = run(descriptor, soft, noise, seed=100 + s)
                precs.append(p); oks.append(o)
            cols.append(f"{np.mean(precs):.3f}|{np.mean(oks):.2f}  ")
        tag = "soft" if soft else "hard"
        print(f"{descriptor:>6s} {tag:>5s} " + " ".join(cols), flush=True)
