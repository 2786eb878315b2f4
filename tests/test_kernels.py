"""Pallas kernel parity vs the jnp reference paths (SURVEY.md section 4.1).

Run in interpret mode on the CPU backend — identical kernel logic, bit-level
semantics; the compiled TPU path is exercised by bench.py and the verify
drives.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from saccot_tpu.engine import compat as jcompat
from saccot_tpu.engine import score as jscore
from saccot_tpu.engine.sac_cot import register_pair
from saccot_tpu.io.synthetic import correspondence_problem
from saccot_tpu.kernels.compat import degrees_pallas
from saccot_tpu.kernels.score import score_hypotheses_pallas
from saccot_tpu.utils import se3np
from saccot_tpu.utils.params import SacCotParams

PARAMS = SacCotParams(
    compat_tau=0.03, min_separation=0.05, inlier_tau=0.03,
    num_anchors=64, neighbors_per_anchor=10, max_hypotheses=256,
)


@pytest.fixture(scope="module")
def prob():
    return correspondence_problem(seed=31, n=300, outlier_ratio=0.5)


def test_degrees_pallas_matches_jnp(prob):
    P, Q = jnp.asarray(prob["P"]), jnp.asarray(prob["Q"])
    ref = jcompat.degrees(P, Q, P, Q, PARAMS)
    got = degrees_pallas(P, Q, P, Q, PARAMS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_degrees_pallas_mask_and_offset(prob):
    P, Q = jnp.asarray(prob["P"]), jnp.asarray(prob["Q"])
    mask = np.ones(300, np.float32)
    mask[200:] = 0
    mask = jnp.asarray(mask)
    # Row-sharded call: rows 100:300 with global offset 100 must equal the
    # corresponding slice of the full computation.
    ref = jcompat.degrees(P, Q, P, Q, PARAMS, mask_rows=mask, mask_cols=mask)
    got = degrees_pallas(
        P[100:], Q[100:], P, Q, PARAMS,
        row_offset=100, mask_rows=mask[100:], mask_cols=mask,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref)[100:], rtol=1e-5, atol=1e-4)


def test_score_pallas_matches_jnp(prob, rng):
    K = 100
    Rs, ts = [], []
    for _ in range(K):
        T = se3np.random_transform(rng, max_angle_rad=0.4, max_trans=0.2)
        Rs.append(T[:3, :3]); ts.append(T[:3, 3])
    Rs = jnp.asarray(np.stack(Rs).astype(np.float32))
    ts = jnp.asarray(np.stack(ts).astype(np.float32))
    P, Q = jnp.asarray(prob["P"]), jnp.asarray(prob["Q"])
    mask = jnp.asarray((np.arange(300) < 250).astype(np.float32))

    ref_s, ref_c = jscore.score_hypotheses(Rs, ts, P, Q, 0.03, mask=mask, mode="weighted")
    got_s, got_c = score_hypotheses_pallas(Rs, ts, P, Q, 0.03, mask=mask, mode="weighted")
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(ref_c))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-4, atol=1e-3)


def test_register_pair_pallas_impl_matches(prob):
    P, Q = jnp.asarray(prob["P"]), jnp.asarray(prob["Q"])
    ref = register_pair(P, Q, PARAMS)
    got = register_pair(
        P, Q, PARAMS, compat_impl="pallas", score_impl="pallas", pool_impl="pallas"
    )
    E = np.asarray(got.T, np.float64) @ np.linalg.inv(np.asarray(ref.T, np.float64))
    assert se3np.rotation_angle_deg(E[:3, :3]) < 0.1
    assert int(got.num_inliers) == int(ref.num_inliers)


def test_anchor_neighbors_pallas_matches_topk(prob):
    from jax import lax

    from saccot_tpu.kernels.triangles import anchor_neighbors_pallas

    P, Q = jnp.asarray(prob["P"]), jnp.asarray(prob["Q"])
    N = P.shape[0]
    mask = jnp.asarray((np.arange(N) < 260).astype(np.float32))
    A, B = 64, 10
    deg = jcompat.degrees(P, Q, P, Q, PARAMS, mask_rows=mask, mask_cols=mask)
    _, anchors = lax.top_k(deg, A)

    rows = jcompat.score_block(
        P[anchors], Q[anchors], P, Q, PARAMS,
        row_ids=anchors, mask_rows=mask[anchors], mask_cols=mask,
    )
    ref_s, ref_i = lax.top_k(rows, B)
    got_s, got_i = anchor_neighbors_pallas(
        P, Q, anchors, B, PARAMS.compat_tau, PARAMS.min_separation,
        mask=mask, anchor_mask=mask[anchors],
    )
    # Scores: the kernel uses the direct (a-b)^2 distance form, the XLA path
    # the f32 Gram trick — equal up to rounding.
    # (rounding of the ~1e-6 distance noise is amplified by 1/tau ~ 33x).
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), rtol=1e-4, atol=2e-4)
    # Indices: identical wherever the score is not in a rounding-level tie
    # with its rank neighbors (ties are broken on ulp-level score diffs).
    ref_sn, got_in = np.asarray(ref_s), np.asarray(got_i)
    tie = np.zeros_like(ref_sn, dtype=bool)
    tie[:, :-1] |= np.abs(ref_sn[:, :-1] - ref_sn[:, 1:]) < 2e-4
    tie[:, 1:] |= tie[:, :-1]
    stable = ~tie
    np.testing.assert_array_equal(got_in[stable], np.asarray(ref_i)[stable])


def test_triangle_pool_pallas_impl_matches(prob):
    from saccot_tpu.engine import triangles as tri_mod

    P, Q = jnp.asarray(prob["P"]), jnp.asarray(prob["Q"])
    deg = jcompat.degrees(P, Q, P, Q, PARAMS)
    ref = tri_mod.triangle_pool_from_points(P, Q, deg, PARAMS)
    got = tri_mod.triangle_pool_from_points(P, Q, deg, PARAMS, impl="pallas")
    # The ranked pools must agree as sets on all clearly-valid triangles
    # (score-tied tail entries may order differently across the two
    # distance formulations).
    ref_set = {tuple(t) for t, v in zip(np.asarray(ref.triples), np.asarray(ref.valid)) if v}
    got_set = {tuple(t) for t, v in zip(np.asarray(got.triples), np.asarray(got.valid)) if v}
    overlap = len(ref_set & got_set) / max(1, len(ref_set))
    assert overlap > 0.95, f"pool overlap {overlap:.3f}"
    np.testing.assert_allclose(
        np.sort(np.asarray(got.scores))[::-1][:64],
        np.sort(np.asarray(ref.scores))[::-1][:64],
        rtol=1e-4, atol=5e-4,
    )


def test_solve3_pallas_matches_umeyama(prob, rng):
    from saccot_tpu.engine.svd3 import umeyama
    from saccot_tpu.kernels.solve3 import solve3_pallas

    P, Q = jnp.asarray(prob["P"]), jnp.asarray(prob["Q"])
    N = P.shape[0]
    K = 200  # non-multiple of the tile to exercise padding
    triples = jnp.asarray(
        np.stack([rng.choice(N, size=3, replace=False) for _ in range(K)]),
        jnp.int32,
    )
    R_ref, t_ref = umeyama(P[triples], Q[triples])
    R_got, t_got = solve3_pallas(P, Q, triples)
    np.testing.assert_allclose(np.asarray(R_got), np.asarray(R_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_ref), atol=2e-5)
    # Proper rotations throughout.
    det = np.linalg.det(np.asarray(R_got, np.float64))
    np.testing.assert_allclose(det, 1.0, atol=1e-4)


def test_register_pair_solve_pallas_matches(prob):
    P, Q = jnp.asarray(prob["P"]), jnp.asarray(prob["Q"])
    ref = register_pair(P, Q, PARAMS)
    got = register_pair(
        P, Q, PARAMS, compat_impl="pallas", score_impl="pallas",
        pool_impl="pallas", solve_impl="pallas",
    )
    E = np.asarray(got.T, np.float64) @ np.linalg.inv(np.asarray(ref.T, np.float64))
    assert se3np.rotation_angle_deg(E[:3, :3]) < 0.1
    assert int(got.num_inliers) == int(ref.num_inliers)


def test_anchor_neighbors_pallas_candidates(prob):
    """emit_candidates=True: in-kernel candidate triangle scores (one-hot
    coordinate extraction + on-chip s_jk) must match the XLA formulation
    computed from the kernel's own selections."""
    from jax import lax

    from saccot_tpu.engine import triangles as tri_mod
    from saccot_tpu.kernels.triangles import anchor_neighbors_pallas

    P, Q = jnp.asarray(prob["P"]), jnp.asarray(prob["Q"])
    N = P.shape[0]
    mask = jnp.asarray((np.arange(N) < 260).astype(np.float32))
    A, B = 64, 10
    deg = jcompat.degrees(P, Q, P, Q, PARAMS, mask_rows=mask, mask_cols=mask)
    _, anchors = lax.top_k(deg, A)

    nbr_s, nbr_idx, cand = anchor_neighbors_pallas(
        P, Q, anchors, B, PARAMS.compat_tau, PARAMS.min_separation,
        mask=mask, anchor_mask=mask[anchors], emit_candidates=True,
    )
    assert cand.shape == (A, B * (B - 1) // 2)

    b1, b2 = np.triu_indices(B, k=1)
    j = nbr_idx[:, b1]
    k = nbr_idx[:, b2]
    s_jk = tri_mod.pair_scores(
        P[nbr_idx][:, b1, :], P[nbr_idx][:, b2, :],
        Q[nbr_idx][:, b1, :], Q[nbr_idx][:, b2, :], PARAMS,
    )
    s_jk = jnp.where(j != k, s_jk, 0.0)
    s_b1 = nbr_s[:, b1]
    s_b2 = nbr_s[:, b2]
    score = s_b1 + s_b2 + s_jk
    valid = (s_b1 > 0) & (s_b2 > 0) & (s_jk > 0)
    ref = np.asarray(jnp.where(valid, score, -1.0))
    got = np.asarray(cand)
    # Same direct-differencing distance form on both sides; only ulp-level
    # threshold flips (score within ~1e-4 of an edge) may differ.
    edge = np.abs(ref - got) > 1e-3
    frac_flipped = edge.mean()
    assert frac_flipped < 0.01, frac_flipped
    np.testing.assert_allclose(got[~edge], ref[~edge], rtol=1e-4, atol=2e-4)


def test_anchor_neighbors_stream_matches_single(prob):
    """Streaming (column-blocked) top-B must reproduce the single-block
    kernel exactly — same scores, same indices, including tie-breaks —
    when forced through multiple column blocks (VERDICT r3 next #2)."""
    from jax import lax

    from saccot_tpu.kernels.triangles import (
        anchor_neighbors_pallas, anchor_neighbors_stream_pallas,
    )

    P, Q = jnp.asarray(prob["P"]), jnp.asarray(prob["Q"])
    N = P.shape[0]
    mask = jnp.asarray((np.arange(N) < 260).astype(np.float32))
    A, B = 64, 10
    deg = jcompat.degrees(P, Q, P, Q, PARAMS, mask_rows=mask, mask_cols=mask)
    _, anchors = lax.top_k(deg, A)

    ref_s, ref_i = anchor_neighbors_pallas(
        P, Q, anchors, B, PARAMS.compat_tau, PARAMS.min_separation,
        mask=mask, anchor_mask=mask[anchors],
    )
    got_s, got_i = anchor_neighbors_stream_pallas(
        P, Q, anchors, B, PARAMS.compat_tau, PARAMS.min_separation,
        mask=mask, anchor_mask=mask[anchors], tile_n=128,  # 3 blocks at N=300
    )
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(ref_s))
    # Indices agree wherever the selection is a real (score > 0) column;
    # exhausted slots differ only in which padded column they point at.
    real = np.asarray(ref_s) > 0
    np.testing.assert_array_equal(
        np.asarray(got_i)[real], np.asarray(ref_i)[real]
    )


def test_candidate_topt_matches_fused(prob):
    """candidate_topt_pallas (from gathered coords) must agree with the
    fused kernel's in-kernel top-T pre-ranking on the same selections."""
    from jax import lax

    from saccot_tpu.kernels.triangles import (
        anchor_neighbors_pallas, candidate_topt_pallas,
    )

    P, Q = jnp.asarray(prob["P"]), jnp.asarray(prob["Q"])
    N = P.shape[0]
    mask = jnp.asarray((np.arange(N) < 260).astype(np.float32))
    A, B, T = 64, 10, 4
    deg = jcompat.degrees(P, Q, P, Q, PARAMS, mask_rows=mask, mask_cols=mask)
    _, anchors = lax.top_k(deg, A)

    nbr_s, nbr_idx, ref_cs, ref_j, ref_k = anchor_neighbors_pallas(
        P, Q, anchors, B, PARAMS.compat_tau, PARAMS.min_separation,
        mask=mask, anchor_mask=mask[anchors], top_t=T,
    )
    got_cs, got_j, got_k = candidate_topt_pallas(
        nbr_s, nbr_idx, P[nbr_idx], Q[nbr_idx], T,
        PARAMS.compat_tau, PARAMS.min_separation,
    )
    np.testing.assert_allclose(
        np.asarray(got_cs), np.asarray(ref_cs), rtol=1e-5, atol=1e-5
    )
    real = np.asarray(ref_cs) > 0
    np.testing.assert_array_equal(np.asarray(got_j)[real], np.asarray(ref_j)[real])
    np.testing.assert_array_equal(np.asarray(got_k)[real], np.asarray(ref_k)[real])


def test_solve3_stream_matches_umeyama(rng):
    """N above MAX_N_SOLVE routes through the streaming gather+cov kernel;
    results must match the XLA gather + Horn path (VERDICT r3 next #2)."""
    from saccot_tpu.engine.svd3 import umeyama
    from saccot_tpu.kernels.solve3 import MAX_N_SOLVE, solve3_pallas

    N = MAX_N_SOLVE + 1000  # forces the streaming path, 3 point blocks
    prob = correspondence_problem(seed=77, n=N, outlier_ratio=0.5,
                                  n_points=2 * N)
    P, Q = jnp.asarray(prob["P"]), jnp.asarray(prob["Q"])
    K = 200
    triples = jnp.asarray(
        np.stack([rng.choice(N, size=3, replace=False) for _ in range(K)]),
        jnp.int32,
    )
    R_ref, t_ref = umeyama(P[triples], Q[triples])
    R_got, t_got = solve3_pallas(P, Q, triples)
    np.testing.assert_allclose(np.asarray(R_got), np.asarray(R_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_ref), atol=2e-5)


def test_register_pair_pallas_large_n():
    """End-to-end pallas estimator above MAX_N_FUSED (streaming pool +
    streaming solve) must agree with the jnp path."""
    import dataclasses

    from saccot_tpu.kernels.triangles import MAX_N_FUSED

    N = MAX_N_FUSED + 400
    prob = correspondence_problem(seed=78, n=N, outlier_ratio=0.7,
                                  n_points=2 * N)
    P, Q = jnp.asarray(prob["P"]), jnp.asarray(prob["Q"])
    params = dataclasses.replace(
        PARAMS, num_anchors=64, neighbors_per_anchor=10, max_hypotheses=256,
        dedup_triangles=False, per_anchor_candidates=4,
    )
    ref = register_pair(P, Q, params)
    got = register_pair(
        P, Q, params, compat_impl="pallas", score_impl="pallas",
        pool_impl="pallas", solve_impl="pallas",
    )
    E = np.asarray(got.T, np.float64) @ np.linalg.inv(np.asarray(ref.T, np.float64))
    assert se3np.rotation_angle_deg(E[:3, :3]) < 0.1
    assert abs(int(got.num_inliers) - int(ref.num_inliers)) <= 1


def test_degrees_tri_matches_standard():
    """Upper-triangle symmetric degree kernel (r5): routed when rows and
    cols are the same arrays above the block threshold; must match the
    two-sided kernel, with and without masks."""
    from saccot_tpu.io.synthetic import correspondence_problem

    prob = correspondence_problem(seed=9, n=2500, outlier_ratio=0.6)
    P, Q = jnp.asarray(prob["P"]), jnp.asarray(prob["Q"])
    d_tri = np.asarray(degrees_pallas(P, Q, P, Q, PARAMS))
    # Distinct array objects force the two-sided kernel.
    d_std = np.asarray(degrees_pallas(P + 0.0, Q, P, Q, PARAMS))
    np.testing.assert_allclose(d_tri, d_std, rtol=1e-5, atol=2e-3)
    mask = jnp.asarray((np.arange(2500) % 5 != 0).astype(np.float32))
    d_tri_m = np.asarray(degrees_pallas(P, Q, P, Q, PARAMS,
                                        mask_rows=mask, mask_cols=mask))
    d_std_m = np.asarray(degrees_pallas(P + 0.0, Q, P, Q, PARAMS,
                                        mask_rows=mask, mask_cols=mask))
    np.testing.assert_allclose(d_tri_m, d_std_m, rtol=1e-5, atol=2e-3)


def test_degrees_tri_vmap_no_scratch_leak():
    """The tri kernel's whole-row VMEM scratch must reset per batch
    element under vmap (identical elements -> identical results; batch
    order must not matter)."""
    from saccot_tpu.io.synthetic import correspondence_problem

    probs = [correspondence_problem(seed=s, n=2500, outlier_ratio=0.6)
             for s in range(2)]
    import jax

    P = jnp.stack([jnp.asarray(p["P"]) for p in probs])
    Q = jnp.stack([jnp.asarray(p["Q"]) for p in probs])
    fn = jax.jit(jax.vmap(lambda p, q: degrees_pallas(p, q, p, q, PARAMS)))
    d_fwd = np.asarray(fn(P, Q))
    d_rev = np.asarray(fn(P[::-1], Q[::-1]))[::-1]
    np.testing.assert_array_equal(d_fwd, d_rev)
    P2 = jnp.stack([P[0], P[0]])
    Q2 = jnp.stack([Q[0], Q[0]])
    d2 = np.asarray(fn(P2, Q2))
    np.testing.assert_array_equal(d2[0], d2[1])
