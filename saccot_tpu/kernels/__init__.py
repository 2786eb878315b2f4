"""Pallas TPU kernels for the estimator's hot loops.

Coverage vs the hot-loop ranking (SURVEY.md section 3.5):

- hot loop #1, O(N^2) compatibility: `kernels.compat.degrees_pallas` —
  fused distance/test/score/row-reduce, O(N) HBM traffic.
- hot loop #3, O(K*N) scoring: `kernels.score.score_hypotheses_pallas` —
  fused transform/threshold/accumulate, nothing quadratic materialized.
- hot loop #2, triangle ranking/sampling: deliberately *not* a Pallas
  kernel. The pool stage is top-k + sort over ~3e4 candidates; profiling
  on-chip showed it contributes negligibly next to the (formerly dominant,
  now quaternion-accelerated) hypothesis solve, and XLA's sort/top-k are
  already tuned TPU primitives. Re-evaluate if max_hypotheses budgets grow
  by orders of magnitude.

Both kernels run in interpret mode off-TPU, so the CPU test mesh exercises
identical kernel logic (tests/test_kernels.py); the compiled paths are
exercised by bench.py on the real chip.
"""
