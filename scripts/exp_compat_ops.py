"""Per-op attribution of the N=50k degree kernel (r5 receipts).

Times stripped-down variants of the MXU-Gram degree kernel to find which
instruction class actually binds: the Gram dots, the sqrt pair, the
compare/select tail, or the row reduction. Variants are NOT semantically
correct — timing only.

Usage: python scripts/exp_compat_ops.py [reps]
"""
import functools, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from saccot_tpu.kernels.compat import (
    TILE_R, TILE_C, _gram_features, _pad_to, degrees_pallas,
)
from saccot_tpu.cli.configs import CONFIGS
from saccot_tpu.io.synthetic import correspondence_problem

cfg = CONFIGS["kitti"]
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
scale = 30.0
prob = correspondence_problem(
    seed=cfg.seed, n=cfg.n_corr, outlier_ratio=cfg.outlier_ratio,
    noise=cfg.noise / scale, n_points=4 * cfg.n_corr, max_angle=0.3,
    max_trans=3.0,
)
P = jnp.asarray(prob["P"] * scale)
Q = jnp.asarray(prob["Q"] * scale)
tau = float(cfg.params.compat_tau)
min_sep = float(cfg.params.min_separation)


def variant_kernel(rf_ref, nr_ref, cf_ref, nc_ref, out_ref, *, mode):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dn = (((0,), (0,)), ((), ()))
    Gp = jax.lax.dot_general(rf_ref[0:32, :], cf_ref[0:32, :], dn,
                             preferred_element_type=jnp.float32)
    Gq = jax.lax.dot_general(rf_ref[32:64, :], cf_ref[32:64, :], dn,
                             preferred_element_type=jnp.float32)
    if mode == "gram_only":
        out_ref[:] += jnp.sum(Gp + Gq, axis=1)[None, :]
        return
    dp2 = nr_ref[0, :][:, None] + nc_ref[0, :][None, :] - 2.0 * Gp
    dq2 = nr_ref[1, :][:, None] + nc_ref[1, :][None, :] - 2.0 * Gq
    if mode == "d2_only":
        out_ref[:] += jnp.sum(dp2 + dq2, axis=1)[None, :]
        return
    if mode == "one_sqrt":
        dp = jnp.sqrt(jnp.maximum(dp2, 0.0))
        out_ref[:] += jnp.sum(dp + dq2, axis=1)[None, :]
        return
    if mode == "no_sqrt_tail":
        # Same select/threshold structure on squared distances (wrong
        # semantics; same op classes minus the two sqrts).
        delta = jnp.abs(dp2 - dq2)
        s = jnp.maximum(1.0 - delta * (1.0 / (tau * tau)), 0.0)
        ok = jnp.minimum(dp2, dq2) > min_sep * min_sep
        s = jnp.where(ok, s, 0.0)
        out_ref[:] += jnp.sum(s, axis=1)[None, :]
        return
    # mode == "full": the real thing minus masks/self-test
    dp = jnp.sqrt(jnp.maximum(dp2, 0.0))
    dq = jnp.sqrt(jnp.maximum(dq2, 0.0))
    delta = jnp.abs(dp - dq)
    s = jnp.maximum(1.0 - delta * (1.0 / tau), 0.0)
    ok = jnp.minimum(dp, dq) > min_sep
    s = jnp.where(ok, s, 0.0)
    out_ref[:] += jnp.sum(s, axis=1)[None, :]


def run_variant(mode):
    N = P.shape[0]
    tr, tc = TILE_R, TILE_C
    Rp = -(-N // tr) * tr
    Cp = -(-N // tc) * tc

    @jax.jit
    def fn(P, Q):
        rf, _, nr = _gram_features(P, Q, Rp)
        _, cf, nc = _gram_features(P, Q, Cp)
        return pl.pallas_call(
            functools.partial(variant_kernel, mode=mode),
            grid=(Rp // tr, Cp // tc),
            in_specs=[
                pl.BlockSpec((64, tr), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, tr), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((64, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tr), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, Rp), jnp.float32),
        )(rf, nr, cf, nc)

    out = fn(P, Q)
    _ = np.asarray(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(P, Q)
    _ = np.asarray(out)
    return (time.time() - t0) / reps


for mode in ["gram_only", "d2_only", "one_sqrt", "no_sqrt_tail", "full"]:
    dt = run_variant(mode)
    print(f"{mode:14s} {dt*1e3:8.2f} ms", flush=True)
