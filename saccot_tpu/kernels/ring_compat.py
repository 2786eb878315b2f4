"""Fused Pallas ring kernel: compatibility degrees with RDMA/compute overlap.

This is the ring-attention-analog kernel SURVEY.md section 5 calls for on
the O(N^2) rigidity matrix (the reference's compatibility-graph build,
SURVEY.md section 2.1): with the correspondence axis sharded over a mesh
axis of d devices, each device keeps its row chunk resident and streams the
d column chunks around the device ring, accumulating weighted degrees. The
XLA formulation of the same schedule lives in `dist/ring.py` (ppermute);
this kernel fuses the whole thing into ONE Pallas program per device where
the inter-chip DMA of column block s+1 overlaps the O(n_loc^2) compute on
block s:

  step s:   handshake (slot-free signal to left / wait for right)
            start RDMA: buf[slot] -> right neighbor's buf[1-slot]
            compute degrees of local rows vs buf[slot]   <- overlaps the DMA
            wait send+recv semaphores

Memory: never more than two [8, n_loc] column blocks live in VMEM; nothing
quadratic is materialized. Per step the DMA moves O(n_loc) bytes while the
VPU does O(n_loc^2) work, so for n_loc beyond a few hundred the transfer is
fully hidden behind compute.

The column block is packed coordinate-major as one [8, n] f32 buffer
(rows 0-2 source xyz, 3-5 target xyz, 6 validity mask, 7 pad to the f32
sublane tile) so each ring hop is a single contiguous DMA.

Correctness: per-step handshake semaphores (`free_sem`) make the receive
buffer's reuse explicit — a device signals its LEFT neighbor that the slot
is consumable before the neighbor may start writing it, which is exactly
the invariant `InterpretParams(detect_races=True)` checks in the CPU
simulation tests (tests/test_dist.py). Scores match engine.compat.score_block
up to f32 rounding: the kernel differences coordinates directly while
score_block uses the Gram trick, so last-ulp distance differences (and hence
threshold decisions within one ulp of tau/min_sep) can differ, and the f32
summation order of the degree reduction differs from the monolithic path.
The parity tests use rtol=1e-5 accordingly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from saccot_tpu.utils.params import SacCotParams


def _ring_degree_kernel(
    my_ref,       # SMEM [1] int32: this device's position on the ring axis
    blk_ref,      # VMEM [8, n] packed local block (also the local rows)
    out_ref,      # VMEM [1, n] accumulated degrees of the local rows
    buf_ref,      # VMEM scratch [2, 8, n] double-buffered column block
    send_sem,     # DMA sems [2]
    recv_sem,     # DMA sems [2]
    free_sem,     # REGULAR sems [2]: "my buf[slot] is free to overwrite"
    *,
    d: int,
    axis_name: str,
    compat_tau: float,
    min_sep: float,
    n_loc: int,
    tile_rows: int,
    tile_cols: int,
):
    my = my_ref[0]
    right = lax.rem(my + 1, d)
    left = lax.rem(my + d - 1, d)

    def dev_id(ring_val):
        # Dict form: unnamed mesh axes default to this device's own
        # coordinate, so the kernel is mesh-shape-agnostic.
        return {axis_name: ring_val}

    n_pad = blk_ref.shape[1]
    out_ref[:] = jnp.zeros_like(out_ref)
    # Seed the ring: slot 0 starts as our own column block.
    buf_ref[0, :, :] = blk_ref[:, :]

    row_base = my * n_loc

    def compute_on(slot, src):
        """Accumulate degrees of local rows against the block in buf[slot]."""
        col_base = src * n_loc

        def row_tile(rt, _):
            r0 = rt * tile_rows
            pr = blk_ref[0:3, pl.ds(r0, tile_rows)]   # [3, TR]
            qr = blk_ref[3:6, pl.ds(r0, tile_rows)]
            mr = blk_ref[6, pl.ds(r0, tile_rows)]     # [TR]

            def col_tile(ct, acc):
                c0 = ct * tile_cols
                pc = buf_ref[slot, 0:3, pl.ds(c0, tile_cols)]  # [3, TC]
                qc = buf_ref[slot, 3:6, pl.ds(c0, tile_cols)]
                mc = buf_ref[slot, 6, pl.ds(c0, tile_cols)]    # [TC]

                dp2 = None
                dq2 = None
                for c in range(3):
                    ep = pr[c, :][:, None] - pc[c, :][None, :]  # [TR, TC]
                    eq = qr[c, :][:, None] - qc[c, :][None, :]
                    dp2 = ep * ep if dp2 is None else dp2 + ep * ep
                    dq2 = eq * eq if dq2 is None else dq2 + eq * eq
                dp = jnp.sqrt(dp2)
                dq = jnp.sqrt(dq2)
                delta = jnp.abs(dp - dq)
                ok = (delta < compat_tau) & (dp > min_sep) & (dq > min_sep)
                rid = row_base + r0 + lax.broadcasted_iota(
                    jnp.int32, (tile_rows, tile_cols), 0
                )
                cid = col_base + c0 + lax.broadcasted_iota(
                    jnp.int32, (tile_rows, tile_cols), 1
                )
                ok &= rid != cid
                s = jnp.where(ok, 1.0 - delta * (1.0 / compat_tau), 0.0)
                s = s * mr[:, None] * mc[None, :]
                return acc + jnp.sum(s, axis=1)

            acc = lax.fori_loop(
                0, n_pad // tile_cols, col_tile,
                jnp.zeros((tile_rows,), jnp.float32),
            )
            out_ref[0, pl.ds(r0, tile_rows)] += acc
            return 0

        lax.fori_loop(0, n_pad // tile_rows, row_tile, 0)

    if d == 1:
        compute_on(0, my)
        return

    for step in range(d):  # d is static: unrolled ring schedule
        slot = step % 2
        src = lax.rem(my - step + d * d, d)  # owner of the block in buf[slot]
        rdma = None
        if step + 1 < d:
            # Tell LEFT our receive slot is consumable, wait until RIGHT
            # says the same about the slot we are about to overwrite.
            pltpu.semaphore_signal(
                free_sem.at[1 - slot],
                inc=1,
                device_id=dev_id(left),
                device_id_type=pltpu.DeviceIdType.MESH,
            )
            pltpu.semaphore_wait(free_sem.at[1 - slot], 1)
            rdma = pltpu.make_async_remote_copy(
                src_ref=buf_ref.at[slot],
                dst_ref=buf_ref.at[1 - slot],
                send_sem=send_sem.at[slot],
                recv_sem=recv_sem.at[1 - slot],
                device_id=dev_id(right),
                device_id_type=pltpu.DeviceIdType.MESH,
            )
            rdma.start()
        compute_on(slot, src)  # overlaps the in-flight DMA
        if rdma is not None:
            rdma.wait()


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def degrees_ring_pallas(
    P_loc: jnp.ndarray,
    Q_loc: jnp.ndarray,
    params: SacCotParams,
    axis_name: str,
    mask_loc: Optional[jnp.ndarray] = None,
    tile_rows: int = 256,
    tile_cols: int = 1024,
    interpret=None,
) -> jnp.ndarray:
    """Fused-ring replacement for dist.ring.degrees_ring (same contract).

    Must be called inside shard_map with the correspondence axis sharded
    over `axis_name` into equal chunks; works on any mesh shape (neighbor
    addressing uses dict device ids, which default every other mesh axis to
    the current device's coordinate). Returns deg [n_loc].

    Off-TPU the kernel runs under the Pallas TPU interpreter
    (`pltpu.InterpretParams`), which simulates the remote DMAs and
    semaphores for real — the CPU test mesh exercises the identical
    program, including the overlap schedule.
    """
    if interpret is None:
        interpret = (
            pltpu.InterpretParams() if jax.default_backend() != "tpu" else False
        )
    d = lax.axis_size(axis_name)

    n_loc = P_loc.shape[0]
    m = (
        jnp.ones((n_loc,), jnp.float32)
        if mask_loc is None
        else mask_loc.astype(jnp.float32)
    )
    # Lane-tile padding, then pick the largest tile sizes that divide it so
    # the fori_loop tiling covers the buffer exactly.
    n_pad = _round_up(n_loc, 128)
    tile_cols = next(t for t in (tile_cols, 1024, 512, 256, 128) if n_pad % t == 0)
    tile_rows = next(t for t in (tile_rows, 256, 128, 64, 32, 16, 8) if n_pad % t == 0)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n_pad - n_loc)))

    # Packed [8, n] block: source xyz / target xyz / mask / pad row. Padded
    # columns carry mask 0 so they contribute nothing anywhere on the ring.
    blk = jnp.concatenate(
        [
            pad(P_loc.astype(jnp.float32).T),
            pad(Q_loc.astype(jnp.float32).T),
            pad(m[None, :]),
            jnp.zeros((1, n_pad), jnp.float32),
        ],
        axis=0,
    )
    my = lax.axis_index(axis_name).astype(jnp.int32)[None]

    out = pl.pallas_call(
        functools.partial(
            _ring_degree_kernel,
            d=d,
            axis_name=axis_name,
            compat_tau=float(params.compat_tau),
            min_sep=float(params.min_separation),
            n_loc=n_loc,
            tile_rows=tile_rows,
            tile_cols=tile_cols,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 8, n_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=22 * d * n_pad * n_pad,
            bytes_accessed=d * 8 * n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(my, blk)
    return out[0, :n_loc]
