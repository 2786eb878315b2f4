"""Multi-process runtime validation: 2 real processes x 4 faked CPU devices.

SURVEY.md section 2.2's comm-backend row specifies "multi-host process group
via jax.distributed.initialize"; every test and dryrun elsewhere runs
single-process, so this harness is the proof that the process-group path
(dist/mesh.init_distributed + cross-process collectives) actually executes:
two local processes join a coordinator on localhost, form one 8-device
("pairs", "hyp", "corr") mesh spanning the process boundary, and run

  1. the DP x SP registration sweep (dist/sweep.make_sweep_fn) — the
     all-gather/psum collectives cross processes over the gloo transport
     (the CPU stand-in for ICI/DCN), and
  2. one distributed Schur-complement BA step (slam/dryrun.dryrun_ba_step).

Usage:
  python scripts/multiprocess_dryrun.py            # parent: spawns 2 workers
  python scripts/multiprocess_dryrun.py --proc I N PORT   # worker role

Exit code 0 + final "multiprocess dryrun ok" line = pass. Used by
tests/test_multiprocess.py.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys


def _worker(proc_id: int, n_proc: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # Workers are spawned by absolute script path; make the repo importable.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Cross-process CPU collectives ride the gloo transport.
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from saccot_tpu.dist.mesh import init_distributed

    init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=n_proc,
        process_id=proc_id,
    )
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.device_count() == 4 * n_proc, jax.devices()
    print(
        f"proc {proc_id}: joined process group "
        f"(local={jax.local_device_count()} global={jax.device_count()})",
        flush=True,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from saccot_tpu.dist.mesh import make_mesh
    from saccot_tpu.dist.sweep import make_sweep_fn
    from saccot_tpu.io.synthetic import correspondence_problem
    from saccot_tpu.utils.params import SacCotParams

    mesh = make_mesh(pairs=4, corr=2)
    n, B = 64, 8
    params = SacCotParams(
        compat_tau=0.03, min_separation=0.05, inlier_tau=0.03,
        num_anchors=16, neighbors_per_anchor=6, max_hypotheses=32,
        degree_block_rows=64,
    )
    # Identical host-local data on every process (same seeds), stitched into
    # global arrays below.
    probs = [correspondence_problem(seed=s, n=n, outlier_ratio=0.4) for s in range(B)]
    P_all = jnp.stack([jnp.asarray(p["P"]) for p in probs])
    Q_all = jnp.stack([jnp.asarray(p["Q"]) for p in probs])
    mask = jnp.ones((B, n), jnp.float32)
    P_g, Q_g, m_g = multihost_utils.host_local_array_to_global_array(
        (P_all, Q_all, mask), mesh, (P(), P(), P())
    )

    sweep = make_sweep_fn(mesh, params)
    res = sweep(P_g, Q_g, m_g)
    jax.block_until_ready(res.T)
    success = np.asarray(multihost_utils.process_allgather(res.success, tiled=True))
    inl = np.asarray(multihost_utils.process_allgather(res.num_inliers, tiled=True))
    assert success.all(), f"proc {proc_id}: sweep failed: {success}"
    print(
        f"proc {proc_id}: DPxSP sweep across the process boundary ok "
        f"(B={B}, mean inliers={inl.mean():.1f})",
        flush=True,
    )

    from saccot_tpu.slam.dryrun import dryrun_ba_step

    dryrun_ba_step(mesh)
    multihost_utils.sync_global_devices("dryrun_done")
    if proc_id == 0:
        print("multiprocess dryrun ok", flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--proc":
        _worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return 0

    n_proc = 2
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--proc", str(i),
             str(n_proc), str(port)],
            env=env,
        )
        for i in range(n_proc)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        print(f"worker exit codes: {rcs}", file=sys.stderr)
        return 1
    print("multiprocess dryrun: all workers exited cleanly")
    return 0


if __name__ == "__main__":
    sys.exit(main())
