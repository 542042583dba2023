"""Device-mesh data parallelism (the TPU-native replacement for DDP/NCCL).

The reference trains with one process per GPU, NCCL allreduce via DDP autograd
hooks, DistributedSampler data sharding and explicit barriers
(/root/reference/train_deform_semantic.py:45-55, 395, 462-468, 493), plus an
intra-process SyncBN thread pipeline (lib/nn/modules/comm.py:56-131).

Here the whole thing is SPMD: a 1-D ``jax.sharding.Mesh`` over the data axis,
the jitted train step wrapped in ``shard_map``, gradients/metrics reduced with
``jax.lax.pmean`` over ICI, per-replica batches placed with
``NamedSharding(P('data'))``, and cross-replica BN as the module's
``axis_name`` (a pmean inside the step — strictly stronger than the
reference, whose DDP ranks do NOT sync BN; flag ``TPU.sync_bn``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fovealseg_tpu.train.step import TrainState


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devices)} device(s) "
            "are visible — a silent truncation would misattribute throughput"
        )
    return Mesh(np.array(devices[:n]), (axis,))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place a host batch with the leading dim sharded over the mesh
    (scalars / per-step knobs are replicated)."""
    sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    out = {}
    for k, v in batch.items():
        rep = k in _REPLICATED_KEYS or getattr(v, "ndim", 1) == 0
        out[k] = jax.device_put(v, replicated if rep else sharding)
    return out


_REPLICATED_KEYS = {"edge_scale", "edge_only", "pool_s"}  # per-step scalars, not batch-sharded


def _batch_specs(batch: dict, axis: str) -> dict:
    # rank-0 leaves (per-step traced knobs) are replicated regardless of name
    return {
        k: (P() if k in _REPLICATED_KEYS or getattr(v, "ndim", 1) == 0 else P(axis))
        for k, v in batch.items()
    }


def make_parallel_train_step(module, tx, lcfg, mesh: Mesh, axis: str = "data",
                             fix_bn: bool = False):
    """shard_map-wrapped train step: state replicated, batch sharded.

    The inner per-shard step is the same function used single-device
    (fovealseg_tpu.train.step.make_train_step) with pmean reductions enabled,
    so single-chip and multi-chip paths share one code path.
    """
    from fovealseg_tpu.train.step import make_train_step

    inner = make_train_step(module, tx, lcfg, axis_name=axis, fix_bn=fix_bn)

    def sharded(state: TrainState, batch: dict, rng):
        # distinct dropout streams per replica
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        return inner(state, batch, rng)

    state_spec = P()  # fully replicated
    jitted: dict = {}

    def call(state, batch, rng):
        key = frozenset(batch.keys())
        if key not in jitted:
            batch_spec = _batch_specs(batch, axis)
            smapped = jax.shard_map(
                sharded,
                mesh=mesh,
                in_specs=(state_spec, batch_spec, P()),
                out_specs=(state_spec, P()),
                check_vma=False,
            )
            jitted[key] = jax.jit(smapped, donate_argnums=(0,))
        return jitted[key](state, batch, rng)

    return call


def make_parallel_eval_step(module, lcfg, mesh: Mesh, axis: str = "data"):
    from fovealseg_tpu.train.step import make_eval_step

    inner = make_eval_step(module, lcfg, axis_name=axis)

    jitted: dict = {}

    def call(params, batch_stats, batch):
        key = frozenset(batch.keys())
        if key not in jitted:
            smapped = jax.shard_map(
                inner,
                mesh=mesh,
                in_specs=(P(), P(), _batch_specs(batch, axis)),
                out_specs=P(),
                check_vma=False,
            )
            jitted[key] = jax.jit(smapped)
        return jitted[key](params, batch_stats, batch)

    return call


def replicate_state(state, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


# ---------------------------------------------------------------------------
# Spatial partitioning (latency-oriented serving, beyond-reference).
#
# At batch 1 there is no data axis to split, so the way to use multiple
# chips on one frame is to split the *image*: the warped task image's rows
# are sharded over a 1-D 'spatial' mesh (a with_sharding_constraint inside
# DeformSegmentation — the ``spatial_sharding`` module field) and XLA's SPMD
# partitioner runs every encoder/decoder conv spatially partitioned,
# inserting the 3x3-halo collective-permutes over ICI automatically. The
# pre-encoder stages (saliency/grid/warp gather) and the inverse-warp stage
# (scatter + Pallas JFA) stay replicated — they are a few percent of the
# FLOPs and gather/scatter-bound, while the conv stacks (>90% of b1
# latency) split N ways. Bit-equivalence vs the single-device forward is
# pinned by tests/test_parallel_spatial.py on a CPU mesh.


def make_mesh_spatial(num_devices: Optional[int] = None) -> Mesh:
    return make_mesh(num_devices, axis="spatial")


def make_spatial_infer_fn(config, mesh: Mesh, dtype=None, method: str = "forward",
                          **infer_kwargs):
    """Build (module, jitted_fn) running the flagship forward spatially
    partitioned over ``mesh``.

    method='forward': fn(variables, x, f) -> pred (warped-domain logits).
    method='infer':   fn(variables, x, f) -> the full-res infer dict
    (``infer_kwargs`` forwarded, e.g. argmax_labels=True for serving).
    Inputs/outputs are replicated; only the conv trunk runs sharded.
    """
    import jax.numpy as jnp

    from fovealseg_tpu.models.deform_module import DeformSegmentation

    module = DeformSegmentation(
        config=config, dtype=dtype or jnp.float32,
        spatial_sharding=NamedSharding(mesh, P(None, "spatial")),
    )
    rep = NamedSharding(mesh, P())

    if method == "forward":
        def fn(variables, x, f):
            return module.apply(variables, x, f, train=False)["pred"]
    elif method == "infer":
        def fn(variables, x, f):
            return module.apply(variables, x, f,
                                method=DeformSegmentation.infer, **infer_kwargs)
    else:
        raise ValueError(f"unknown method {method!r}")

    return module, jax.jit(fn, in_shardings=(rep, rep, rep), out_shardings=rep)


# ---------------------------------------------------------------------------
# 2-D (data, model) mesh: GSPMD auto-parallel training step.
#
# The reference is data-parallel only (SURVEY.md §2.5) — the shard_map DP
# path above is the parity mapping. This section is the TPU-native scaling
# extension beyond it: a ``Mesh((dp, mp), ('data', 'model'))`` where the wide
# conv kernels (the 960-channel head, HRNet branch convs) are sharded over
# 'model' and the batch over 'data'; the step is a plain ``jit`` with
# ``in_shardings`` annotations and XLA inserts every collective
# (all-gather/reduce-scatter for the sharded weights, all-reduce for the
# data-parallel gradients, global batch stats for BN — so cross-replica
# sync-BN is automatic here, no axis_name needed).


def make_mesh_2d(dp: Optional[int] = None, mp: int = 1,
                 axes: tuple = ("data", "model")) -> Mesh:
    devices = jax.devices()
    n = len(devices)
    dp = dp or max(1, n // mp)
    assert dp * mp <= n, f"mesh {dp}x{mp} needs {dp * mp} devices, have {n}"
    return Mesh(np.array(devices[: dp * mp]).reshape(dp, mp), axes)


def _model_leaf_spec(leaf, mp: int, min_channels: int = 256) -> P:
    """Shard wide parameter tensors over 'model' by output channel; leave
    everything else replicated. Applies uniformly to params and to
    optimizer-state leaves of the same shape (adam mu/nu)."""
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 2 and shape[-1] >= min_channels and shape[-1] % mp == 0:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def state_shardings_2d(state, mesh: Mesh, min_channels: int = 256):
    """TrainState -> matching tree of NamedShardings for the 2-D mesh."""
    mp = mesh.shape["model"]

    def to_sharding(leaf):
        return NamedSharding(mesh, _model_leaf_spec(leaf, mp, min_channels))

    return jax.tree.map(to_sharding, state)


def shard_state_2d(state, mesh: Mesh, min_channels: int = 256):
    return jax.device_put(state, state_shardings_2d(state, mesh, min_channels))


def make_gspmd_eval_step(module, lcfg, mesh: Mesh, state,
                         min_channels: int = 256):
    """2-D-mesh eval step: batch over 'data', params in their training
    shardings (wide kernels over 'model'); GSPMD reductions keep metrics
    global. ``state`` is the sharding template, as in the train step."""
    from fovealseg_tpu.train.step import make_eval_step

    inner = make_eval_step(module, lcfg, axis_name=None)
    state_sh = state_shardings_2d(state, mesh, min_channels)
    batch_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    jitted: dict = {}

    def call(params, batch_stats, batch):
        key = frozenset(batch.keys())
        if key not in jitted:
            b_sh = {k: (rep if k in _REPLICATED_KEYS or getattr(v, "ndim", 1) == 0
                        else batch_sh) for k, v in batch.items()}
            jitted[key] = jax.jit(
                inner,
                in_shardings=(state_sh.params, state_sh.batch_stats, b_sh),
                out_shardings=rep,
            )
        return jitted[key](params, batch_stats, batch)

    return call


def make_gspmd_train_step(module, tx, lcfg, mesh: Mesh, state,
                          min_channels: int = 256, fix_bn: bool = False):
    """2-D-mesh training step: batch over 'data', wide weights over 'model'.

    ``state`` is a template used to derive the sharding tree. BN stats sync
    and gradient reduction are implicit (GSPMD global reductions), so the
    inner step runs WITHOUT an axis_name.
    """
    from fovealseg_tpu.train.step import make_train_step

    inner = make_train_step(module, tx, lcfg, axis_name=None, fix_bn=fix_bn)
    state_sh = state_shardings_2d(state, mesh, min_channels)
    batch_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    jitted: dict = {}

    def call(state, batch: dict, rng):
        key = frozenset(batch.keys())
        if key not in jitted:
            b_sh = {k: (rep if k in _REPLICATED_KEYS or getattr(v, "ndim", 1) == 0
                        else batch_sh) for k, v in batch.items()}
            jitted[key] = jax.jit(
                inner,
                in_shardings=(state_sh, b_sh, rep),
                out_shardings=(state_sh, rep),
                donate_argnums=(0,),
            )
        return jitted[key](state, batch, rng)

    return call
