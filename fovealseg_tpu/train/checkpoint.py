"""Checkpointing: orbax pytree ckpts mirroring the reference's 4-file surface.

The reference writes 4 ``state_dict`` files per epoch —
``{saliency,compress,encoder,decoder}_epoch_{N|last}.pth``
(/root/reference/train_deform_semantic.py:166-208) — and always reloads from
disk for eval (eval.py:456-487). Here one orbax checkpoint per epoch holds the
same four subtrees (params + batch_stats + opt_state), with ``epoch_last``
mirroring the ``_last`` copies for resume (TRAIN.start_epoch).

``load_torch_checkpoint`` imports the published PyTorch weights for
IoU-parity evaluation (SURVEY.md §5): torch keys map 1:1 onto our flax module
paths (models/layers.py naming convention) with kernel-axis transposes.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class AsyncSaver:
    """Overlapping checkpoint writer (orbax AsyncCheckpointer).

    ``save()`` blocks only for the device→host snapshot (orbax copies the
    arrays before returning — safe with ``donate_argnums`` on the next step),
    then serializes to disk in a background thread while training continues.
    One in-flight save at a time: a new save (and ``wait()``/``close()``)
    first drains the previous one. Accepts device-resident AND sharded
    arrays — each process writes its addressable shards, which is the
    multi-host/2-D-mesh-safe path the synchronous ``jax.device_get`` route
    (full host gather on every host) is not.
    """

    def __init__(self):
        self._ck = None
        self._pending_copy: tuple[str, str] | None = None

    def _checkpointer(self):
        if self._ck is None:
            ocp = _ocp()
            self._ck = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        return self._ck

    def _do_pending_copy(self) -> None:
        # materialize the deferred epoch_last mirror: a host disk->disk
        # directory copy of the finished write — NOT a second device
        # snapshot (a naive second save() would re-snapshot the whole
        # TrainState and double the blocking cost of on-cadence epochs)
        if self._pending_copy is None:
            return
        import shutil

        src, dst = self._pending_copy
        self._pending_copy = None
        tmp = dst + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(src, tmp)
        shutil.rmtree(dst, ignore_errors=True)
        os.replace(tmp, dst)

    def save(self, path: str, payload, copy_to: str | None = None) -> None:
        """Snapshot + background-write ``payload`` to ``path``; optionally
        mirror the finished checkpoint to ``copy_to`` (e.g. ``epoch_last``)
        by directory copy at the next drain point (next save / wait /
        close) — one device snapshot per epoch regardless of targets.
        Crash window: ``copy_to`` lags until the next drain, so a crash
        mid-epoch can leave ``epoch_last`` one save stale while ``path``
        itself is durable (auto-resume then loses at most that epoch)."""
        ocp = _ocp()
        ck = self._checkpointer()
        ck.wait_until_finished()
        self._do_pending_copy()
        ck.save(path, args=ocp.args.StandardSave(payload), force=True)
        if copy_to is not None:
            self._pending_copy = (path, copy_to)

    def wait(self) -> None:
        if self._ck is not None:
            self._ck.wait_until_finished()
        self._do_pending_copy()

    def close(self) -> None:
        if self._ck is not None:
            self._ck.close()
            self._ck = None
        self._do_pending_copy()


def save_checkpoint(
    ckpt_dir: str, epoch: int, state, also_last: bool = True,
    only_last: bool = False, saver: AsyncSaver | None = None
) -> None:
    """Persist a checkpoint. ``only_last=True`` writes just the ``epoch_last``
    copy — the reference's off-cadence behavior (between
    TRAIN.checkpoint_per_epoch epochs only the ``*_last.pth`` files are
    refreshed, train_deform_semantic.py:166-208).

    ``saver`` (an :class:`AsyncSaver`) switches to overlapped async writes;
    ``state`` may then be device-resident/sharded (no prior device_get
    needed). Without it the save is synchronous (host state expected)."""
    ocp = _ocp()
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    epoch_path = os.path.join(ckpt_dir, f"epoch_{epoch}")
    last_path = os.path.join(ckpt_dir, "epoch_last")
    if saver is not None:
        # one snapshot+write; epoch_last mirrors by deferred directory copy
        if only_last:
            saver.save(last_path, payload)
        else:
            saver.save(epoch_path, payload,
                       copy_to=last_path if also_last else None)
        return
    targets = ([] if only_last else [epoch_path]) + (
        [last_path] if also_last or only_last else [])
    with ocp.StandardCheckpointer() as ck:
        for t in targets:
            ck.save(t, payload, force=True)


def load_checkpoint(ckpt_dir: str, epoch, abstract_state, shardings=None) -> dict:
    """Restore a checkpoint.

    ``shardings`` (optional TrainState-shaped tree of ``jax.sharding.
    Sharding``, e.g. from ``parallel.mesh.state_shardings_2d``) restores each
    leaf DIRECTLY into its device shards — every process reads only its
    addressable pieces, nothing is materialized host-side. Without it the
    restore is host-side numpy (the single-host parity path)."""
    import jax

    ocp = _ocp()
    name = str(epoch)
    if not name.startswith("epoch_"):
        name = f"epoch_{name}"  # accepts 3, "3", "last", "epoch_last"
    path = os.path.join(os.path.abspath(ckpt_dir), name)
    template = {
        "params": abstract_state.params,
        "batch_stats": abstract_state.batch_stats,
        "opt_state": abstract_state.opt_state,
        "step": abstract_state.step,
    }
    if shardings is not None:
        sh = {
            "params": shardings.params,
            "batch_stats": shardings.batch_stats,
            "opt_state": shardings.opt_state,
            "step": shardings.step,
        }
        template = jax.tree.map(
            lambda leaf, s: jax.ShapeDtypeStruct(
                getattr(leaf, "shape", ()), getattr(leaf, "dtype", None), sharding=s
            ),
            template, sh,
        )
    with ocp.StandardCheckpointer() as ck:
        return ck.restore(path, template)


# ---------------------------------------------------------------------------
# PyTorch checkpoint import (parity path)
# ---------------------------------------------------------------------------

_SUBTREE_FROM_FILE = {
    "encoder": "encoder",
    "decoder": "decoder",
    "saliency": "localization",
    "compress": "net_compress",
}


# flax's canonical tuple-keyed flatteners (same contract as a hand-rolled
# recursive dict walk, plus Mapping/FrozenDict support)
from flax.traverse_util import flatten_dict as _flatten  # noqa: E402
from flax.traverse_util import unflatten_dict as _unflatten  # noqa: E402


def torch_key_to_flax(key: str) -> tuple[tuple, str]:
    """'layer1.0.conv1.weight' -> (('layer1.0',... module names), param name).

    Our flax modules use the torch module path *as the submodule name chain*;
    the final torch component (weight/bias/running_mean/...) maps to a flax
    param leaf.
    """
    parts = key.split(".")
    leaf = parts[-1]
    mod = parts[:-1]
    return tuple(mod), leaf


def import_torch_state_dict(
    state_dicts: dict[str, dict[str, "np.ndarray"]],
    params: dict,
    batch_stats: dict,
) -> tuple[dict, dict]:
    """Merge reference state_dicts into (params, batch_stats).

    ``state_dicts`` maps subtree file kind ('encoder'|'decoder'|'saliency'|
    'compress') to a torch state_dict of numpy arrays. Unknown keys are
    skipped (the reference loads with strict=False, models/models.py:1176).
    """
    pflat = _flatten(params)
    sflat = _flatten(batch_stats)
    # Index flax leaves by (top subtree, dotted module path, leaf). Flax
    # module names may themselves contain dots ("layer1.0"), so matching is
    # on the dot-joined string, which equals the torch module path.
    pindex = {(p[0], ".".join(p[1:-1]), p[-1]): p for p in pflat}
    sindex = {(p[0], ".".join(p[1:-1]), p[-1]): p for p in sflat}
    matched, skipped = 0, []

    for kind, sd in state_dicts.items():
        top = _SUBTREE_FROM_FILE[kind]
        for tkey, arr in sd.items():
            mod, leaf = torch_key_to_flax(tkey)
            modpath = ".".join(mod)
            arr = np.asarray(arr)
            if leaf == "weight" and arr.ndim == 4:
                # conv OIHW -> HWIO
                lookup, val, store, index = "kernel", arr.transpose(2, 3, 1, 0), pflat, pindex
            elif leaf == "weight" and arr.ndim == 2:
                lookup, val, store, index = "kernel", arr.T, pflat, pindex
            elif leaf == "weight" and arr.ndim == 1:
                lookup, val, store, index = "scale", arr, pflat, pindex
            elif leaf == "bias":
                lookup, val, store, index = "bias", arr, pflat, pindex
            elif leaf == "running_mean":
                lookup, val, store, index = "mean", arr, sflat, sindex
            elif leaf == "running_var":
                lookup, val, store, index = "var", arr, sflat, sindex
            else:  # num_batches_tracked etc.
                continue
            path = index.get((top, modpath, lookup))
            if path is None:
                skipped.append((tkey, "missing"))
                continue
            cur = store[path]
            if tuple(cur.shape) != tuple(val.shape):
                skipped.append((tkey, "shape"))
                continue
            store[path] = jnp.asarray(val, dtype=cur.dtype)
            matched += 1

    new_params = _unflatten(pflat)
    new_stats = _unflatten(sflat)
    if skipped:
        import logging

        logging.getLogger(__name__).warning(
            "torch import: %d matched, %d skipped (strict=False): %s...",
            matched, len(skipped), skipped[:5],
        )
    return new_params, new_stats


_FILE_FROM_SUBTREE = {v: k for k, v in _SUBTREE_FROM_FILE.items()}


def export_torch_state_dict(
    params: dict, batch_stats: dict
) -> dict[str, dict[str, "np.ndarray"]]:
    """Inverse of :func:`import_torch_state_dict`: flax (params, batch_stats)
    → ``{'encoder'|'decoder'|'saliency'|'compress': {torch_key: ndarray}}``.

    Layout transforms mirror the import shim exactly (conv HWIO→OIHW, linear
    kernel transpose, BN scale→weight, mean/var→running_mean/running_var), so
    weights trained here load into the reference's ModelBuilder
    (/root/reference/models/models.py:1174-1230) and the round trip through
    ``load_torch_weight_files`` is bit-exact. Each BN module additionally gets
    a ``num_batches_tracked=0`` buffer — present in every torch BN
    state_dict; the reference loads with strict=False so the value is inert.

    Subtrees outside the 4-file surface are ignored (there are none in
    ``DeformSegmentation``; this keeps the export total like the import).
    """
    out: dict[str, dict[str, np.ndarray]] = {k: {} for k in _SUBTREE_FROM_FILE}

    def _np(arr):
        arr = np.asarray(jax.device_get(arr))
        # params are kept f32 here; any low-precision leaf widens to the
        # reference's f32 checkpoint dtype
        return arr.astype(np.float32) if np.issubdtype(arr.dtype, np.floating) else arr

    dropped = []
    for path, arr in _flatten(params).items():
        kind = _FILE_FROM_SUBTREE.get(path[0])
        if kind is None:
            continue
        mod, leaf = ".".join(path[1:-1]), path[-1]
        arr = _np(arr)
        if leaf == "kernel" and arr.ndim == 4:
            key, val = "weight", arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        elif leaf == "kernel" and arr.ndim == 2:
            key, val = "weight", arr.T
        elif leaf == "scale":
            key, val = "weight", arr  # BN/affine 1-D
        elif leaf == "bias":
            key, val = "bias", arr
        else:
            dropped.append(".".join(path))
            continue
        out[kind][f"{mod}.{key}" if mod else key] = val
    for path, arr in _flatten(batch_stats).items():
        kind = _FILE_FROM_SUBTREE.get(path[0])
        if kind is None:
            continue
        mod, leaf = ".".join(path[1:-1]), path[-1]
        if leaf not in ("mean", "var"):
            dropped.append(".".join(path))
            continue
        stat_key = f"{mod}.running_{leaf}" if mod else f"running_{leaf}"
        nbt_key = f"{mod}.num_batches_tracked" if mod else "num_batches_tracked"
        out[kind][stat_key] = _np(arr)
        out[kind].setdefault(nbt_key, np.asarray(0, np.int64))
    if dropped:
        # symmetric with import_torch_state_dict's skipped warning: a future
        # model with a new leaf name must not silently vanish from exports
        import logging

        logging.getLogger(__name__).warning(
            "torch export: %d leaves dropped (no torch mapping): %s...",
            len(dropped), dropped[:5],
        )
    return {k: v for k, v in out.items() if v}


def save_torch_checkpoint(
    ckpt_dir: str, epoch, params: dict, batch_stats: dict, also_last: bool = True
) -> list[str]:
    """Write the reference's 4-file checkpoint surface —
    ``{saliency,compress,encoder,decoder}_epoch_{N}.pth`` (+ ``_last`` copies
    when ``also_last``, matching train_deform_semantic.py:166-208) — from a
    flax state, so a model trained here can be evaluated/resumed by the
    reference's own drivers. Returns the written paths. Requires torch."""
    import torch

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    written = []
    for kind, sd in export_torch_state_dict(params, batch_stats).items():
        tsd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
        for tag in ([epoch, "last"] if also_last else [epoch]):
            path = os.path.join(ckpt_dir, f"{kind}_epoch_{tag}.pth")
            torch.save(tsd, path)
            written.append(path)
    return written


def load_torch_checkpoint(ckpt_dir: str, epoch, params: dict, batch_stats: dict):
    """Load the reference's 4 .pth files for one epoch (requires torch)."""
    return load_torch_weight_files(
        {kind: os.path.join(ckpt_dir, f"{kind}_epoch_{epoch}.pth")
         for kind in ("encoder", "decoder", "saliency", "compress")},
        params, batch_stats, skip_missing=True,
    )


def load_torch_weight_files(paths: dict, params: dict, batch_stats: dict,
                            skip_missing: bool = False):
    """Per-net explicit .pth paths — the MODEL.weights_{encoder,decoder,
    net_saliency,net_compress} surface (ModelBuilder strict=False loads,
    models/models.py:1174-1230). ``paths`` maps subtree kind
    ('encoder'/'decoder'/'saliency'/'compress') to a file path; empty
    entries are skipped, missing files too when ``skip_missing``."""
    import torch

    sds = {}
    for kind, path in paths.items():
        if not path or (skip_missing and not os.path.exists(path)):
            continue
        sd = torch.load(path, map_location="cpu", weights_only=True)
        sds[kind] = {k: v.numpy() for k, v in sd.items()}
    return import_torch_state_dict(sds, params, batch_stats)
