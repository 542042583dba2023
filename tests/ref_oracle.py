"""Load reference PyTorch modules (read-only, runtime import) as parity
oracles for naming + numerical checkpoint-import tests. Nothing is copied:
the reference files are exec'd from /root/reference at test time."""

from __future__ import annotations

import sys
import types

REF = "/root/reference"

_cache: dict[str, types.ModuleType] = {}


def load_ref_module(
    relpath: str,
    name: str,
    replacements: tuple = (),
    inject: dict | None = None,
) -> types.ModuleType:
    """Exec a reference file as a module.

    ``replacements``: extra (old, new) source rewrites to dodge imports the
    reference itself cannot satisfy. ``inject``: names pre-seeded into the
    module namespace (e.g. a stub for an unshipped dependency).
    """
    if name in _cache:
        return _cache[name]
    if REF not in sys.path:
        sys.path.insert(0, REF)  # makes `lib.nn` (SyncBN) importable
    src = open(f"{REF}/{relpath}").read()
    # dodge package-relative / unavailable imports
    src = src.replace("from .utils import load_url", "load_url = None")
    src = src.replace(
        "from . import resnet, resnext, mobilenet, hrnetv2_nodownsp, segformer, deeplab", "")
    src = src.replace("from . import resnet, resnext, mobilenet, hrnetv2_nodownsp", "")
    for old, new in replacements:
        src = src.replace(old, new)
    mod = types.ModuleType(name)
    if inject:
        mod.__dict__.update(inject)
    exec(compile(src, name, "exec"), mod.__dict__)
    _cache[name] = mod
    return mod


def state_dict_numpy(torch_module) -> dict:
    """state_dict as numpy, minus SyncBN internals."""
    skip = ("num_batches_tracked", "_tmp_running_mean", "_tmp_running_var", "_running_iter")
    return {
        k: v.detach().cpu().numpy()
        for k, v in torch_module.state_dict().items()
        if not any(k.endswith(s) for s in skip)
    }
