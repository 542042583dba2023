"""Observability: logger, TensorBoard writer, memory introspection, io.

Covers the reference's aux surface (SURVEY.md §5/§2.7):

* ``setup_logger`` (utils.py:103-115) — stdout + file logger.
* TensorBoard scalars/images (train_deform_semantic.py:403,521-559) via
  torch.utils.tensorboard when available, else a JSONL fallback writer with
  the same add_scalar/add_image surface.
* ``try_gpu``/``RAM`` (DynamicFocus/d_model/nn_A0_utils.py:47-73, 342) —
  TPU-era equivalents: live device-memory stats via jax, and a tensor attr
  bag with explicit GC.
* ``fctn`` io helpers (utility/fctn.py:104-135) — image/json/pickle/npy io.
"""

from __future__ import annotations

import json
import logging
import os
import pickle
import sys
import time
from typing import Any

import numpy as np


def setup_logger(distributed_rank: int = 0, filename: str | None = None) -> logging.Logger:
    """stdout(+file) logger with the reference's format (utils.py:103-115)."""
    logger = logging.getLogger("fovealseg")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("[%(asctime)s %(levelname)s %(filename)s:%(lineno)d] %(message)s")
    if distributed_rank == 0:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if filename:
            fh = logging.FileHandler(filename)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


class SummaryWriter:
    """add_scalar/add_image surface; torch TB backend when importable,
    JSONL + PNG fallback otherwise."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter as TBW

            self._tb = TBW(log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        else:
            self._jsonl.write(json.dumps({"tag": tag, "value": float(value),
                                          "step": int(step), "ts": time.time()}) + "\n")
            self._jsonl.flush()

    def add_image(self, tag: str, img_hwc01: np.ndarray, step: int) -> None:
        if self._tb is not None:
            import torch

            self._tb.add_image(tag, torch.from_numpy(
                np.asarray(img_hwc01, np.float32)).permute(2, 0, 1), step)
        else:
            from fovealseg_tpu.utils.visuals import save_rgb01

            save_rgb01(img_hwc01, os.path.join(self.log_dir, f"{tag.replace('/', '_')}_{step}.png"))

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        else:
            self._jsonl.close()


def device_memory_stats() -> list[dict]:
    """Per-device live memory (the TPU-era try_gpu; nn_A0_utils.py:47-73
    polled nvidia-smi)."""
    import jax

    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        out.append({
            "device": str(d),
            "bytes_in_use": s.get("bytes_in_use"),
            "bytes_limit": s.get("bytes_limit"),
        })
    return out


class RAM:
    """Tensor attr bag with explicit gc (nn_A0_utils.RAM)."""

    def gc(self):
        for k in list(self.__dict__):
            delattr(self, k)


# -- fctn io helpers (utility/fctn.py:104-135) -------------------------------

def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def save_image(img01: np.ndarray, path: str) -> None:
    from fovealseg_tpu.utils.visuals import save_rgb01

    save_rgb01(img01, path)


def save_json(obj: Any, path: str) -> None:
    with open(path, "w") as f:
        json.dump(obj, f)


def load_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def save_pickle(obj: Any, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_tensor(arr, path: str) -> None:
    np.save(path, np.asarray(arr))


def load_tensor(path: str) -> np.ndarray:
    return np.load(path)


# -- nn_A0_utils model/memory introspection (d_model/nn_A0_utils.py) ---------

def byte2mb(bt: float) -> float:
    """nn_A0_utils.byte2MB:238-239."""
    return round(bt / (1024**2), 3)


_UNIT_DIV = {"KB": 1024, "MB": 1024**2, "GB": 1024**3}


def calc_tensor_memsize(arr, unit: str = "MB") -> float:
    """Array size in KB/MB/GB (nn_A0_utils.calc_tensor_memsize:177-193)."""
    if unit not in _UNIT_DIV:
        raise ValueError("Invalid unit. Please choose from 'KB', 'MB', or 'GB'.")
    return arr.size * arr.dtype.itemsize / _UNIT_DIV[unit]


def calc_model_memsize(params, unit: str = "MB", show: bool = True,
                       label: str = "the model") -> float:
    """Total param-tree size (nn_A0_utils.calc_model_memsize:196-203)."""
    import jax

    total = sum(calc_tensor_memsize(p, unit) for p in jax.tree.leaves(params))
    if show:
        print(f"Total memory size of {label} in {unit}: {total:.4f} {unit}")
    return total


def show_model_info(params, show_details: bool = True):
    """Per-leaf param table -> (total elements, total MB)
    (nn_A0_utils.show_model_info:206-235); flax param tree instead of
    nn.Module.named_parameters."""
    import jax
    import pandas as pd
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(params, sep=".")
    table = [[name, p.size, round(p.size * p.dtype.itemsize / 1024, 2)]
             for name, p in flat.items()]
    df = pd.DataFrame(table, columns=["Modules", "Parameters", "Mem (KB)"])
    if show_details:
        with pd.option_context("display.max_rows", None, "display.max_columns", None):
            print(df)
    total_ele = int(sum(p.size for p in jax.tree.leaves(params)))
    total_mem = round(sum(p.size * p.dtype.itemsize for p in jax.tree.leaves(params)) / 1024**2, 4)
    print(f"Total Trainable : {total_ele} ele , {total_mem} MB\n")
    return total_ele, total_mem


def init_weights_zero(params):
    """Zero every leaf of a param tree (nn_A0_utils.init_weights_zero:80-124;
    module-type dispatch collapses to a tree map in JAX)."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.zeros_like, params)


def init_weights_random(params, key):
    """torch-semantics re-init over a flax param tree
    (nn_A0_utils.init_weights_random:127-174): conv/dense kernels get
    xavier_normal_ (torch fans include the receptive field: fan_in =
    in*kh*kw, fan_out = out*kh*kw), BatchNorm scales N(1, 0.02), biases 0,
    everything else N(0, 1)."""
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    keys = jax.random.split(key, max(len(flat), 1))

    def _init(path, p, k):
        name = path[-1]
        if name == "scale":  # BN weight: normal_(1.0, 0.02)
            return (1.0 + 0.02 * jax.random.normal(k, p.shape)).astype(p.dtype)
        if name == "bias":  # constant 0 (conv bias normal_ upstream only
            # when present; flax BN/conv biases default together — zeros is
            # the BN-safe choice the reference takes for every norm layer)
            return jnp.zeros_like(p)
        if p.ndim >= 2:  # conv [kh, kw, in, out] / dense [in, out] kernels
            rf = int(np.prod(p.shape[:-2])) if p.ndim > 2 else 1
            fan_in = int(p.shape[-2]) * rf
            fan_out = int(p.shape[-1]) * rf
            std = float(np.sqrt(2.0 / (fan_in + fan_out)))
            return (jax.random.normal(k, p.shape) * std).astype(p.dtype)
        return jax.random.normal(k, p.shape).astype(p.dtype)

    out = {path: _init(path, p, k) for (path, p), k in zip(flat.items(), keys)}
    return unflatten_dict(out)


def try_device(kind: str = "tpu"):
    """First available accelerator device, CPU fallback (the JAX analogue of
    nn_A0_utils.try_gpu:47-73 — no polling loop: XLA owns the whole chip)."""
    import jax

    try:
        devs = jax.devices(kind)
        if devs:
            return devs[0]
    except RuntimeError:
        pass
    return jax.devices("cpu")[0]


def save_jsonl(data, path: str) -> None:
    """One JSON object per line (utility/fctn.py:29-39)."""
    with open(path, "w", encoding="utf-8") as f:
        for entry in data:
            f.write(json.dumps(entry, ensure_ascii=False) + "\n")


def read_jsonl(path: str) -> list:
    """Read a JSONL file into a list (utility/fctn.py:42-53)."""
    with open(path, encoding="utf-8") as f:
        return [json.loads(line.strip()) for line in f if line.strip()]


def save_text(data: str, path: str) -> None:
    """utility/fctn.py:78-86."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(data)


def read_text(path: str) -> str:
    """utility/fctn.py:89-97."""
    with open(path, encoding="utf-8") as f:
        return f.read()


def date2datetime(d):
    """date -> midnight datetime (utility/fctn.py:100-101)."""
    import datetime as _dt

    return _dt.datetime.combine(d, _dt.time())


def get_args_kwargs(*args, **kwargs):
    """Capture (args, kwargs) verbatim (utility/fctn.py:14-15)."""
    return args, kwargs


def get_dctns_cols_by_df(df):
    """DataFrame -> (row dicts, column list) (utility/fctn.py:18-21)."""
    cols = df.columns.values.tolist()
    dctns = [dict(zip(cols, row)) for row in df.values.tolist()]
    return dctns, cols


def get_df_by_dctns_cols(dctns, cols):
    """(row dicts, column list) -> DataFrame (utility/fctn.py:24-26)."""
    import pandas as pd

    return pd.DataFrame(dctns, columns=cols)


def pbox(box) -> None:
    """Print an iterable of lines (utility/xprint.py:3-5)."""
    for line in box:
        print(line)


def xprint(*args, flush: bool = True, **kwargs) -> None:
    """Timestamped print (utility/xprint.py)."""
    print(time.strftime("[%H:%M:%S]"), *args, flush=flush, **kwargs)
