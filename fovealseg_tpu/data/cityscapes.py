"""Cityscapes gaze-instance preprocessing + runtime dataset.

Rebuild of /root/reference/DynamicFocus/e_preprocess_scripts/
{b3_preprocess_cityscapes.py:147-700, b5_..._rgblabel.py:86-409}: walk the
gtFine polygon jsons, rasterize one polygon instance per sample, pick a
random gaze pixel inside it, downscale 1024x2048 -> 512x1024, and write
cooked mask files with metadata in the filename (the b3 grammar
``{split}_{cid}_k{classid}_{key}_{gy}x{gx}_{1xHxW}``); the runtime dataset
returns (X, F, Y_seg, Y_cls) like the LVIS path. The reference's
multiprocessing shared-memory RAM cache (b3 ``_Parallel``) is covered by
``fovealseg_tpu.data.loader.CachedLoader``.
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass

import numpy as np

from fovealseg_tpu.data.lvis import rasterize_polygon

# Cityscapes label name -> contiguous training id (19-class convention)
CITYSCAPES_CLASSES = [
    "road", "sidewalk", "building", "wall", "fence", "pole", "traffic light",
    "traffic sign", "vegetation", "terrain", "sky", "person", "rider", "car",
    "truck", "bus", "train", "motorcycle", "bicycle",
]
NAME_TO_ID = {n: i for i, n in enumerate(CITYSCAPES_CLASSES)}


@dataclass
class PreprocessCityscapes:
    """Offline cooker over gtFine polygon jsons."""

    gtfine_dir: str  # e.g. .../gtFine/train
    out_dir: str
    canvas_hw: tuple = (512, 1024)  # 1024x2048 downscaled by 2 (b3)
    seed: int = 0

    def cook(self, max_samples: int = -1) -> list[str]:
        rng = random.Random(self.seed)
        os.makedirs(self.out_dir, exist_ok=True)
        written = []
        for root, _, files in os.walk(self.gtfine_dir):
            for name in sorted(files):
                if not name.endswith("_polygons.json"):
                    continue
                with open(os.path.join(root, name)) as f:
                    meta = json.load(f)
                h0, w0 = meta["imgHeight"], meta["imgWidth"]
                sy = self.canvas_hw[0] / h0
                sx = self.canvas_hw[1] / w0
                key = name.replace("_gtFine_polygons.json", "")
                for oi, obj in enumerate(meta.get("objects", [])):
                    cid = NAME_TO_ID.get(obj["label"])
                    if cid is None:
                        continue
                    poly = np.asarray(obj["polygon"], np.float64)
                    poly[:, 0] *= sx
                    poly[:, 1] *= sy
                    mask = rasterize_polygon(poly, *self.canvas_hw)
                    ys, xs = np.nonzero(mask)
                    if len(ys) == 0:
                        continue
                    k = rng.randrange(len(ys))
                    fname = (
                        f"cityscapes_c{cid:02d}_k{cid}_{key}-{oi}_"
                        f"{int(ys[k])}x{int(xs[k])}_1x{self.canvas_hw[0]}x{self.canvas_hw[1]}"
                    )
                    path = os.path.join(self.out_dir, fname + ".Y.npy")
                    np.save(path, mask)
                    written.append(path)
                    if 0 < max_samples <= len(written):
                        return written
        return written


class DatasetCityscapes:
    """Runtime dataset over cooked Cityscapes files (b3 DatasetCityScapes /
    b5 RGBLabel variants). Image loading mirrors the LVIS dataset: the
    leftImg8bit frame keyed by the sample name when ``image_root`` is set,
    otherwise a deterministic synthetic texture."""

    def __init__(self, cook_dir: str, image_root: str | None = None):
        self.image_root = image_root
        self.items = []
        for name in sorted(os.listdir(cook_dir)):
            if not name.endswith(".Y.npy"):
                continue
            stem = name[: -len(".Y.npy")]
            parts = stem.split("_")
            caty, cid, kid = parts[:3]
            fpos, ihw = parts[-2:]
            key = "_".join(parts[3:-2])  # frame keys contain underscores
            gy, gx = map(int, fpos.split("x"))
            _, h, w = map(int, ihw.split("x"))
            self.items.append(
                dict(path=os.path.join(cook_dir, name), key=key, cls=int(kid[1:]),
                     gaze=(gy, gx), hw=(h, w))
            )

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int) -> dict:
        it = self.items[idx]
        mask = np.load(it["path"]).astype(np.float32)
        h, w = mask.shape
        img = self._load_image(it, (h, w))
        return {
            "img_data": img,
            "focus_point": np.asarray([it["gaze"][0] / h, it["gaze"][1] / w], np.float32),
            "seg_label": mask,
            "cls_label": np.int32(it["cls"]),
        }

    def _load_image(self, it, hw):
        if self.image_root:
            from PIL import Image

            base = it["key"].rsplit("-", 1)[0]
            p = os.path.join(self.image_root, base + "_leftImg8bit.png")
            if os.path.exists(p):
                im = Image.open(p).convert("RGB").resize((hw[1], hw[0]))
                return np.asarray(im, np.float32) / 255.0
        rng = np.random.default_rng(abs(hash(it["key"])) % (2**31))
        return rng.uniform(0, 1, (*hw, 3)).astype(np.float32)

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0):
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            samples = [self[int(j)] for j in order[i : i + batch_size]]
            yield {k: np.stack([s[k] for s in samples]) for k in samples[0]}


# ---------------------------------------------------------------------------
# b4/b5 "rgblabel" variant: decode the color-rendered gtFine label PNG into a
# 20-class id mask (b4_preprocess_cityscapes_rgblabel.py:48-70 labels_valid;
# b5_preprocess_cityscapes_rgblabel_mask.py:191-236 make_a_sample).
# Constant data table from the reference (the custom id column, NOT the
# cityscapes trainId): (name, custom_id, color).
RGBLABEL_ROWS = [
    ("unlabeled", 0, (0, 0, 0)),
    ("motorcycle", 1, (0, 0, 230)),
    ("rider", 2, (255, 0, 0)),
    ("traffic light", 3, (250, 170, 30)),
    ("bus", 4, (0, 60, 100)),
    ("train", 5, (0, 80, 100)),
    ("truck", 6, (0, 0, 70)),
    ("bicycle", 7, (119, 11, 32)),
    ("traffic sign", 8, (220, 220, 0)),
    ("wall", 9, (102, 102, 156)),
    ("fence", 10, (190, 153, 153)),
    ("terrain", 11, (152, 251, 152)),
    ("person", 12, (220, 20, 60)),
    ("pole", 13, (153, 153, 153)),
    ("sky", 14, (70, 130, 180)),
    ("sidewalk", 15, (244, 35, 232)),
    ("car", 16, (0, 0, 142)),
    ("vegetation", 17, (107, 142, 35)),
    ("building", 18, (70, 70, 70)),
    ("road", 19, (128, 64, 128)),
]


def decode_rgb_label(label_rgb: np.ndarray) -> np.ndarray:
    """uint8 color label image [H, W, 3] -> uint8 class-id mask [H, W].

    Exact color matching against the 19 valid colors (unlabeled/unknown
    colors stay 0), replicating the b5 per-color equality loop
    (b5_preprocess_cityscapes_rgblabel_mask.py:205-223)."""
    rgb = np.asarray(label_rgb, np.uint8)
    out = np.zeros(rgb.shape[:2], np.uint8)
    for _, cid, color in RGBLABEL_ROWS[1:]:
        out[(rgb == np.asarray(color, np.uint8)).all(-1)] = cid
    return out


@dataclass
class PreprocessCityscapesRGBLabel:
    """b5 cooker: center-crop the frame + color label to ``crop_hw``, decode
    the label colors, and write ``{itemkey}_{C}x{H}x{W}.uint8.{X,Y}.npy``
    pairs with the reference's filename grammar (itemkey underscores become
    dashes; .npy replaces torch .pt)."""

    x_dir: str  # leftImg8bit frames
    y_dir: str  # gtFine *_gtFine_color.png renders
    out_dir: str
    crop_hw: tuple = (1024, 2048)

    def cook(self, max_samples: int = -1) -> list[str]:
        from PIL import Image

        os.makedirs(self.out_dir, exist_ok=True)
        key2x = {}
        for root, _, files in os.walk(self.x_dir):
            for f in files:
                if f.endswith(".png") and "_leftImg8bit" in f:
                    key2x[f.split("_leftImg8bit")[0]] = os.path.join(root, f)
        written = []
        for root, _, files in os.walk(self.y_dir):
            for f in sorted(files):
                if not f.endswith("_gtFine_color.png"):
                    continue
                key = f.split("_gtFine_color")[0]
                if key not in key2x:
                    continue
                x = np.asarray(Image.open(key2x[key]).convert("RGB"), np.uint8)
                y_rgb = np.asarray(Image.open(os.path.join(root, f)).convert("RGB"), np.uint8)
                ch, cw = self.crop_hw
                hs = max(0, x.shape[0] // 2 - ch // 2)
                ws = max(0, x.shape[1] // 2 - cw // 2)
                x = x[hs:hs + ch, ws:ws + cw]
                y = decode_rgb_label(y_rgb[hs:hs + ch, ws:ws + cw])
                itemkey = key.replace("_", "-")
                stem_y = f"{itemkey}_1x{y.shape[0]}x{y.shape[1]}.uint8.Y.npy"
                stem_x = f"{itemkey}_3x{x.shape[0]}x{x.shape[1]}.uint8.X.npy"
                np.save(os.path.join(self.out_dir, stem_y), y)
                np.save(os.path.join(self.out_dir, stem_x), x)
                written.append(stem_y)
                if 0 < max_samples <= len(written):
                    return written
        return written


class DatasetCityscapesRGBLabel:
    """Runtime twin of DatasetCityScapesRGBLabelMask (b5:261-333): yields
    (X float32 [H, W, 3] in [0,1], Y int32 [H, W] with ids 0..19)."""

    NUM_CLASS = len(RGBLABEL_ROWS)  # 20 (id 0 = unlabeled)

    def __init__(self, cook_dir: str):
        self.cook_dir = cook_dir
        self.names = sorted(n for n in os.listdir(cook_dir) if n.endswith(".Y.npy"))

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx: int) -> dict:
        fname_y = self.names[idx]
        itemkey, ixhxw = fname_y.split(".")[0].split("_")
        fname_x = f"{itemkey}_3x{ixhxw[2:]}.uint8.X.npy"
        y = np.load(os.path.join(self.cook_dir, fname_y)).astype(np.int32)
        x = np.load(os.path.join(self.cook_dir, fname_x)).astype(np.float32) / 255.0
        return {"img_data": x, "seg_label": y}
