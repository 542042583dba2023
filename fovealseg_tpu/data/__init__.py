from fovealseg_tpu.data.loader import AbstractDataset, CachedDataset, prefetch
from fovealseg_tpu.data.synthetic import make_batch

__all__ = ["AbstractDataset", "CachedDataset", "prefetch", "make_batch"]
