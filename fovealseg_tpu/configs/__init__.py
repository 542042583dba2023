from fovealseg_tpu.configs.cfg_node import CfgNode
from fovealseg_tpu.configs.defaults import get_default_cfg

# Module-level default tree, analogous to the reference's `cfg` singleton
# (/root/reference/config/__init__.py:1). Prefer get_default_cfg() + explicit
# passing; this exists for CLI-surface parity.
cfg = get_default_cfg()

__all__ = ["CfgNode", "get_default_cfg", "cfg"]
