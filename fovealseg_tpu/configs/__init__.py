from fovealseg_tpu.configs.cfg_node import CfgNode
from fovealseg_tpu.configs.defaults import get_default_cfg

# Module-level default tree, analogous to the reference's `cfg` singleton
# (/root/reference/config/__init__.py:1). Prefer get_default_cfg() + explicit
# passing; this exists for CLI-surface parity.
cfg = get_default_cfg()


def setup_compile_cache(cfg) -> None:
    """Enable the persistent XLA compile cache (TPU.compile_cache_dir).

    Called by the CLIs after config merge; flagship graphs compile in
    minutes cold and reload in seconds from the cache."""
    import os

    d = cfg.TPU.compile_cache_dir
    if not d:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser(d))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


__all__ = ["CfgNode", "get_default_cfg", "cfg", "setup_compile_cache"]
