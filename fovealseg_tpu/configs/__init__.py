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


# Config keys that exist for surface parity but are NEVER read by the
# reference runtime (verified: zero grep hits for `cfg.<GROUP>.<key>` outside
# config/defaults.py in /root/reference, .ipynb_checkpoints excluded).
# Setting one is almost certainly a user error — warn loudly instead of
# silently ignoring (ignoring IS reference behavior).
DEAD_REFERENCE_KEYS = {
    "DATASET": ("check_dataload", "shuffle_list", "dataset_name", "list_test",
                "adjust_crop_range", "multi_scale_aug", "mirror_padding"),
    "MODEL": ("deconv", "fix_img_gradient"),
    "TRAIN": ("fov_location_step", "auto_fov_location_step", "gpu_threshold",
              "loss_fun", "loss_weight", "scale_weight", "sync_location",
              "weight_decay_fov", "fov_scale_weight_decay", "workers",
              "mini_batch_size", "s_entropy_weight"),
    "VAL": ("F_Xlr_only", "F_Xlr_acc_map_only", "all_F_Xlr_time",
            "expand_prediection_rate_patch", "foveated_expection",
            "hard_max_fov", "max_score", "multipro", "rename_eval_folder"),
    # the reference ships no test driver: TestDataset and the whole TEST
    # group are unreachable upstream (data/odgt.py::TestDataset exists here
    # for inventory completeness)
    "TEST": ("checkpoint", "result", "batch_size"),
}


def audit_dead_keys(cfg, logger=None) -> list[str]:
    """Warn for every dead-in-the-reference key set away from its default.

    Also flags TRAIN.opt_deform_LabelEdge_accrate != 1: the reference's
    adjust_learning_rate does ``param_group['zoom'] *= accrate``
    (train_deform_semantic.py:348), turning the boolean zoom flag into a
    float — after one adjustment ``zoom == True`` comparisons fail and the
    foveation groups silently stop updating. A latent upstream bug; any
    non-1 value is refused parity here."""
    import logging

    logger = logger or logging.getLogger("fovealseg")
    defaults = get_default_cfg()
    hits = []
    for group, keys in DEAD_REFERENCE_KEYS.items():
        for k in keys:
            if getattr(getattr(cfg, group), k) != getattr(getattr(defaults, group), k):
                hits.append(f"{group}.{k}")
                logger.warning(
                    "%s.%s is set but is a dead config key in the reference "
                    "(never read by its runtime); ignoring it reproduces "
                    "reference behavior", group, k,
                )
    if cfg.VAL.F_Xlr_low_scale not in (0, 1):
        hits.append("VAL.F_Xlr_low_scale")
        logger.warning(
            "VAL.F_Xlr_low_scale=%s: this key is DEAD in the reference "
            "(declared in defaults.py:222, never read by its runtime) but "
            "LIVE here as a beyond-reference efficient-inference feature — "
            "the saliency input is downscaled %sx at inference, so eval "
            "numbers will differ from a reference run with the same config; "
            "set 0 for reference behavior",
            cfg.VAL.F_Xlr_low_scale, cfg.VAL.F_Xlr_low_scale,
        )
    if cfg.TRAIN.opt_deform_LabelEdge_accrate != 1.0:
        hits.append("TRAIN.opt_deform_LabelEdge_accrate")
        logger.warning(
            "TRAIN.opt_deform_LabelEdge_accrate=%s: in the reference this "
            "multiplies the boolean param_group['zoom'] flag "
            "(train_deform_semantic.py:348) — any value != 1 makes "
            "'zoom == True' comparisons fail after one LR adjustment and "
            "silently freezes the foveation branch; refusing to replicate "
            "the bug, treating it as 1.0",
            cfg.TRAIN.opt_deform_LabelEdge_accrate,
        )
    return hits


__all__ = ["CfgNode", "get_default_cfg", "cfg", "setup_compile_cache",
           "audit_dead_keys", "DEAD_REFERENCE_KEYS"]
