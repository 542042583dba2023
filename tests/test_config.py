"""Config-surface tests: defaults parity, yaml merge, dotlist overrides."""

import pytest

from fovealseg_tpu.configs import get_default_cfg


def test_default_keys_match_reference_surface():
    cfg = get_default_cfg()
    # spot-check the public key surface (config/defaults.py:7-247)
    assert cfg.MODEL.rev_deform_opt == 51
    assert cfg.MODEL.rev_deform_interp == "tri"
    assert cfg.TRAIN.deform_pretrain == 100
    assert cfg.TRAIN.edge_loss_scale == 100.0
    assert cfg.VAL.no_upsample is False
    assert cfg.DATASET.segm_downsampling_rate == 8
    assert cfg.TRAIN.def_saliency_pad_mode == "replication"


def test_yaml_and_dotlist_merge(tmp_path):
    cfg = get_default_cfg()
    cfg.merge_from_file("fovealseg_tpu/configs/deform.yaml")
    assert cfg.MODEL.arch_encoder == "hrnetv2_nodownsp"
    assert cfg.DATASET.num_class == 51
    assert cfg.TRAIN.saliency_input_size == (64, 128)  # string -> tuple

    # the README run command's dotlist grammar (README.md:73)
    cfg.merge_from_list([
        "TRAIN.task_input_size", "(80,80)",
        "MODEL.gaussian_radius", "45",
        "TRAIN.deform_joint_loss", "True",
        "VAL.no_upsample", "True",
        "DATASET.dataset_marker_train", "sp60000",
    ])
    assert cfg.TRAIN.task_input_size == (80, 80)
    assert cfg.MODEL.gaussian_radius == 45
    assert cfg.TRAIN.deform_joint_loss is True
    assert cfg.DATASET.dataset_marker_train == "sp60000"


def test_unknown_key_raises():
    cfg = get_default_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["TRAIN.nonexistent_key", "1"])


def test_freeze():
    cfg = get_default_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.DIR = "x"
    cfg.defrost()
    cfg.DIR = "y"
    assert cfg.DIR == "y"


def test_clone_independent():
    cfg = get_default_cfg()
    c2 = cfg.clone()
    c2.TRAIN.num_epoch = 999
    assert cfg.TRAIN.num_epoch != 999


def test_audit_dead_keys_warns(caplog):
    import logging

    from fovealseg_tpu.configs import audit_dead_keys, get_default_cfg

    cfg = get_default_cfg()
    assert audit_dead_keys(cfg) == []  # defaults are silent
    cfg.TRAIN.loss_fun = "NLLLoss"
    cfg.VAL.max_score = True
    cfg.TRAIN.opt_deform_LabelEdge_accrate = 1.1
    with caplog.at_level(logging.WARNING, logger="fovealseg"):
        hits = audit_dead_keys(cfg)
    assert set(hits) == {"TRAIN.loss_fun", "VAL.max_score",
                         "TRAIN.opt_deform_LabelEdge_accrate"}
    assert "dead config key" in caplog.text
    assert "zoom" in caplog.text  # the accrate upstream-bug explanation
