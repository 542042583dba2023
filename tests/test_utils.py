"""Utility-surface tests: torch_tools, visuals, aria filenames, trimap,
croper/metrics/earlystop, observe io."""

import numpy as np

from fovealseg_tpu.core.metrics import trimap_accuracy, trimap_band
from fovealseg_tpu.data.aria_adt import fname2info, info2fname, make_cache_summary
from fovealseg_tpu.utils.dynamicfocus import (
    EarlyStopMax,
    EarlyStopMin,
    calc_confusion_matrix,
    calc_metrics,
    evaluate_segmentation,
    get_idxs_crop4,
)
from fovealseg_tpu.utils.observe import RAM, load_json, save_json, xprint
from fovealseg_tpu.utils.torch_tools import (
    cross_fold,
    cross_unfold,
    get_padding,
    interpolate_int,
)
from fovealseg_tpu.utils.visuals import generate_colormap_colors, red_dot_overlay, rgb_img


def test_cross_fold_roundtrip(rng):
    x = rng.integers(0, 9, (2, 8, 16))
    assert (cross_fold(cross_unfold(x, 2)) == x).all()


def test_interpolate_int_majority():
    x = np.array([[1, 1, 2, 2], [1, 3, 2, 2], [0, 0, 5, 5], [0, 0, 5, 5]])
    out = interpolate_int(x, degree=1)
    assert out.tolist() == [[1, 2], [0, 5]]


def test_get_padding():
    l, r, t, b = get_padding(30, 62, 32)
    assert (30 + t + b) % 32 == 0 and (62 + l + r) % 32 == 0


def test_rgb_img_palette():
    colors = generate_colormap_colors(51)
    assert len(colors) == 51 and colors[-1] == (0, 0, 0)
    img = rgb_img(np.array([[0, 50], [25, 1]]))
    arr = np.asarray(img)
    assert arr.shape == (2, 2, 3)
    assert (arr[0, 1] == 0).all()  # background is black


def test_red_dot_overlay():
    img = np.zeros((8, 8, 3), np.float32)
    m = np.zeros((8, 8), bool)
    m[4, 4] = True
    out = red_dot_overlay(img, m)
    assert (out[4, 4] == [1, 0, 0]).all()
    assert (out[3, 4] == [1, 0, 0]).all()  # dilated


def test_aria_fname_roundtrip(tmp_path):
    info = {"fid": [12], "ts": [123, 456], "cat": "chair", "gz": [100, 200], "cid": [7]}
    name = info2fname(info) + ".png"
    parsed = fname2info(name)
    assert parsed["fid"] == [12] and parsed["cat"] == "chair" and parsed["gz"] == [100, 200]
    # summary over a dir
    from PIL import Image

    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(tmp_path / name)
    # a mask sidecar must neither crash the int parse nor count as a sample
    np.save(tmp_path / (info2fname(info) + ".Y.npy"), np.zeros((4, 4), np.uint8))
    rows = make_cache_summary(str(tmp_path))
    assert len(rows) == 1 and rows[0]["cid"] == [7]


def test_trimap_band_and_accuracy():
    lab = np.zeros((16, 16), np.int64)
    lab[:, 8:] = 1
    band = trimap_band(lab, width=2)
    assert band[:, 7].all() and band[:, 9].all() and not band[:, 0].any()
    pred = lab.copy()
    assert trimap_accuracy(pred, lab, 2) == 1.0


def test_croper_bounds():
    for args in [(0, 0, 16, 16, 4, 4), (15, 15, 16, 16, 4, 4), (8, 8, 16, 16, 5, 5)]:
        left, right, up, bottom = get_idxs_crop4(*args)
        assert 0 <= left < right <= 16 and 0 <= up < bottom <= 16
        assert right - left == args[5] and bottom - up == args[4]


def test_dynamicfocus_metrics(rng):
    preds = rng.integers(0, 3, 100)
    tgts = rng.integers(0, 3, 100)
    cm = calc_confusion_matrix(preds, tgts, 3)
    assert cm.sum() == 300  # each class row sums to N
    iou, f1, acc, p, r = calc_metrics(cm)
    assert ((0 <= iou) & (iou <= 1)).all()
    seg_iou, *_ = evaluate_segmentation(rng.uniform(0, 1, (2, 8, 8)), rng.uniform(0, 1, (2, 8, 8)))
    assert len(seg_iou) == 2


def test_nn_a1_tools_torch_parity(rng):
    """cd_cdf / a_gd_cdf / standardize / scale01 vs the reference torch
    formulas (DynamicFocus/d_model/nn_A1_tools.py:4-43)."""
    import torch

    from fovealseg_tpu.utils.dynamicfocus import (
        a_gd_cdf,
        cd_cdf,
        scale01_bchw,
        standardize_bchw,
    )

    x = rng.normal(0, 2, (4, 3, 8, 8)).astype(np.float32)
    t = torch.from_numpy(x)
    np.testing.assert_allclose(
        cd_cdf(x), (torch.arctan(t) / torch.pi + 0.5).numpy(), rtol=1e-5, atol=1e-6)
    c = torch.sqrt(torch.tensor(2.0 / torch.pi))
    np.testing.assert_allclose(
        a_gd_cdf(x), (torch.tanh(c * t) / 2.0 + 0.5).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(standardize_bchw(x), ((t - 0.5) / 0.5).numpy(), rtol=1e-6)
    # reference scale01: in-place 1 - (max - x)/(max - min) == min-max to [0,1]
    vmax = t.amax(dim=(-2, -1), keepdim=True)
    vmin = t.amin(dim=(-2, -1), keepdim=True)
    ref = (1.0 - (vmax - t) / (vmax - vmin)).numpy()
    np.testing.assert_allclose(scale01_bchw(x), ref, rtol=1e-5)
    one = np.ones((1, 1, 1, 1), np.float32)
    assert (scale01_bchw(one) == one).all()


def test_earlystop():
    m = EarlyStopMin()
    assert m.check(1.0) and not m.check(2.0) and m.check(0.5)
    x = EarlyStopMax()
    assert x.check(1.0) and not x.check(0.5) and x.check(2.0)


def test_observe_io(tmp_path):
    save_json({"a": 1}, str(tmp_path / "x.json"))
    assert load_json(str(tmp_path / "x.json")) == {"a": 1}
    bag = RAM()
    bag.t = np.ones(3)
    bag.gc()
    assert not hasattr(bag, "t")
    xprint("hello")


def test_ade_metadata_surface(tmp_path):
    """object150_info/color150 stand-ins (reference data assets)."""
    from fovealseg_tpu.utils.ade import class_names, class_palette, color_encode, load_object_info

    # synthesized fallback
    names = class_names(None, 5)
    assert names == [f"class_{i}" for i in range(5)]
    # csv with the reference schema
    p = tmp_path / "obj.csv"
    p.write_text("Idx,Ratio,Train,Val,Stuff,Name\n1,0.15,1000,100,1,wall\n2,0.1,900,90,0,building;edifice\n")
    rows = load_object_info(str(p))
    assert rows[0]["name"] == "wall" and rows[1]["name"] == "building"
    pal = class_palette(51)
    assert pal.shape == (51, 3) and pal.dtype.name == "uint8"
    assert (pal[-1] == 0).all()  # background black
    img = color_encode([[0, 1], [2, 50]], 51)
    assert img.shape == (2, 2, 3)


def test_parse_devices_reference_grammar():
    from fovealseg_tpu.utils.misc import NotSupportedCliException, parse_devices

    assert parse_devices("0-3") == ["gpu0", "gpu1", "gpu2", "gpu3"]
    assert parse_devices("gpu0,gpu2") == ["gpu0", "gpu2"]
    assert parse_devices("0,1,1") == ["gpu0", "gpu1"]  # dedup
    assert parse_devices("gpu3-gpu1") == ["gpu1", "gpu2", "gpu3"]  # reversed
    import pytest

    with pytest.raises(NotSupportedCliException):
        parse_devices("tpu0")


def test_misc_utils(tmp_path):
    import numpy as np

    from fovealseg_tpu.utils.misc import (
        accuracy_ltds,
        find_recursive,
        preprocessing_accuracy,
    )

    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "x.jpg").write_bytes(b"")
    (tmp_path / "y.jpg").write_bytes(b"")
    (tmp_path / "z.png").write_bytes(b"")
    assert len(find_recursive(str(tmp_path), ".jpg")) == 2

    preds = np.array([1, 0, 1, 1])
    label = np.array([1, 0, -1, 0])
    acc, n = accuracy_ltds(preds, label)
    assert n == 3 and abs(acc - 2 / 3) < 1e-6

    lt, lp = preprocessing_accuracy(
        np.array([0, 1, 8, 2]), np.array([0.6, 0.4, 0.9, 0.2]), n_class=2
    )
    # label 8 masked, label 2 out of range masked
    assert lt.tolist() == [0, 1] and lp.tolist() == [1, 0]


def test_torch_tools_tail_parity(rng):
    """add_alpha/kernel_swap/gaussian_function/gen_focus/str_shape vs the
    exec'd reference torch_tools (utility/torch_tools.py:14-95)."""
    import torch

    from fovealseg_tpu.utils.torch_tools import (
        add_alpha,
        gaussian_function,
        gen_focus_gaussian_hw,
        get_padding_to_canvas,
        kernel_swap,
        str_tensor_shape,
    )
    from tests.ref_oracle import load_ref_module

    ref = load_ref_module("DynamicFocus/utility/torch_tools.py", "ref_torch_tools")

    img = rng.random((2, 3, 5, 7)).astype(np.float32)
    a = rng.random((5, 7)).astype(np.float32)
    for alpha in (None, a):
        ours = add_alpha(img, alpha)
        theirs = ref.add_alpha(
            torch.from_numpy(img), None if alpha is None else torch.from_numpy(alpha)
        ).numpy()
        np.testing.assert_allclose(ours, theirs)

    x = rng.random((2, 4, 6, 3, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        kernel_swap(x), ref.kernel_swap(torch.from_numpy(x)).numpy()
    )

    t = rng.random(32).astype(np.float32) * 10 - 5
    np.testing.assert_allclose(
        gaussian_function(t, mean=1.0, std=2.5),
        ref.gaussian_function(torch.from_numpy(t), mean=1.0, std=2.5).numpy(),
        rtol=1e-6,
    )

    np.testing.assert_allclose(
        gen_focus_gaussian_hw(3, 9, 16, 24, std=8.0),
        ref.gen_focus_Gaussian_HxW(3, 9, 16, 24, std=8.0).numpy(),
        rtol=1e-5,
    )

    assert get_padding_to_canvas(30, 62, 64, 64) == ref.get_padding(30, 62, 64, 64)
    assert str_tensor_shape(img) == ref.str_tensor_shape(torch.from_numpy(img)) == "2x3x5x7"


def test_fctn_io_tail(tmp_path):
    import datetime

    from fovealseg_tpu.utils.observe import (
        date2datetime,
        get_args_kwargs,
        get_dctns_cols_by_df,
        get_df_by_dctns_cols,
        pbox,
        read_jsonl,
        read_text,
        save_jsonl,
        save_text,
    )

    rows = [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]
    p = tmp_path / "r.jsonl"
    save_jsonl(rows, str(p))
    assert read_jsonl(str(p)) == rows

    t = tmp_path / "t.txt"
    save_text("héllo\nworld", str(t))
    assert read_text(str(t)) == "héllo\nworld"

    dt = date2datetime(datetime.date(2026, 8, 20))
    assert dt == datetime.datetime(2026, 8, 20, 0, 0)

    args, kwargs = get_args_kwargs(1, 2, k=3)
    assert args == (1, 2) and kwargs == {"k": 3}

    df = get_df_by_dctns_cols(rows, ["a", "b"])
    dctns, cols = get_dctns_cols_by_df(df)
    assert dctns == rows and cols == ["a", "b"]

    pbox(["line1", "line2"])  # smoke: prints without error


def test_plot_helpers(tmp_path):
    from fovealseg_tpu.utils.plot import plt_imgshow, plt_multi_imgshow

    rgb = np.random.default_rng(0).random((3, 8, 10)).astype(np.float32)
    gray = rgb[0]
    cax = plt_imgshow(rgb, "rgb")
    assert cax is not None
    fig = plt_multi_imgshow([rgb, gray, None], ["a", "b", "c"], row_col=(1, 3))
    out = tmp_path / "fig.png"
    fig.savefig(str(out))
    assert out.stat().st_size > 0


def test_nn_a0_model_info(capsys):
    import jax
    import jax.numpy as jnp

    from fovealseg_tpu.utils.observe import (
        byte2mb,
        calc_model_memsize,
        calc_tensor_memsize,
        init_weights_random,
        init_weights_zero,
        show_model_info,
        try_device,
    )

    params = {
        "conv": {"kernel": jnp.ones((3, 3, 4, 8), jnp.float32), "bias": jnp.zeros((8,))},
        "dense": {"kernel": jnp.ones((8, 2), jnp.float32)},
    }
    assert byte2mb(1024**2) == 1.0
    assert abs(calc_tensor_memsize(np.zeros((256, 1024), np.float32), "MB") - 1.0) < 1e-9
    total = calc_model_memsize(params, "KB", show=False)
    n_ele = 3 * 3 * 4 * 8 + 8 + 16
    assert abs(total - n_ele * 4 / 1024) < 1e-6

    ele, mem = show_model_info(params, show_details=True)
    out = capsys.readouterr().out
    assert ele == n_ele and "conv.kernel" in out and "Total Trainable" in out

    z = init_weights_zero(params)
    assert all(float(jnp.abs(p).max()) == 0.0 for p in jax.tree.leaves(z))
    params["bn"] = {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))}
    r = init_weights_random(params, jax.random.PRNGKey(0))
    ker = r["conv"]["kernel"]
    # torch xavier_normal_ fans include the receptive field:
    # std = sqrt(2 / (4*9 + 8*9)) ~ 0.136
    assert abs(float(ker.std()) - 0.136) < 0.05
    assert float(jnp.abs(r["conv"]["bias"]).max()) == 0.0  # biases zeroed
    # BN scale ~ N(1, 0.02)
    assert abs(float(r["bn"]["scale"].mean()) - 1.0) < 0.05
    assert float(r["bn"]["scale"].std()) < 0.1
    assert try_device("cpu").platform == "cpu"
