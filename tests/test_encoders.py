"""DeepLab / SegFormer encoder tests, incl. an HF-transformers parity oracle
for SegFormer (validates MiT block math + the checkpoint-import mapping)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovealseg_tpu.models.deeplab import DeepLabEncoder
from fovealseg_tpu.models.segformer import B5, SegFormerEncoder

TINY_MIT = dict(
    depths=(1, 1, 1, 1),
    hidden_sizes=(8, 16, 24, 32),
    strides=(1, 2, 2, 2),
    patch_sizes=(7, 3, 3, 3),
    num_heads=(1, 2, 3, 4),
    sr_ratios=(8, 4, 2, 1),
    mlp_ratio=4,
)


def test_deeplab_tiny_shapes(rng):
    enc = DeepLabEncoder(layers=(1, 1, 1, 1))
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    params = enc.init({"params": jax.random.PRNGKey(0)}, x)
    (y,) = enc.apply(params, x)
    assert y.shape == (1, 32, 32, 960)
    assert np.isfinite(np.asarray(y)).all()


def test_segformer_tiny_shapes(rng):
    enc = SegFormerEncoder(cfg=TINY_MIT)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    params = enc.init({"params": jax.random.PRNGKey(0)}, x)
    (y,) = enc.apply(params, x)
    # stride-1 stage 1 -> full-res output; channels = sum(hidden)
    assert y.shape == (1, 32, 32, sum(TINY_MIT["hidden_sizes"]))


def test_segformer_matches_hf(rng):
    """Import HF Segformer weights via the shim; outputs must match."""
    transformers = pytest.importorskip("transformers")
    import torch

    from fovealseg_tpu.train.checkpoint import import_torch_state_dict

    config = transformers.SegformerConfig(
        num_labels=8,
        depths=list(TINY_MIT["depths"]),
        hidden_sizes=list(TINY_MIT["hidden_sizes"]),
        strides=list(TINY_MIT["strides"]),
        patch_sizes=list(TINY_MIT["patch_sizes"]),
        num_attention_heads=list(TINY_MIT["num_heads"]),
        sr_ratios=list(TINY_MIT["sr_ratios"]),
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    tm = transformers.SegformerForSemanticSegmentation(config).eval()

    enc = SegFormerEncoder(cfg=TINY_MIT, drop_path_rate=0.0)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    sd = {
        k: v.detach().numpy()
        for k, v in tm.state_dict().items()
        if k.startswith("segformer.")
    }
    wrapped_p = {"encoder": variables["params"]}
    wrapped_s = {"encoder": variables.get("batch_stats", {})}
    new_p, _ = import_torch_state_dict({"encoder": sd}, wrapped_p, wrapped_s)
    ours = np.asarray(enc.apply({"params": new_p["encoder"]}, jnp.asarray(x))[0])

    with torch.no_grad():
        out = tm.segformer(
            torch.from_numpy(x).permute(0, 3, 1, 2), output_hidden_states=True, return_dict=True
        )
        hs = out.hidden_states
        h1, w1 = hs[0].shape[-2:]
        import torch.nn.functional as TF

        cat = torch.cat(
            [hs[0]] + [TF.interpolate(h, (h1, w1), mode="bilinear", align_corners=False) for h in hs[1:]],
            1,
        )
        ref = cat.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
