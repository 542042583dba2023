"""Spatial partitioning (b1-latency serving): the spatially sharded forward
must equal the single-device forward bit-for-bit up to reduction order.

This is the beyond-reference scaling axis for single-frame latency — the
warped task image's rows are sharded over a 1-D 'spatial' mesh and XLA's
SPMD partitioner runs the conv trunk with automatic halo exchanges
(parallel/mesh.py::make_spatial_infer_fn)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.parallel.mesh import make_mesh_spatial, make_spatial_infer_fn


@pytest.fixture(scope="module")
def setup():
    cfg = DeformConfig(
        task_hw=(16, 16),
        task_hw_infer=(16, 16),
        saliency_hw=(16, 16),
        gaussian_radius=5,
        num_class=8,
        arch_encoder="hrnetv2_nodownsp_tiny",
    )
    module = DeformSegmentation(config=cfg)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    f = jnp.asarray([[0.5, 0.5], [0.25, 0.75]], jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(0)}, x, f)
    return cfg, module, variables, x, f


def test_spatial_forward_matches_single_device(setup):
    cfg, module, variables, x, f = setup
    ref = jax.jit(
        lambda v, x, f: module.apply(v, x, f, train=False)["pred"]
    )(variables, x, f)

    mesh = make_mesh_spatial(4)
    _, fn = make_spatial_infer_fn(cfg, mesh)
    sp = fn(variables, x, f)
    assert sp.shape == ref.shape
    np.testing.assert_allclose(np.asarray(sp), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_spatial_infer_full_res_matches(setup):
    cfg, module, variables, x, f = setup
    ref = jax.jit(
        lambda v, x, f: module.apply(v, x, f, method=DeformSegmentation.infer)
    )(variables, x, f)

    mesh = make_mesh_spatial(4)
    _, fn = make_spatial_infer_fn(cfg, mesh, method="infer")
    sp = fn(variables, x, f)
    np.testing.assert_allclose(
        np.asarray(sp["pred_sampled"]), np.asarray(ref["pred_sampled"]),
        rtol=1e-5, atol=1e-5,
    )


def test_spatial_infer_argmax_serving_matches(setup):
    cfg, module, variables, x, f = setup
    ref = jax.jit(
        lambda v, x, f: module.apply(
            v, x, f, method=DeformSegmentation.infer, argmax_labels=True
        )["pred_label"]
    )(variables, x, f)

    mesh = make_mesh_spatial(8)
    _, fn = make_spatial_infer_fn(cfg, mesh, method="infer", argmax_labels=True)
    sp = fn(variables, x, f)["pred_label"]
    assert (np.asarray(sp) == np.asarray(ref)).all()
