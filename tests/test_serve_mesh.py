"""Batch-sharded GSPMD serving equals single-device serving (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation
from fovealseg_tpu.parallel.mesh import make_mesh


def test_mesh_sharded_serving_matches_single_device(rng):
    cfg = DeformConfig(
        task_hw=(12, 12), task_hw_infer=(12, 12), saliency_hw=(12, 12),
        gaussian_radius=5, num_class=7, arch_encoder="hrnetv2_nodownsp_tiny",
    )
    module = DeformSegmentation(config=cfg)
    x = jnp.asarray(rng.uniform(0, 1, (8, 48, 48, 3)), jnp.float32)
    f = jnp.asarray(rng.uniform(0.3, 0.7, (8, 2)), jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(0)}, x, f)

    def serve_fn(v, x, f):
        return module.apply(
            v, x, f, argmax_labels=True, method=DeformSegmentation.infer
        )["pred_label"]

    single = jax.jit(serve_fn)(variables, x, f)

    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())
    split = NamedSharding(mesh, P("data"))
    sharded_serve = jax.jit(
        serve_fn, in_shardings=(repl, split, split), out_shardings=split
    )
    sharded = sharded_serve(
        jax.device_put(variables, repl),
        jax.device_put(x, split),
        jax.device_put(f, split),
    )
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))
