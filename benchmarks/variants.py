"""Encoder-variant throughput (warped-domain forward, b8, bf16) with the
RTT-corrected timing (benchmarks/timing.py). ``--int8`` additionally times
each variant under W8A8 serving quantization (TPU.quantize="int8" —
models/layers.py), which accelerates >=128-channel convs ~1.7-2x on the
v5e int8 MXU: the wide-conv encoders (deeplab OS8, segformer) are where
that matters."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fovealseg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks.timing import time_op
from fovealseg_tpu.models.deform_module import DeformConfig, DeformSegmentation

B = 8


def main():
    results = {}
    for arch, fc_dim in (
        ("hrnetv2_nodownsp", 960),
        ("segformer", 1024),
        ("deeplab", 960),
    ):
        cfg = DeformConfig(
            task_hw=(80, 80), task_hw_infer=(80, 80), saliency_hw=(80, 80),
            gaussian_radius=45, num_class=51, arch_encoder=arch, fc_dim=fc_dim,
        )
        module = DeformSegmentation(config=cfg, dtype=jnp.bfloat16)
        x = jnp.zeros((B, 640, 640, 3), jnp.float32)
        f = jnp.full((B, 2), 0.5, jnp.float32)
        shapes = jax.eval_shape(module.init, {"params": jax.random.PRNGKey(0)}, x, f)
        v = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
        dt = time_op(lambda x: module.apply(v, x, f, train=False)["pred"], x, n1=5, n2=25)
        results[arch] = {"ms_b8": dt * 1e3, "fps": B / dt}
        print(f"{arch}: {dt*1e3:.2f} ms/b8 -> {B/dt:.0f} fps", flush=True)
        if "--int8" in sys.argv:
            from fovealseg_tpu.models import layers

            with layers.quantization(True):
                fq = jax.jit(lambda x: module.apply(v, x, f, train=False)["pred"])
                fq(x)  # trace under the flag
            dtq = time_op(fq, x, n1=5, n2=25)
            results[arch]["int8_ms_b8"] = dtq * 1e3
            results[arch]["int8_fps"] = B / dtq
            print(f"{arch} int8: {dtq*1e3:.2f} ms/b8 -> {B/dtq:.0f} fps ({dt/dtq:.2f}x)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
