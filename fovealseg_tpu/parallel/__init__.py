from fovealseg_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_spatial,
    make_parallel_eval_step,
    make_parallel_train_step,
    make_spatial_infer_fn,
    replicate_state,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_mesh_spatial",
    "make_parallel_eval_step",
    "make_parallel_train_step",
    "make_spatial_infer_fn",
    "replicate_state",
    "shard_batch",
]
