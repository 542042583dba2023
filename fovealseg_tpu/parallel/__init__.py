from fovealseg_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    replicate_state,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_parallel_eval_step",
    "make_parallel_train_step",
    "replicate_state",
    "shard_batch",
]
