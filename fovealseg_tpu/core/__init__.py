from fovealseg_tpu.core import gaze, grid, interpolate, losses, metrics, unwarp, warp

__all__ = ["gaze", "grid", "interpolate", "losses", "metrics", "unwarp", "warp"]
