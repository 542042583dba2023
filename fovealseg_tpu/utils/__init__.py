from fovealseg_tpu.utils.observe import RAM, SummaryWriter, device_memory_stats, setup_logger
from fovealseg_tpu.utils.visuals import rgb_img

__all__ = ["RAM", "SummaryWriter", "device_memory_stats", "setup_logger", "rgb_img"]
