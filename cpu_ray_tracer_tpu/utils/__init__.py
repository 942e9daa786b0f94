from cpu_ray_tracer_tpu.utils.config import RenderConfig
from cpu_ray_tracer_tpu.utils import metrics, checkpoint

__all__ = ["RenderConfig", "metrics", "checkpoint"]
