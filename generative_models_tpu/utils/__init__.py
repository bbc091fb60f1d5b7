from generative_models_tpu.utils.metrics import MetricsLogger  # noqa: F401
from generative_models_tpu.utils.viz import save_image_grid  # noqa: F401
