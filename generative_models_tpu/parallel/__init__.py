from generative_models_tpu.parallel.mesh import make_mesh  # noqa: F401
from generative_models_tpu.parallel.dp import batch_constrainer  # noqa: F401
