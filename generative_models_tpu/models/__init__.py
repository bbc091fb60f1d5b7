from generative_models_tpu.models.mlp import (  # noqa: F401
    linear_init,
    mlp_init,
    mlp_apply,
)
from generative_models_tpu.models import nets  # noqa: F401
