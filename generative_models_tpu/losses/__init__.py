from generative_models_tpu.losses.base import (  # noqa: F401
    AdversarialSpec,
    SingleModelSpec,
)
from generative_models_tpu.losses.registry import (  # noqa: F401
    available_variants,
    get_variant,
)
