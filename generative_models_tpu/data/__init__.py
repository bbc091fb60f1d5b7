"""L2 data layer: MNIST loading + the HBM-resident on-device pipeline.

Reference behavior (SURVEY.md §3.1, mount empty so paper/recall-pinned):
torchvision ``datasets.MNIST`` + ``ToTensor`` => pixels in [0, 1],
flattened to 784 inside the trainers, one host->device copy per batch.
Here the whole split is pushed to HBM once and minibatches are gathered
on device (docs/design.md §1).
"""

from generative_models_tpu.data.mnist import (  # noqa: F401
    load_dataset,
    load_mnist,
    synthetic_mnist,
    to_flat_float,
)
from generative_models_tpu.data.pipeline import (  # noqa: F401
    DeviceData,
    gather_batch,
    make_perm,
)
