from generative_models_tpu.train.trainer import Trainer  # noqa: F401
