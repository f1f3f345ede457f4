from zgml_tpu.optim.sgd import sgd_init, sgd_update, sgd_momentum_update  # noqa: F401
from zgml_tpu.optim.adam import adam_init, adam_update, AdamConfig  # noqa: F401
