from zgml_tpu.data.mnist import load_mnist, write_synthetic_mnist  # noqa: F401
from zgml_tpu.data.dataloader import DataLoader  # noqa: F401
