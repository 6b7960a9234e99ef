from tpurec.train.trainer import Trainer, TrainState  # noqa: F401
from tpurec.train import losses  # noqa: F401
