from tpurec.ops.mlp import MLP, Dice, PReLU  # noqa: F401
from tpurec.ops import interactions  # noqa: F401
