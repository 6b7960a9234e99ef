"""Dense tower building blocks: MLP factory, Dice/PReLU activations.

Replaces the reference's ``MLPLayer`` (1.MatrixCF/MLPLayer.py:17-87,
2.FM/CustomLayers.py:15-84) and ``make_mlp_layer`` factory
(2.FM/CustomLayers.py:870-888). All matmuls run in the configured compute
dtype (bfloat16 by default from the trainer) so they tile onto the MXU;
normalization statistics stay in fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Parametric ReLU with a learnable per-channel slope."""

    init_alpha: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", nn.initializers.constant(self.init_alpha), (x.shape[-1],), jnp.float32
        ).astype(x.dtype)
        return jnp.where(x > 0, x, alpha * x)


class Dice(nn.Module):
    """Data-adaptive activation: BN-normalized sigmoid gate with learnable
    alpha for the negative part (reference: 2.FM/CustomLayers.py:854-867).

    p = sigmoid(BN(x));  out = p*x + (1-p)*alpha*x
    """

    epsilon: float = 1e-9

    @nn.compact
    def __call__(self, x, train: bool = True):
        alpha = self.param(
            "alpha", nn.initializers.zeros_init(), (x.shape[-1],), jnp.float32
        ).astype(x.dtype)
        norm = nn.BatchNorm(
            use_running_average=not train,
            use_bias=False,
            use_scale=False,
            epsilon=self.epsilon,
            momentum=0.99,
            name="bn",
        )(x)
        p = nn.sigmoid(norm)
        return p * x + (1.0 - p) * alpha * x


_SIMPLE_ACTS: dict = {
    "relu": nn.relu,
    "sigmoid": nn.sigmoid,
    "tanh": jnp.tanh,
    "gelu": nn.gelu,
    "softmax": lambda x: nn.softmax(x, axis=-1),
    "linear": lambda x: x,
    None: lambda x: x,
}


class MLP(nn.Module):
    """Multi-layer dense tower.

    hidden_dims: output size per layer; activation applies to all but
    (optionally) the last layer, which uses ``out_activation``.
    use_bn/use_ln insert BatchNorm/LayerNorm before the activation
    (reference MLPLayer applies BN pre-activation, 1.MatrixCF/MLPLayer.py:60-76).
    """

    hidden_dims: Sequence[int]
    activation: str = "relu"
    out_activation: Optional[str] = None  # None → same as activation
    use_bn: bool = False
    use_ln: bool = False
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None
    kernel_init: Callable = nn.initializers.glorot_uniform()
    # tensor parallelism: when set (e.g. 'model'), Dense kernels carry
    # alternating Megatron column/row partitioning — even layers shard the
    # output width, odd layers the input width, so intermediate activations
    # stay sharded and GSPMD reduces once (SURVEY §2.10 TP row)
    tp_axis: Optional[str] = None

    def _activate(self, x, name: str, train: bool, idx: int):
        if name == "prelu":
            return PReLU(name=f"prelu_{idx}")(x)
        if name == "dice":
            return Dice(name=f"dice_{idx}")(x, train=train)
        return _SIMPLE_ACTS[name](x)

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = len(self.hidden_dims)
        for i, width in enumerate(self.hidden_dims):
            kernel_init = self.kernel_init
            bias_init = nn.initializers.zeros_init()
            if self.tp_axis is not None:
                k_spec = (None, self.tp_axis) if i % 2 == 0 else (self.tp_axis, None)
                kernel_init = nn.with_partitioning(kernel_init, k_spec)
                if i % 2 == 0:
                    bias_init = nn.with_partitioning(bias_init, (self.tp_axis,))
            x = nn.Dense(
                width,
                dtype=self.dtype,
                kernel_init=kernel_init,
                bias_init=bias_init,
                name=f"dense_{i}",
            )(x)
            is_last = i == n - 1
            if not is_last:
                if self.use_bn:
                    x = nn.BatchNorm(
                        use_running_average=not train, name=f"bn_{i}", dtype=self.dtype
                    )(x)
                if self.use_ln:
                    x = nn.LayerNorm(name=f"ln_{i}", dtype=self.dtype)(x)
            act = (
                (self.out_activation if self.out_activation is not None else self.activation)
                if is_last
                else self.activation
            )
            x = self._activate(x, act, train, i)
            if self.dropout_rate > 0 and not is_last:
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x
