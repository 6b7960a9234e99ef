from tpurec.ops.pallas.kernels import (  # noqa: F401
    cross_network_stack,
    din_attention_fused,
    fm_second_order_fused,
    pallas_available,
)
