from .attention import dot_product_attention, mask_to_bias, xla_attention
from .masked import (cross_entropy, gather_masked_positions, gather_span,
                     masked_cross_entropy)

__all__ = [
    "dot_product_attention", "mask_to_bias", "xla_attention",
    "cross_entropy", "gather_masked_positions", "gather_span",
    "masked_cross_entropy",
]
