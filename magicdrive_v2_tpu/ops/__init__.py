from .attention import dot_product_attention, xla_attention
from .rope import apply_rope

__all__ = ["dot_product_attention", "xla_attention", "apply_rope"]
