from .attention import attention_bias, multi_head_attention, xla_attention
from .rotary import apply_rotary, rope_tables

__all__ = [
    "attention_bias",
    "multi_head_attention",
    "xla_attention",
    "apply_rotary",
    "rope_tables",
]
