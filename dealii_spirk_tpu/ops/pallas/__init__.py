from .stencil import fused_stencil_supported, fused_stencil_apply, stencil_weights

__all__ = [
    "fused_stencil_supported",
    "fused_stencil_apply",
    "stencil_weights",
]
