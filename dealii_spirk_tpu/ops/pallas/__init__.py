from .stencil import fused_stencil_apply, fused_stencil_supported

__all__ = ["fused_stencil_apply", "fused_stencil_supported"]
