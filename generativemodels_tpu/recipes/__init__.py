from .guidance import drop_condition, sample_with_guidance
from .inpaint import inpaint

__all__ = ["drop_condition", "sample_with_guidance", "inpaint"]
