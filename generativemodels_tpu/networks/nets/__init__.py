from .diffusion_model_unet import DiffusionModelEncoder, DiffusionModelUNet

__all__ = ["DiffusionModelEncoder", "DiffusionModelUNet"]
