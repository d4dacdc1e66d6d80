from .diffusion_autoencoder import SemanticEncoder, diffusion_autoencoder_loss, reconstruct
from .brain_ldm_sampler import make_conditioning, sample_brain_ldm
from .anomaly import anomaly_map, ddim_decode, ddim_encode
from .classifier_guidance import classifier_grad, sample_with_classifier_guidance
from .guidance import drop_condition, sample_with_guidance
from .inpaint import inpaint
from .train_vqgan import VQGANState, make_vqgan_step
from .train_controlnet import make_controlnet_train_step, synthetic_masked_batch
from .train_spade_ldm import one_hot_labels, synthetic_seg_batch
from .train_spade_vae import SPADEVAEState, make_spade_vae_step
from .segmentation_ddpm import make_segmentation_train_step, segment_with_uncertainty
from .eval_quality import evaluate_quality, make_feature_extractor, ms_ssim_weights_for
from .super_resolution import compute_scale_factor, prepare_sr_batch, sample_super_resolution
from .train_3d_ddpm import synthetic_volume

__all__ = [
    "SemanticEncoder",
    "diffusion_autoencoder_loss",
    "reconstruct",
    "make_conditioning",
    "sample_brain_ldm",
    "anomaly_map",
    "ddim_decode",
    "ddim_encode",
    "classifier_grad",
    "sample_with_classifier_guidance",
    "drop_condition",
    "sample_with_guidance",
    "inpaint",
    "compute_scale_factor",
    "prepare_sr_batch",
    "sample_super_resolution",
    "VQGANState",
    "make_vqgan_step",
    "make_controlnet_train_step",
    "synthetic_masked_batch",
    "one_hot_labels",
    "synthetic_seg_batch",
    "SPADEVAEState",
    "make_spade_vae_step",
    "make_segmentation_train_step",
    "segment_with_uncertainty",
    "evaluate_quality",
    "make_feature_extractor",
    "ms_ssim_weights_for",
    "synthetic_volume",
]
