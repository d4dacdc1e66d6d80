"""generativemodels_tpu: a TPU-native generative-models framework.

A ground-up JAX/Flax/Pallas rebuild of the capability surface of
MONAI GenerativeModels (diffusion, latent diffusion, VQ-VAE + transformer,
ControlNet, SPADE, adversarial training, perceptual/spectral losses,
FID/MMD/(MS-)SSIM metrics) designed TPU-first: channels-last compute,
`lax.scan`-compiled sampling loops, explicit RNG, pjit/shard_map data &
space parallelism over a device mesh, and Pallas flash-attention kernels.
"""

__version__ = "0.1.0"
