"""generativemodels_tpu: a TPU-native generative-models framework.

A ground-up JAX/Flax/Pallas rebuild of the capability surface of
MONAI GenerativeModels (diffusion, latent diffusion, VQ-VAE + transformer,
ControlNet, SPADE, adversarial training, perceptual/spectral losses,
FID/MMD/(MS-)SSIM metrics) designed TPU-first: channels-last compute,
`lax.scan`-compiled sampling loops, explicit RNG, pjit/shard_map data &
space parallelism over a device mesh, and Pallas flash-attention kernels.

Subpackage layout mirrors the reference (networks/inferers/losses/metrics/
engines/utils) plus TPU-native additions (ops/parallel/config/data/recipes).
Top-level re-exports cover the most common entry points.
"""

__version__ = "0.1.0"

from .inferers import (  # noqa: E402,F401
    ControlNetDiffusionInferer,
    ControlNetLatentDiffusionInferer,
    DiffusionInferer,
    LatentDiffusionInferer,
    VQVAETransformerInferer,
)
from .networks.nets import (  # noqa: E402,F401
    AutoencoderKL,
    ControlNet,
    DecoderOnlyTransformer,
    DiffusionModelEncoder,
    DiffusionModelUNet,
    MultiScalePatchDiscriminator,
    PatchDiscriminator,
    SPADEAutoencoderKL,
    SPADEDiffusionModelUNet,
    SPADENet,
    VQVAE,
)
from .networks.schedulers import (  # noqa: E402,F401
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    NoiseSchedules,
    PNDMScheduler,
    Scheduler,
)
from .losses import (  # noqa: E402,F401
    AdversarialCriterions,
    JukeboxLoss,
    PatchAdversarialLoss,
    PerceptualLoss,
    feature_matching_loss,
)
from .metrics import (  # noqa: E402,F401
    FIDMetric,
    MMDMetric,
    MultiScaleSSIMMetric,
    SSIMMetric,
)
