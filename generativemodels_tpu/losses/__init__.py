from .adversarial_loss import AdversarialCriterions, PatchAdversarialLoss
from .perceptual import PerceptualLoss
from .spectral_loss import JukeboxLoss

__all__ = [
    "AdversarialCriterions",
    "PatchAdversarialLoss",
    "PerceptualLoss",
    "JukeboxLoss",
]
