from .adversarial_loss import AdversarialCriterions, PatchAdversarialLoss
from .spectral_loss import JukeboxLoss

__all__ = ["AdversarialCriterions", "PatchAdversarialLoss", "JukeboxLoss"]
