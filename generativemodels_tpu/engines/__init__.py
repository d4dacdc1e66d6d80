from .prepare_batch import DiffusionPrepareBatch, VPredictionPrepareBatch
from .trainer import AdversarialTrainer, AdversarialTrainState, make_adversarial_train_step

__all__ = [
    "DiffusionPrepareBatch",
    "VPredictionPrepareBatch",
    "AdversarialTrainer",
    "AdversarialTrainState",
    "make_adversarial_train_step",
]
