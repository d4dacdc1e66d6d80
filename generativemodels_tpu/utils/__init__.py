from .component_store import ComponentStore
from .enums import (
    AdversarialIterationEvents,
    AdversarialKeys,
    OrderingTransformations,
    OrderingType,
    StrEnum,
)
from .misc import unsqueeze_left, unsqueeze_right
from .ordering import Ordering

__all__ = [
    "ComponentStore",
    "AdversarialIterationEvents",
    "AdversarialKeys",
    "OrderingTransformations",
    "OrderingType",
    "StrEnum",
    "unsqueeze_left",
    "unsqueeze_right",
    "Ordering",
]
from .checkpoint import CheckpointManager
from .profiling import StepTimer, annotate, trace

__all__ += ["CheckpointManager", "StepTimer", "annotate", "trace"]
from .guards import GuardState, guard_nans, init_guard

__all__ += ["GuardState", "guard_nans", "init_guard"]
from .logging import MetricsLogger

__all__ += ["MetricsLogger"]
from .export import export_fn, load_exported, load_fn, save_exported

__all__ += ["export_fn", "load_exported", "load_fn", "save_exported"]
from .compilation_cache import enable_persistent_compilation_cache

__all__ += ["enable_persistent_compilation_cache"]
