from .config import ARCH_REGISTRY, ArchTraits, ModelConfig
from .loader import LoadedModel, load_model
from .transformer import make_forward

__all__ = [
    "ARCH_REGISTRY",
    "ArchTraits",
    "ModelConfig",
    "LoadedModel",
    "load_model",
    "make_forward",
]
