from .norms import rms_norm, layer_norm
from .rope import apply_rope, RopeParams
from .activations import act_fn

__all__ = ["rms_norm", "layer_norm", "apply_rope", "RopeParams", "act_fn"]
