"""Multimodal (mtmd) subsystem — the TPU-native analogue of
tools/mtmd/ (mtmd.cpp + clip.cpp): vision encoding, prompt splicing
around image markers, and multimodal generation on top of the Engine.
"""

from .audio import AudioConfig, load_mmproj_audio, make_audio_forward
from .clip import ClipConfig, load_mmproj, make_vision_forward, preprocess_image
from .pipeline import MtmdPipeline

__all__ = [
    "AudioConfig",
    "ClipConfig",
    "load_mmproj",
    "load_mmproj_audio",
    "make_audio_forward",
    "make_vision_forward",
    "preprocess_image",
    "MtmdPipeline",
]
