"""Ready-made voice/instrument models for VoiceBank batching."""

from .voices import (
    AdditiveVoice,
    FMCascade,
    FMVoice,
    ModalVoice,
    PluckedVoice,
    SamplerVoice,
    SineVoice,
    SubtractiveVoice,
)

__all__ = [
    "AdditiveVoice",
    "FMCascade",
    "FMVoice",
    "ModalVoice",
    "PluckedVoice",
    "SamplerVoice",
    "SineVoice",
    "SubtractiveVoice",
]
