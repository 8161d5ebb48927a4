"""Ready-made voice/instrument models for VoiceBank batching."""

from .voices import (
    AdditiveVoice,
    EnvelopeVoice,
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
    "EnvelopeVoice",
    "FMCascade",
    "FMVoice",
    "ModalVoice",
    "PluckedVoice",
    "SamplerVoice",
    "SineVoice",
    "SubtractiveVoice",
]
