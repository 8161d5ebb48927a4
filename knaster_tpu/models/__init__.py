"""Ready-made voice/instrument models for VoiceBank batching."""

from .voices import (
    AdditiveVoice,
    FMCascade,
    FMVoice,
    PluckedVoice,
    SamplerVoice,
    SineVoice,
    SubtractiveVoice,
)

__all__ = ["FMCascade", "FMVoice", "PluckedVoice", "SineVoice", "SubtractiveVoice"]
