"""Ready-made voice/instrument models for VoiceBank batching."""

from .voices import (
    AdditiveVoice,
    FMCascade,
    FMVoice,
    SamplerVoice,
    SineVoice,
    SubtractiveVoice,
)

__all__ = ["FMCascade", "FMVoice", "SineVoice", "SubtractiveVoice"]
