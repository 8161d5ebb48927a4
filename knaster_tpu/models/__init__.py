"""Ready-made voice/instrument models for VoiceBank batching."""

from .voices import FMCascade, FMVoice, SineVoice, SubtractiveVoice

__all__ = ["FMCascade", "FMVoice", "SineVoice", "SubtractiveVoice"]
