"""Ready-made voice/instrument models for VoiceBank batching."""

from .voices import FMVoice, SineVoice, SubtractiveVoice

__all__ = ["FMVoice", "SineVoice", "SubtractiveVoice"]
