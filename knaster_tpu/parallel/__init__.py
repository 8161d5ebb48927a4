"""Voice-level and multi-chip parallelism (SURVEY §2.9/§5.8 TPU mapping)."""

from .voicebank import VoiceBank
from .mesh import ShardedVoiceBank
from .pallas_bank import (
    PallasFMVoiceBank,
    PallasSineVoiceBank,
    PallasSubtractiveVoiceBank,
    PallasWavetableVoiceBank,
)

__all__ = ["PallasFMVoiceBank", "PallasSineVoiceBank", "PallasSubtractiveVoiceBank", "PallasWavetableVoiceBank", "ShardedVoiceBank", "VoiceBank"]
