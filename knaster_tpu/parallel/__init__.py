"""Voice-level and multi-chip parallelism (SURVEY §2.9/§5.8 TPU mapping)."""

from .voicebank import VoiceBank
from .generic_bank import MosaicVoiceSpec, PallasVoiceBank
from .mesh import ShardedVoiceBank
from .pallas_bank import (
    PallasFMVoiceBank,
    PallasSineVoiceBank,
    PallasSubtractiveVoiceBank,
    PallasWavetableVoiceBank,
)

__all__ = ["MosaicVoiceSpec", "PallasVoiceBank", "PallasFMVoiceBank", "PallasSineVoiceBank", "PallasSubtractiveVoiceBank", "PallasWavetableVoiceBank", "ShardedVoiceBank", "VoiceBank"]
