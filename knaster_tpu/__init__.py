"""knaster_tpu — a TPU-native sound-synthesis framework.

A ground-up re-design of the capabilities of ErikNatanael/knaster (a Rust
realtime audio-graph framework) for TPU hardware with JAX/XLA/Pallas:

* a dynamically editable audio **Graph** whose commits compile the UGen DAG
  into one fused XLA program (instead of per-node dispatch on an audio thread)
* per-sample DSP state carried functionally through the block renderer
* sample-accurate, smoothable, audio-rate-modulatable parameters via a
  masked-ramp parameter engine (instead of block-splitting wrappers)
* non-realtime (bounce) rendering as the primary path; thousands of voices
  batched across VPU lanes and sharded over device meshes

Quick start (the reference README example)::

    import knaster_tpu as kt

    graph, proc = kt.AudioProcessor.new(inputs=0, outputs=2)
    def build(g):
        sine = g.push(kt.SinWt(440.0))
        amp = g.push(kt.Constant(0.2))
        sig = sine * amp
        sig.out([0, 0]).to_graph_out()
        return sine.param("freq"), amp.param("value")
    freq, amp = graph.edit(build)
    audio = proc.render(seconds=2.0)   # [2, 96000]
"""

from .primitives import (
    NYQUIST,
    Beats,
    FloatHint,
    IntegerHint,
    Nyquist,
    Param,
    ParameterKind,
    Seconds,
    Smoothing,
    default_dtype,
    enable_f64,
    pbool,
    pfloat,
    pinteger,
    ptrigger,
)
from .core.decorator import TRIG, ugen
from .core.log import ArLogReceiver, ArLogSender, rt_log
from .core.ugen import AudioCtx, UGen, sample_scan
from .graph.graph import Done, Graph, GraphError, CircularConnection, NodeFreed
from .graph.handles import Handle, Parameter, Source
from .graph.processor import AudioProcessor, AudioProcessorOptions
from .graph.scheduling import SchedulingToken, Time
from .ugens.buffer import Buffer, BufferReader
from .ugens.closure import ClosureUGen, ugen_from_sample_fn
from .ugens.convolver import Convolver
from .ugens.modal import ModalResonator
from .ugens.physical import PluckedString
from .ugens.delay import (
    AllpassDelay,
    AllpassFeedbackDelay,
    SampleDelay,
    StaticSampleDelay,
)
from .ugens.dynamics import SafetyLimiter
from .ugens.envelopes import EnvAr, EnvAsr, Envelope, EnvelopeSegment, EnvelopeShape
from .ugens.filters import OnePoleHpf, OnePoleLpf, SvfFilter, SvfFilterType
from .ugens.math import Math1UGen, MathUGen
from .ugens.noise import (
    BrownNoise,
    PinkNoise,
    RandomLin,
    WhiteNoise,
    next_randomness_seed,
)
from .ugens.osc import OscWt, Phasor, SinNumeric, SinWt
from .ugens.pan import Pan2
from .ugens.polyblep import PolyBlep, Waveform
from .ugens.util import Constant, DoneOnTrig, LogProbe
from .ugens.wavetable import NonAaWavetable, Wavetable, harmonics_from_table
from .parallel.pool import VoicePool
from .parallel.voicebank import VoiceBank
from .airwindows.galactic import Galactic
from .backends import AudioBackend, OfflineBackend, StreamBackend
from .parallel.mesh import MeshVoiceBank, ShardedVoiceBank
from .parallel.generic_bank import MosaicVoiceSpec, PallasVoiceBank
from .parallel.pallas_bank import (
    PallasFMVoiceBank,
    PallasSineVoiceBank,
    PallasSubtractiveVoiceBank,
    PallasWavetableVoiceBank,
)
from .models.voices import AdditiveVoice, EnvelopeVoice, FMCascade, FMVoice, SamplerVoice, SineVoice, SubtractiveVoice
from .models import ModalVoice, PluckedVoice
from .ugens.granular import GrainPlayer
from .utils.codec import read_sound_file, write_flac, write_mp3, write_ogg

__version__ = "0.1.0"

__all__ = [
    "AllpassDelay",
    "FMCascade",
    "Galactic",
    "GrainPlayer",
    "Convolver",
    "AudioBackend",
    "OfflineBackend",
    "StreamBackend",
    "EnvelopeVoice",
    "FMVoice",
    "PallasFMVoiceBank",
    "PallasSineVoiceBank",
    "PallasVoiceBank",
    "MosaicVoiceSpec",
    "PallasSubtractiveVoiceBank",
    "PallasWavetableVoiceBank",
    "AdditiveVoice",
    "MeshVoiceBank",
    "ShardedVoiceBank",
    "SineVoice",
    "SubtractiveVoice",
    "SamplerVoice",
    "VoiceBank",
    "VoicePool",
    "AllpassFeedbackDelay",
    "AudioCtx",
    "Buffer",
    "BufferReader",
    "BrownNoise",
    "ClosureUGen",
    "EnvAr",
    "EnvAsr",
    "Envelope",
    "EnvelopeSegment",
    "EnvelopeShape",
    "OnePoleHpf",
    "OnePoleLpf",
    "Pan2",
    "PinkNoise",
    "PolyBlep",
    "RandomLin",
    "SafetyLimiter",
    "ModalResonator",
    "PluckedString",
    "SampleDelay",
    "StaticSampleDelay",
    "SvfFilter",
    "SvfFilterType",
    "Waveform",
    "WhiteNoise",
    "next_randomness_seed",
    "ugen_from_sample_fn",
    "AudioProcessor",
    "AudioProcessorOptions",
    "Beats",
    "CircularConnection",
    "Constant",
    "Done",
    "DoneOnTrig",
    "FloatHint",
    "Graph",
    "GraphError",
    "NodeFreed",
    "Handle",
    "IntegerHint",
    "LogProbe",
    "Math1UGen",
    "MathUGen",
    "NonAaWavetable",
    "harmonics_from_table",
    "OscWt",
    "Param",
    "Parameter",
    "ParameterKind",
    "Phasor",
    "Seconds",
    "SinNumeric",
    "SinWt",
    "Smoothing",
    "Source",
    "SchedulingToken",
    "Time",
    "UGen",
    "Wavetable",
    "ArLogReceiver",
    "ArLogSender",
    "rt_log",
    "TRIG",
    "default_dtype",
    "ugen",
    "enable_f64",
    "pbool",
    "pfloat",
    "pinteger",
    "ptrigger",
    "sample_scan",
]


def knaster(outputs: int = 2, sample_rate: int = 48000, block_size: int = 64):
    """One-liner entry point (reference knaster/src/lib.rs:79 ``knaster()``).

    Returns a ``(graph, processor)`` pair ready for offline rendering; attach
    a streaming backend from :mod:`knaster_tpu.backends` for live output.
    """
    opts = AudioProcessorOptions(block_size=block_size, sample_rate=sample_rate)
    return AudioProcessor.new(inputs=0, outputs=outputs, options=opts)
