"""Compressed sound-file IO (Buffer::from_sound_file parity,
dsp/buffer.rs:154): mp3 via libmpg123, ogg via libvorbisfile, with
encoders (libmp3lame / libvorbisenc) providing round-trip coverage, and
FLAC via the project's native codec (native/knaster_flac.cpp)."""

import os

import numpy as np
import pytest

from knaster_tpu.ugens.buffer import Buffer
from knaster_tpu.utils import codec

SR = 44100


def _sig(frames=SR * 2):
    t = np.arange(frames) / SR
    return np.stack(
        [0.5 * np.sin(2 * np.pi * 440 * t),
         0.3 * np.sin(2 * np.pi * 660 * t)]
    ).astype(np.float32)


def _freq(x):
    return np.sum((x[:-1] < 0) & (x[1:] >= 0))


def _have(loader):
    try:
        loader()
        return True
    except RuntimeError:
        return False


@pytest.mark.skipif(not _have(codec._get_lame) or not _have(codec._get_mpg123),
                    reason="mp3 libraries unavailable")
def test_mp3_roundtrip(tmp_path):
    path = str(tmp_path / "t.mp3")
    sig = _sig()
    codec.write_mp3(path, sig, SR)
    data, rate = codec.read_sound_file(path)
    assert rate == SR and data.shape[0] == 2
    mid = data[0][SR // 2 : SR // 2 + SR]  # skip encoder delay/padding
    assert abs(_freq(mid) - 440) <= 3
    assert abs(float(np.sqrt((mid ** 2).mean())) - 0.5 / np.sqrt(2)) < 0.02
    # the Buffer facade dispatches by magic bytes
    buf = Buffer.from_sound_file(path)
    assert buf.sample_rate == SR and buf.channels == 2


@pytest.mark.skipif(not _have(codec._get_vorbisfile),
                    reason="vorbis libraries unavailable")
def test_ogg_roundtrip(tmp_path):
    path = str(tmp_path / "t.ogg")
    sig = _sig()
    codec.write_ogg(path, sig, SR)
    data, rate = codec.read_sound_file(path)
    assert rate == SR and data.shape[0] == 2
    n = min(data.shape[1], sig.shape[1])
    assert abs(n - sig.shape[1]) < 128  # sample-count preserved (no delay)
    err = np.abs(data[:, 1000 : n - 1000] - sig[:, 1000 : n - 1000]).max()
    assert err < 0.05  # lossy but time-aligned
    assert abs(_freq(data[0][SR // 2 : SR // 2 + SR]) - 440) <= 3


def test_flac_roundtrip_lossless(tmp_path):
    """write_flac -> read_flac is bit-exact at the quantized depth for
    16- and 24-bit, stereo and mono, including a short trailing frame."""
    rng = np.random.default_rng(7)
    t = np.arange(int(SR * 1.3) + 61) / SR  # odd length: short last frame
    sig = np.stack(
        [0.5 * np.sin(2 * np.pi * 440 * t) + 0.01 * rng.standard_normal(len(t)),
         0.5 * np.sin(2 * np.pi * 440 * t + 0.2)
         + 0.1 * np.sin(2 * np.pi * 880 * t)]
    ).astype(np.float32)
    for bits, data in ((16, sig), (24, sig), (16, sig[:1])):
        path = str(tmp_path / f"t{bits}_{data.shape[0]}.flac")
        codec.write_flac(path, data, SR, bits=bits)
        dec, rate = codec.read_sound_file(path)
        assert rate == SR and dec.shape == data.shape
        scale = 2.0 ** (bits - 1)
        q = (np.clip(np.rint(data * scale), -scale, scale - 1)
             / scale).astype(np.float32)
        assert np.array_equal(dec, q)


def test_flac_compresses_and_covers_subframe_types(tmp_path):
    """Tonal + constant + silent content: the encoder's LPC/fixed/constant
    subframe choices must all decode losslessly, and tonal content must
    actually compress (LPC prediction working, not verbatim fallback)."""
    t = np.arange(SR) / SR
    tonal = (0.4 * np.sin(2 * np.pi * 220 * t)
             + 0.2 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    sig = np.concatenate(
        [np.zeros(4096, np.float32), np.full(4096, 0.125, np.float32), tonal]
    )[None]
    path = str(tmp_path / "t.flac")
    codec.write_flac(path, sig, SR, bits=16)
    raw_bytes = sig.shape[1] * 2
    assert os.path.getsize(path) < 0.5 * raw_bytes  # real compression
    dec, rate = codec.read_sound_file(path)
    q = (np.clip(np.rint(sig * 32768.0), -32768, 32767) / 32768.0)
    assert np.array_equal(dec, q.astype(np.float32))


def test_flac_bad_stream_raises(tmp_path):
    path = str(tmp_path / "t.flac")
    with open(path, "wb") as f:
        f.write(b"fLaC" + b"\x00" * 64)
    with pytest.raises(RuntimeError, match="FLAC|decode"):
        codec.read_sound_file(path)


def test_buffer_reader_plays_flac(tmp_path):
    """End to end: decode a FLAC into a Buffer and play it through
    BufferReader in a graph."""
    from knaster_tpu import (AudioProcessor, AudioProcessorOptions,
                             BufferReader)

    path = str(tmp_path / "t.flac")
    codec.write_flac(path, _sig(), SR, bits=16)
    buf = Buffer.from_sound_file(path)
    assert buf.sample_rate == SR and buf.channels == 2
    g, proc = AudioProcessor.new(
        0, 2, AudioProcessorOptions(block_size=64, sample_rate=SR)
    )
    g.edit(lambda gg: gg.push(BufferReader(buf)).to_graph_out())
    audio = proc.render(frames=SR // 2)
    assert np.abs(audio).max() > 0.2  # lossless: no encoder delay


def test_wav_dispatch(tmp_path):
    from knaster_tpu.utils.wav import write_wav

    path = str(tmp_path / "t.wav")
    sig = _sig(SR // 4)
    write_wav(path, sig, SR)
    data, rate = codec.read_sound_file(path)
    assert rate == SR
    np.testing.assert_allclose(data, sig, atol=1e-6)


@pytest.mark.skipif(not _have(codec._get_mpg123),
                    reason="mp3 libraries unavailable")
def test_buffer_reader_plays_mp3(tmp_path):
    """End to end: decode an mp3 into a Buffer and play it through
    BufferReader in a graph (buffer_player.rs analog)."""
    from knaster_tpu import (AudioProcessor, AudioProcessorOptions,
                             BufferReader)

    path = str(tmp_path / "t.mp3")
    codec.write_mp3(path, _sig(), SR)
    buf = Buffer.from_sound_file(path)
    g, proc = AudioProcessor.new(
        0, 2, AudioProcessorOptions(block_size=64, sample_rate=SR)
    )
    g.edit(lambda gg: gg.push(BufferReader(buf)).to_graph_out())
    audio = proc.render(frames=SR // 2)
    # encoder delay means the first ~1k samples are padding; sound follows
    assert np.abs(audio[:, 3000:]).max() > 0.2
