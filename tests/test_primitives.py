"""Time & parameter primitive tests (parity: knaster_primitives/src/time.rs:455-504)."""

import pytest

from knaster_tpu import Beats, Seconds
from knaster_tpu.primitives.time import (
    SUBBEAT_TESIMALS_PER_BEAT,
    SUBSECOND_TESIMALS_PER_SECOND,
)


def test_seconds_sample_conversion_lossless_all_rates():
    # the tesimal count is divisible by all common sample rates, so
    # samples -> Seconds -> samples is exact at any of them
    for sr in (44100, 48000, 88200, 96000, 176400, 192000, 22050, 8000):
        assert SUBSECOND_TESIMALS_PER_SECOND % sr == 0
        for samples in (0, 1, 63, 64, 12345, 48000, 10**9 + 7):
            s = Seconds.from_samples(samples, sr)
            assert s.to_samples(sr) == samples


def test_seconds_cross_rate():
    s = Seconds.from_samples(48000, 48000)
    assert s == Seconds(1, 0)
    assert s.to_samples(44100) == 44100


def test_seconds_arithmetic():
    a = Seconds.from_secs_f64(1.5)
    b = Seconds.from_secs_f64(0.75)
    assert (a + b).to_secs_f64() == pytest.approx(2.25)
    assert (a - b).to_secs_f64() == pytest.approx(0.75)
    assert a.checked_sub(b) is not None
    assert b.checked_sub(a) is None
    assert b.saturating_sub(a) == Seconds.ZERO
    assert a > b
    with pytest.raises(ValueError):
        b - a


def test_seconds_normalization():
    s = Seconds(0, SUBSECOND_TESIMALS_PER_SECOND + 5)
    assert s.seconds == 1 and s.subsecond_tesimals == 5


def test_beats():
    third = Beats.from_fractional_beats(1, 3)
    assert (third + third + third) == Beats(1, 0)
    assert SUBBEAT_TESIMALS_PER_BEAT % 3 == 0
    assert Beats.from_beats_f64(2.5).to_beats_f64() == pytest.approx(2.5)
    b = Beats(1, 0)
    assert b.to_seconds(bpm=60.0) == Seconds(1, 0)
