"""Real PCM WAV codec: roundtrip, chunk walking, features."""

from __future__ import annotations

import os
import struct
import sys

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trinity_ray.ops.audiocodec import (  # noqa: E402
    audio_features_int,
    decode_wav,
    encode_wav_pcm16,
    extract_audio_features,
    wav_meta,
)


def test_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(1)
    mono = rng.integers(-32768, 32768, size=500).astype(np.int16)
    s, rate = decode_wav(encode_wav_pcm16(mono, 16000))
    assert rate == 16000 and s.shape == (500, 1)
    np.testing.assert_array_equal(s[:, 0], mono)
    stereo = rng.integers(-32768, 32768, size=(300, 2)).astype(np.int16)
    s2, rate2 = decode_wav(encode_wav_pcm16(stereo, 44100))
    assert rate2 == 44100 and s2.shape == (300, 2)
    np.testing.assert_array_equal(s2, stereo)
    meta = wav_meta(encode_wav_pcm16(stereo, 44100))
    assert meta == {"rate": 44100, "channels": 2, "n_samples": 300,
                    "duration_s": 300 / 44100}


def test_decode_walks_extra_chunks_and_refuses_non_pcm():
    mono = np.arange(-5, 5, dtype=np.int16)
    raw = encode_wav_pcm16(mono, 8000)
    # splice a LIST chunk (odd size -> exercises 2-byte alignment) between
    # fmt and data; decoders that assume data follows fmt directly break
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = raw[:fmt_end] + extra + raw[fmt_end:]
    s, rate = decode_wav(spliced)
    np.testing.assert_array_equal(s[:, 0], mono)
    # non-PCM format code refuses honestly
    bad = bytearray(raw)
    bad[20:22] = struct.pack("<H", 3)       # IEEE float format
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")


def test_sine_features_analytic():
    # full periods of a sine: RMS ~= amp/sqrt(2), ZCR = 2 crossings/period.
    # f must not divide the sample grid (f=200 at 8 kHz samples every zero
    # crossing EXACTLY, and the strict sign-change count skips zeros)
    rate, f, n = 8000, 199, 8000
    t = np.arange(n)
    v = np.round(16000 * np.sin(2 * np.pi * f * t / rate)).astype(np.int16)
    ssq, zcr = audio_features_int(v[:, None].astype(np.int16))
    rms = (ssq / n) ** 0.5
    assert abs(rms - 16000 / np.sqrt(2)) < 20
    assert abs(zcr - 2 * f) <= 4


def test_extract_audio_features_stage(ray_session):
    waves = [encode_wav_pcm16(
        np.full(100 * (i + 1), (-1) ** i * 1000, np.int16), 8000)
        for i in range(4)]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "payload": pa.array(waves, pa.binary())})
    out = extract_audio_features(rd.from_arrow(t)).to_pandas(
        ).sort_values("doc_id").reset_index(drop=True)
    assert out["n_samples"].tolist() == [100, 200, 300, 400]
    assert out["rate"].tolist() == [8000] * 4
    assert out["sum_sq"].tolist() == [1000 * 1000 * 100 * (i + 1)
                                      for i in range(4)]
    assert out["zcr"].tolist() == [0, 0, 0, 0]   # constant sign per wave


def test_decode_malformed_raises_valueerror():
    raw = encode_wav_pcm16(np.zeros(4, np.int16), 8000)
    # truncated fmt chunk body
    truncated = raw[:12] + b"fmt " + struct.pack("<I", 16) + raw[20:28]
    with pytest.raises(ValueError):
        decode_wav(truncated)
    # zero channels
    bad = bytearray(raw)
    bad[22:24] = struct.pack("<H", 0)
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(n=st.integers(0, 400), ch=st.integers(1, 4),
       rate=st.sampled_from([8000, 16000, 22050, 44100]),
       seed=st.integers(0, 2**31 - 1))
def test_wav_roundtrip_property(n, ch, rate, seed):
    s = np.random.default_rng(seed).integers(
        -32768, 32768, size=(n, ch)).astype(np.int16)
    dec, r = decode_wav(encode_wav_pcm16(s, rate))
    assert r == rate and dec.shape == (n, ch)
    np.testing.assert_array_equal(dec, s)
