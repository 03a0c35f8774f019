"""REAL PCM WAV codec + audio feature stage (pure numpy, no codec libs).

RIFF/WAVE PCM is a trivial container — unlike JPEG/MP3 (which stay
honestly stubbed in ops/multimodal.py), mono/stereo 16-bit PCM decodes
with a header parse and one ``np.frombuffer``.  This gives the
multimodal layer one fully REAL audio path: synthesize/ingest WAV bytes
as an opaque binary column, decode in an actor-pool ``map_batches``
stage, and extract vectorized frame features.

Feature contract (AudioFeatures): integer-exact ``sum_sq`` (sum of
squared samples) and ``zcr`` (strict sign-change count) so a SQL oracle
can replay the whole synthesize -> encode -> decode -> feature path with
zero float tolerance; float summaries (rms) derive downstream.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from trinity_ray.rayutil import actor_pool, package_runtime_env


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Minimal RIFF/WAVE writer: ``samples`` int16, shape (n,) mono or
    (n, ch); little-endian PCM16."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError("samples must be int16")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.astype("<i2").tobytes()
    byte_rate = rate * ch * 2
    block_align = ch * 2
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 36 + len(data)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, ch, rate, byte_rate,
                             block_align, 16),
        b"data", struct.pack("<I", len(data)),
    ])
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 decode: returns (samples int16 (n, ch), rate).
    Walks the chunk list (fmt may be followed by LIST/fact chunks);
    non-PCM or non-16-bit formats raise ``NotImplementedError`` — those
    genuinely need codec libraries this container doesn't ship."""
    p = payload or b""
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(p):
        cid = p[pos:pos + 4]
        (size,) = struct.unpack("<I", p[pos + 4:pos + 8])
        body = p[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)          # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _br, _ba, bits = fmt
    if ch == 0:
        raise ValueError("fmt chunk declares zero channels")
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 decodes here (format={audio_format}, bits={bits});"
            " compressed audio needs codec libs not in this container")
    s = np.frombuffer(data, dtype="<i2")
    n = len(s) // ch
    return s[: n * ch].reshape(n, ch).astype(np.int16), rate


def wav_meta(payload: bytes) -> dict:
    s, rate = decode_wav(payload)
    return {"rate": rate, "channels": int(s.shape[1]),
            "n_samples": int(s.shape[0]),
            "duration_s": s.shape[0] / rate}


def audio_features_int(samples: np.ndarray) -> tuple[int, int]:
    """(sum_sq, zcr) over the first channel: integer-exact sum of squared
    samples and strict sign-change count (s[i-1] * s[i] < 0)."""
    v = samples[:, 0].astype(np.int64)
    ssq = int((v * v).sum())
    zcr = int(((v[:-1] * v[1:]) < 0).sum()) if v.size > 1 else 0
    return ssq, zcr


class AudioFeatures:
    """Actor stage: binary WAV column -> (n_samples, rate, sum_sq, zcr).
    Decode + features per payload; numpy throughout, no Python per
    sample.  Large payloads want small batches — see
    multimodal.recommended_batch_size."""

    def __init__(self, binary_column: str = "payload"):
        self.col = binary_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.col).to_pylist()
        ns, rates, ssqs, zcrs = [], [], [], []
        for p in payloads:
            s, rate = decode_wav(p)
            ssq, zcr = audio_features_int(s)
            ns.append(s.shape[0])
            rates.append(rate)
            ssqs.append(ssq)
            zcrs.append(zcr)
        drop = batch.drop_columns([self.col])
        return (drop
                .append_column("n_samples", pa.array(ns, pa.int64()))
                .append_column("rate", pa.array(rates, pa.int64()))
                .append_column("sum_sq", pa.array(ssqs, pa.int64()))
                .append_column("zcr", pa.array(zcrs, pa.int64())))


def extract_audio_features(ds, *, binary_column: str = "payload",
                           concurrency: int = 2, batch_size: int = 256):
    """WAV feature extraction as an actor-pool map_batches stage."""
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs=dict(binary_column=binary_column),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=actor_pool(concurrency),
        runtime_env=package_runtime_env(),
    )
