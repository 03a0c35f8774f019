"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Decode kernels: PNG/BMP image decode is REAL (ops/imagecodec.py, pure
numpy+zlib) and PCM WAV audio decode is REAL (ops/audiocodec.py, pure
numpy); JPEG/GIF/MP3/video remain honestly STUBBED — they need codec
libraries this container doesn't ship — raising ``NotImplementedError``,
with a clearly-marked deterministic fake decoder available so the
Ray-side plumbing — schema, batch sizing, actor-pool signature, output
layout — is real and tested end to end for every media type.

Stage shapes (all actor-pool ``map_batches``, setup once in ``__init__``):

    sniff:   binary -> (media_type, n_bytes, payload_sha256)
    decode:  binary -> fixed-shape float features (fake: hash-derived)
    resize:  feature tensor -> target (h, w) via block mean (real numpy)
    frames:  binary audio/video -> every-nth "frame" features

Large payloads mean SMALL batches: ``recommended_batch_size`` converts a
per-row byte estimate into a batch size that keeps
``batch_size × concurrency × row_bytes`` within a worker heap budget.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from trinity_ray.rayutil import actor_pool, package_runtime_env

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"BM", "image/bmp"),
    (b"RIFF", "audio/wav"),       # RIFF....WAVE, close enough for sniffing
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4"),  # ftyp boxes start with size prefix
]


def sniff_media_type(payload: bytes) -> str:
    for magic, mt in _MAGIC:
        if payload.startswith(magic):
            return mt
    return "application/octet-stream"


def recommended_batch_size(row_bytes: int, concurrency: int,
                           heap_budget_bytes: int = 2 << 30) -> int:
    """batch_size so that batch × concurrency fits the worker heap budget
    (with a 4x decode-expansion safety factor)."""
    per_row = max(1, row_bytes) * 4
    return max(1, heap_budget_bytes // (per_row * max(1, concurrency)))


def decode_image(payload: bytes) -> np.ndarray:
    """REAL image decode for PNG and BMP (pure numpy/zlib — see
    ops/imagecodec.py); JPEG/GIF/video remain honestly stubbed: they need
    codec libraries this container doesn't ship."""
    from trinity_ray.ops.imagecodec import decode_bmp, decode_png

    p = payload or b""
    if p.startswith(b"\x89PNG\r\n\x1a\n"):
        return decode_png(p)
    if p.startswith(b"BM"):
        return decode_bmp(p)
    mt = sniff_media_type(p)
    raise NotImplementedError(
        f"no decoder for {mt} (PNG/BMP decode is real; JPEG/GIF/video "
        "need codec libs not present in this container)")


def _fake_pixels(payload: bytes, h: int, w: int, c: int = 3) -> np.ndarray:
    """Deterministic fake 'decode': pixels derived from the payload hash.
    Stable across processes/parallelism — good enough to test plumbing,
    shapes, and downstream math."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(),
                          "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


class BinaryMeta:
    """sniff stage: typed metadata for an opaque binary column."""

    def __init__(self, binary_column: str = "payload"):
        self.col = binary_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.col).to_pylist()
        mts, sizes, shas = [], [], []
        for p in payloads:
            p = p or b""
            mts.append(sniff_media_type(p))
            sizes.append(len(p))
            shas.append(hashlib.sha256(p).hexdigest())
        return (batch
                .append_column("media_type", pa.array(mts, pa.string()))
                .append_column("n_bytes", pa.array(sizes, pa.int64()))
                .append_column("payload_sha256", pa.array(shas, pa.string())))


class FakeDecode:
    """decode stage (STUB backend): binary -> (h, w, c) uint8 tensor flattened
    into a fixed-size list column + shape columns.  Swap ``_fake_pixels`` for
    a real decoder when the codec libs exist; the Ray plumbing is identical."""

    def __init__(self, binary_column: str = "payload", height: int = 32,
                 width: int = 32, channels: int = 3):
        self.col = binary_column
        self.h, self.w, self.c = height, width, channels

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.col).to_pylist()
        n = len(payloads)
        size = self.h * self.w * self.c
        out = np.empty((n, size), dtype=np.uint8)
        for i, p in enumerate(payloads):
            out[i] = _fake_pixels(p or b"", self.h, self.w, self.c).ravel()
        drop = batch.drop_columns([self.col])
        return (drop
                .append_column("pixels", pa.array(out.tolist(),
                                                  pa.list_(pa.uint8(), size)))
                .append_column("height", pa.array([self.h] * n, pa.int32()))
                .append_column("width", pa.array([self.w] * n, pa.int32()))
                .append_column("channels", pa.array([self.c] * n, pa.int32())))


class RealDecode:
    """decode stage (REAL backend for PNG/BMP): binary -> fixed (h, w, c)
    uint8 tensor.  Decoded images are resampled to the target shape with
    exact nearest-neighbor indexing (deterministic); gray is replicated to
    3 channels, alpha dropped.  Same output schema as FakeDecode, so the
    downstream stages are backend-agnostic."""

    def __init__(self, binary_column: str = "payload", height: int = 32,
                 width: int = 32, channels: int = 3):
        self.col = binary_column
        self.h, self.w, self.c = height, width, channels

    def _fit(self, img: np.ndarray) -> np.ndarray:
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        img = img[:, :, : self.c]
        ys = (np.arange(self.h) * img.shape[0]) // self.h
        xs = (np.arange(self.w) * img.shape[1]) // self.w
        return img[ys][:, xs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.col).to_pylist()
        n = len(payloads)
        size = self.h * self.w * self.c
        out = np.empty((n, size), dtype=np.uint8)
        for i, p in enumerate(payloads):
            out[i] = self._fit(decode_image(p)).ravel()
        drop = batch.drop_columns([self.col])
        return (drop
                .append_column("pixels", pa.array(out.tolist(),
                                                  pa.list_(pa.uint8(), size)))
                .append_column("height", pa.array([self.h] * n, pa.int32()))
                .append_column("width", pa.array([self.w] * n, pa.int32()))
                .append_column("channels", pa.array([self.c] * n, pa.int32())))


class Resize:
    """resize stage (real numpy): block-mean downscale of decoded tensors.
    Requires source (h, w) divisible by target — callers pick pow2 sizes."""

    def __init__(self, target_h: int, target_w: int):
        self.th, self.tw = target_h, target_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch.column("height")[0].as_py()
        w = batch.column("width")[0].as_py()
        c = batch.column("channels")[0].as_py()
        px = np.asarray(batch.column("pixels").to_pylist(), dtype=np.uint8)
        n = len(px)
        img = px.reshape(n, h, w, c).astype(np.float32)
        fh, fw = h // self.th, w // self.tw
        img = img[:, : fh * self.th, : fw * self.tw, :]
        img = img.reshape(n, self.th, fh, self.tw, fw, c).mean(axis=(2, 4))
        size = self.th * self.tw * c
        flat = img.reshape(n, size)
        t = batch.drop_columns(["pixels", "height", "width"])
        return (t
                .append_column("pixels", pa.array(flat.tolist(),
                                                  pa.list_(pa.float32(), size)))
                .append_column("height", pa.array([self.th] * n, pa.int32()))
                .append_column("width", pa.array([self.tw] * n, pa.int32())))


class FrameSample:
    """frame-sample stage (STUB backend): every-nth 'frame' of a binary
    stream as a hash-derived feature vector; real video decode would slot in
    here with the same (actor, batch, output-list) shape."""

    def __init__(self, binary_column: str = "payload", every_n: int = 10,
                 max_frames: int = 8, feat_dim: int = 16):
        self.col = binary_column
        self.every_n = every_n
        self.max_frames = max_frames
        self.feat_dim = feat_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.col).to_pylist()
        frames_col, counts = [], []
        for p in payloads:
            p = p or b""
            n_virtual = max(1, len(p) // 64)
            idxs = list(range(0, n_virtual, self.every_n))[: self.max_frames]
            feats = np.empty((len(idxs), self.feat_dim), dtype=np.float32)
            for j, fi in enumerate(idxs):
                seed = int.from_bytes(
                    hashlib.blake2b(p + fi.to_bytes(4, "little"),
                                    digest_size=8).digest(), "little")
                feats[j] = np.random.default_rng(seed).standard_normal(
                    self.feat_dim).astype(np.float32)
            frames_col.append(feats.ravel().tolist())
            counts.append(len(idxs))
        return (batch.drop_columns([self.col])
                .append_column("frame_feats",
                               pa.array(frames_col, pa.list_(pa.float32())))
                .append_column("n_frames", pa.array(counts, pa.int32())))


def attach_binary_meta(ds, binary_column: str = "payload",
                       batch_size: int = 256, concurrency: int = 2):
    return ds.map_batches(
        BinaryMeta, fn_constructor_kwargs=dict(binary_column=binary_column),
        batch_format="pyarrow", batch_size=batch_size, concurrency=actor_pool(concurrency),
        runtime_env=package_runtime_env())


def decode_images(ds, binary_column: str = "payload", height: int = 32,
                  width: int = 32, channels: int = 3, batch_size: int = 128,
                  concurrency: int = 2, backend: str = "fake"):
    """backend="real" decodes PNG/BMP with the pure-numpy codecs (raises on
    formats needing external libs); backend="fake" keeps the deterministic
    hash-pixel stub for plumbing tests over arbitrary bytes."""
    cls = RealDecode if backend == "real" else FakeDecode
    return ds.map_batches(
        cls, fn_constructor_kwargs=dict(
            binary_column=binary_column, height=height, width=width,
            channels=channels),
        batch_format="pyarrow", batch_size=batch_size, concurrency=actor_pool(concurrency),
        runtime_env=package_runtime_env())


def resize_images(ds, target_h: int, target_w: int, batch_size: int = 128,
                  concurrency: int = 2):
    return ds.map_batches(
        Resize, fn_constructor_kwargs=dict(target_h=target_h, target_w=target_w),
        batch_format="pyarrow", batch_size=batch_size, concurrency=actor_pool(concurrency),
        runtime_env=package_runtime_env())


class RealFrameSample:
    """frame-sample stage (REAL backend): the payload is a motion-PNG
    stream (concatenated PNGs); every-nth frame is split out and DECODED
    with the pure-numpy codec, emitting per-frame mean-RGB features.  Same
    output schema as the stub, so downstream stages are backend-agnostic.
    Real video containers (mp4 etc.) still need codec libs this container
    doesn't ship."""

    def __init__(self, binary_column: str = "payload", every_n: int = 10,
                 max_frames: int = 8):
        self.col = binary_column
        self.every_n = every_n
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        from trinity_ray.ops.imagecodec import decode_png, split_png_stream

        payloads = batch.column(self.col).to_pylist()
        frames_col, counts = [], []
        for p in payloads:
            frames = split_png_stream(p or b"") if p else []
            idxs = list(range(0, len(frames), self.every_n))[: self.max_frames]
            feats = np.empty((len(idxs), 3), dtype=np.float32)
            for j, fi in enumerate(idxs):
                px = decode_png(frames[fi])
                feats[j] = px.reshape(-1, px.shape[2]).mean(axis=0)[:3]
            frames_col.append(feats.ravel().tolist())
            counts.append(len(idxs))
        return (batch.drop_columns([self.col])
                .append_column("frame_feats",
                               pa.array(frames_col, pa.list_(pa.float32())))
                .append_column("n_frames", pa.array(counts, pa.int32())))


def sample_frames(ds, binary_column: str = "payload", every_n: int = 10,
                  max_frames: int = 8, batch_size: int = 128,
                  concurrency: int = 2, backend: str = "fake"):
    """backend="real" splits+decodes motion-PNG payloads with the
    pure-numpy codec; backend="fake" keeps the hash-derived stub for
    arbitrary bytes."""
    cls = RealFrameSample if backend == "real" else FrameSample
    return ds.map_batches(
        cls, fn_constructor_kwargs=dict(
            binary_column=binary_column, every_n=every_n, max_frames=max_frames),
        batch_format="pyarrow", batch_size=batch_size, concurrency=actor_pool(concurrency),
        runtime_env=package_runtime_env())
