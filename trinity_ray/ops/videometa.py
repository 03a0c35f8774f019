"""REAL MP4/ISO-BMFF container metadata (pure struct, no codec libs).

Like PCM WAV (ops/audiocodec.py), the MP4 *container* is plainly
parseable without any codec: boxes are (u32 size, 4cc type) headers, and
the movie header (``moov``/``mvhd``) carries timescale + duration while
each ``trak`` box marks one track.  FRAME decode stays honestly stubbed
in ops/multimodal.py — H.264/AV1 need codec libraries this container
doesn't ship — but duration/track/brand metadata extraction is a real,
tested path, which is what a curation pipeline filters on (clip length,
track count) before any expensive decode.

``synthesize_mp4`` builds a minimal-but-valid box tree for tests and the
driver entry, so the oracle can replay synthesize -> parse in closed
form (integer-exact).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from trinity_ray.rayutil import actor_pool, package_runtime_env


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def synthesize_mp4(*, duration: int, timescale: int = 1000,
                   n_tracks: int = 1, brand: bytes = b"isom",
                   version: int = 0) -> bytes:
    """Minimal valid ISO-BMFF stream: ftyp + moov(mvhd + n_tracks empty
    trak boxes).  ``version`` selects the mvhd layout (0: u32 times,
    1: u64 — the large-file variant parsers must handle)."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    if version == 0:
        mvhd_body = struct.pack(">B3xIIII", 0, 0, 0, timescale, duration)
    else:
        mvhd_body = struct.pack(">B3xQQIQ", 1, 0, 0, timescale, duration)
    mvhd = _box(b"mvhd", mvhd_body + b"\x00" * 80)   # rate..next_track_id
    traks = b"".join(_box(b"trak", b"") for _ in range(n_tracks))
    return ftyp + _box(b"moov", mvhd + traks)


def iter_boxes(payload: bytes, start: int = 0, end: int | None = None):
    """Yield (type, body_start, body_end) for each box in [start, end).
    Size 0 (to end-of-file) and size 1 (64-bit largesize) are handled;
    malformed sizes raise ValueError instead of looping forever."""
    p = payload
    end = len(p) if end is None else end
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", p[pos:pos + 4])
        btype = p[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:                        # 64-bit largesize
            if body + 8 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack(">Q", p[body:body + 8])
            body += 8
            if size < 16:
                raise ValueError(f"invalid largesize {size}")
        elif size == 0:                      # to end of enclosing scope
            size = end - pos
        elif size < 8:
            raise ValueError(f"invalid box size {size}")
        box_end = pos + size
        if box_end > end:
            raise ValueError("box extends past payload end")
        yield btype, body, box_end
        pos = box_end


def mp4_meta(payload: bytes) -> dict:
    """(brand, timescale, duration, duration_ms, n_tracks) from the ftyp
    and moov/mvhd/trak boxes; raises ValueError when no moov exists."""
    brand = ""
    timescale = duration = None
    n_tracks = 0
    for btype, body, box_end in iter_boxes(payload):
        if btype == b"ftyp":
            brand = payload[body:body + 4].decode("ascii", "replace")
        elif btype == b"moov":
            for ityp, ib, ie in iter_boxes(payload, body, box_end):
                if ityp == b"mvhd":
                    ver = payload[ib]
                    if ver == 1:
                        timescale, duration = struct.unpack(
                            ">IQ", payload[ib + 20:ib + 32])
                    else:
                        timescale, duration = struct.unpack(
                            ">II", payload[ib + 12:ib + 20])
                elif ityp == b"trak":
                    n_tracks += 1
    if timescale is None:
        raise ValueError("no moov/mvhd box found (not an MP4 movie?)")
    return {"brand": brand, "timescale": int(timescale),
            "duration": int(duration),
            "duration_ms": int(duration) * 1000 // int(timescale),
            "n_tracks": n_tracks}


class VideoMeta:
    """Actor stage: binary MP4 column -> typed container metadata
    columns.  Parse only — the decode filter step a curation pipeline
    runs BEFORE paying for any (stubbed) frame decode."""

    def __init__(self, binary_column: str = "payload"):
        self.col = binary_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [mp4_meta(p) for p in batch.column(self.col).to_pylist()]
        drop = batch.drop_columns([self.col])
        return (drop
                .append_column("brand", pa.array(
                    [m["brand"] for m in metas], pa.string()))
                .append_column("duration_ms", pa.array(
                    [m["duration_ms"] for m in metas], pa.int64()))
                .append_column("n_tracks", pa.array(
                    [m["n_tracks"] for m in metas], pa.int64())))


def extract_video_meta(ds, *, binary_column: str = "payload",
                       concurrency: int = 2, batch_size: int = 256):
    return ds.map_batches(
        VideoMeta,
        fn_constructor_kwargs=dict(binary_column=binary_column),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=actor_pool(concurrency),
        runtime_env=package_runtime_env(),
    )
