"""MP4/ISO-BMFF container metadata: box walking, mvhd v0/v1, guards."""

from __future__ import annotations

import os
import struct
import sys

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trinity_ray.ops.videometa import (  # noqa: E402
    extract_video_meta,
    iter_boxes,
    mp4_meta,
    synthesize_mp4,
)


def test_mvhd_v0_and_v1_roundtrip():
    for ver in (0, 1):
        p = synthesize_mp4(duration=90_000, timescale=600, n_tracks=2,
                           brand=b"mp42", version=ver)
        m = mp4_meta(p)
        assert m["brand"] == "mp42"
        assert m["timescale"] == 600 and m["duration"] == 90_000
        assert m["duration_ms"] == 150_000
        assert m["n_tracks"] == 2


def test_box_walk_handles_size0_and_largesize():
    base = synthesize_mp4(duration=1000, timescale=1000, n_tracks=1)
    # append a free box with size 0 (extends to EOF): walk must terminate
    sized0 = base + struct.pack(">I", 0) + b"free" + b"xx"
    assert mp4_meta(sized0)["n_tracks"] == 1
    # a largesize (size == 1) box before moov
    body = b"padpadpad"
    large = (struct.pack(">I", 1) + b"skip"
             + struct.pack(">Q", 16 + len(body)) + body)
    assert mp4_meta(large + base)["duration_ms"] == 1000
    boxes = [t for t, _, _ in iter_boxes(large + base)]
    assert boxes == [b"skip", b"ftyp", b"moov"]


def test_malformed_boxes_raise():
    with pytest.raises(ValueError):
        list(iter_boxes(struct.pack(">I", 5) + b"badd"))      # size < 8
    with pytest.raises(ValueError):
        list(iter_boxes(struct.pack(">I", 64) + b"over"))     # past end
    with pytest.raises(ValueError):
        mp4_meta(b"\x00\x00\x00\x08free")                     # no moov


def test_extract_video_meta_stage(ray_session):
    payloads = [synthesize_mp4(duration=(i + 1) * 2000, timescale=1000,
                               n_tracks=(i % 3) + 1, version=i % 2)
                for i in range(6)]
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    out = extract_video_meta(rd.from_arrow(t)).to_pandas(
        ).sort_values("doc_id").reset_index(drop=True)
    assert out["duration_ms"].tolist() == [(i + 1) * 2000 for i in range(6)]
    assert out["n_tracks"].tolist() == [(i % 3) + 1 for i in range(6)]
    assert out["brand"].tolist() == ["isom"] * 6
