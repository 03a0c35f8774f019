"""Pure-numpy PNG/BMP codecs + the real multimodal decode stage."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from trinity_ray.ops.imagecodec import (
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
)
from trinity_ray.ops.multimodal import decode_image, sniff_media_type


@given(st.integers(1, 24), st.integers(1, 24), st.sampled_from([1, 3, 4]),
       st.sampled_from(["none", "mixed"]), st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip(h, w, c, fm, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, c),
                                              dtype=np.uint8)
    got = decode_png(encode_png(px, filter_mode=fm))
    np.testing.assert_array_equal(got, px)


@given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_bmp_roundtrip(h, w, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                              dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(px)), px)


def test_decode_image_dispatch_and_sniff():
    px = np.random.default_rng(3).integers(0, 256, (6, 9, 3), dtype=np.uint8)
    png, bmp = encode_png(px), encode_bmp(px)
    assert sniff_media_type(png) == "image/png"
    assert sniff_media_type(bmp) == "image/bmp"
    np.testing.assert_array_equal(decode_image(png), px)
    np.testing.assert_array_equal(decode_image(bmp), px)
    with pytest.raises(NotImplementedError, match="jpeg"):
        decode_image(b"\xff\xd8\xff rest")


def test_real_decode_stage(ray_session):
    """RealDecode actor stage over a Dataset of PNG payloads: exact pixels
    back out (nearest-neighbor fit is identity at the native size)."""
    import pyarrow as pa
    import ray.data as rd

    from trinity_ray.ops.multimodal import decode_images

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            for _ in range(20)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "payload": pa.array([encode_png(im, "mixed") for im in imgs],
                            pa.binary()),
    }))
    out = decode_images(ds, height=16, width=16,
                        backend="real").to_pandas().sort_values("doc_id")
    for i, row in out.iterrows():
        got = np.asarray(row["pixels"], dtype=np.uint8).reshape(16, 16, 3)
        np.testing.assert_array_equal(got, imgs[int(row["doc_id"])])


def test_real_frame_sampling(ray_session):
    """Motion-PNG frame sampling: every-nth frame decoded for real, mean-RGB
    features verified against direct decode."""
    import pyarrow as pa
    import ray.data as rd

    from trinity_ray.ops.imagecodec import encode_png
    from trinity_ray.ops.multimodal import sample_frames

    rng = np.random.default_rng(9)
    streams, expect = [], []
    for i in range(8):
        frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                  for _ in range(2 + i)]
        streams.append(b"".join(encode_png(f) for f in frames))
        sel = frames[::2][:4]
        expect.append(np.stack([f.reshape(-1, 3).mean(axis=0) for f in sel]))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "payload": pa.array(streams, pa.binary()),
    }))
    out = sample_frames(ds, every_n=2, max_frames=4,
                        backend="real").to_pandas().sort_values("doc_id")
    for _, r in out.iterrows():
        e = expect[int(r["doc_id"])]
        assert int(r["n_frames"]) == e.shape[0]
        got = np.asarray(r["frame_feats"], dtype=np.float32).reshape(-1, 3)
        np.testing.assert_allclose(got, e, rtol=1e-5)
