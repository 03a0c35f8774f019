"""Codec property tests: round-trip, block access, seek-vs-scan equivalence
(SURVEY.md §5 item 2; reference invariants google_codec.cpp:27-30)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from trinity_ray.codec import (
    BLOCK,
    PostingsBlob,
    encode_postings,
    varint_decode,
    varint_encode,
)


def _random_postings(rng, n, with_positions=True, max_gap=1 << 20):
    gaps = rng.integers(1, max_gap, size=n, dtype=np.uint64)
    doc_ids = np.cumsum(gaps, dtype=np.uint64)
    freqs = rng.integers(1, 300, size=n, dtype=np.uint64)
    if not with_positions:
        return doc_ids, freqs, None
    positions = []
    for f in freqs:
        p = np.sort(rng.choice(np.arange(1, 1 << 14, dtype=np.uint64), size=int(f), replace=False))
        positions.append(p)
    return doc_ids, freqs, np.concatenate(positions)


@given(st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1), min_size=0, max_size=200))
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr), len(arr)), arr)


@pytest.mark.parametrize("n", [1, 2, BLOCK - 1, BLOCK, BLOCK + 1, 5 * BLOCK + 17, 3000])
@pytest.mark.parametrize("with_positions", [True, False])
def test_roundtrip(n, with_positions):
    rng = np.random.default_rng(n)
    doc_ids, freqs, positions = _random_postings(rng, n, with_positions)
    blob = PostingsBlob(encode_postings(doc_ids, freqs, positions))
    d, f = blob.decode_docs_freqs()
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(f, freqs)
    assert blob.doc_count == n
    if with_positions:
        pos, offs = blob.decode_positions(f)
        assert np.array_equal(pos, positions)
        assert np.array_equal(np.diff(offs), freqs.astype(np.int64))
    else:
        with pytest.raises(ValueError):
            blob.decode_positions()


def test_huge_docids():
    doc_ids = np.array([0, 1, 10**12, 2**63], dtype=np.uint64)
    freqs = np.array([1, 2, 3, 65600], dtype=np.uint64)
    blob = PostingsBlob(encode_postings(doc_ids, freqs))
    d, f = blob.decode_docs_freqs()
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(f, freqs)
    assert int(blob.max_tf[0]) == 0xFFFF  # saturated block-max


def test_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_postings(np.array([3, 2], dtype=np.uint64), np.array([1, 1], dtype=np.uint64))
    with pytest.raises(ValueError):
        encode_postings(np.array([2, 2], dtype=np.uint64), np.array([1, 1], dtype=np.uint64))
    with pytest.raises(ValueError):
        encode_postings(np.array([], dtype=np.uint64), np.array([], dtype=np.uint64))


def test_block_decode_equals_full_decode():
    rng = np.random.default_rng(7)
    n = 10 * BLOCK + 31
    doc_ids, freqs, _ = _random_postings(rng, n, with_positions=False)
    blob = PostingsBlob(encode_postings(doc_ids, freqs))
    got_d, got_f = [], []
    for i in range(blob.n_blocks):
        d, f = blob.decode_block(i)
        got_d.append(d)
        got_f.append(f)
    assert np.array_equal(np.concatenate(got_d), doc_ids)
    assert np.array_equal(np.concatenate(got_f), freqs)
    # block directory invariants
    assert np.array_equal(blob.last_docid, doc_ids[np.minimum(np.arange(1, blob.n_blocks + 1) * BLOCK, n) - 1])
    assert int(blob.counts.sum()) == n
    for i in range(blob.n_blocks):
        s, e = i * BLOCK, min((i + 1) * BLOCK, n)
        assert int(blob.max_tf[i]) == min(int(freqs[s:e].max()), 0xFFFF)
        assert int(blob.hit_base[i]) == int(freqs[:s].sum())


def test_seek_block_vs_linear_scan():
    rng = np.random.default_rng(11)
    n = 7 * BLOCK + 5
    doc_ids, freqs, _ = _random_postings(rng, n, with_positions=False, max_gap=50)
    blob = PostingsBlob(encode_postings(doc_ids, freqs))
    targets = rng.integers(0, int(doc_ids[-1]) + 10, size=200, dtype=np.uint64)
    for t in targets:
        bi = blob.seek_block(int(t))
        # linear-scan reference: first block with last_docid >= t
        ref = next((i for i in range(blob.n_blocks) if int(blob.last_docid[i]) >= t), blob.n_blocks)
        assert bi == ref
        if bi < blob.n_blocks:
            d, _ = blob.decode_block(bi)
            # first doc >= t in this block equals first doc >= t globally
            expect = doc_ids[np.searchsorted(doc_ids, t)]
            if (d >= t).any():
                assert d[d >= t][0] == expect


def test_encode_many_matches_single_term_encoder():
    from trinity_ray.codec import encode_many

    rng = np.random.default_rng(3)
    term_lens = [1, 2, BLOCK, BLOCK + 5, 700, 3]
    offs = np.concatenate(([0], np.cumsum(term_lens)))
    all_docs, all_freqs, all_pos = [], [], []
    for tl in term_lens:
        d, f, p = _random_postings(rng, tl, with_positions=True, max_gap=1000)
        all_docs.append(d)
        all_freqs.append(f)
        all_pos.append(p)
    doc_ids = np.concatenate(all_docs)
    freqs = np.concatenate(all_freqs)
    positions = np.concatenate(all_pos)
    blobs = encode_many(offs, doc_ids, freqs, positions)
    assert len(blobs) == len(term_lens)
    for i, blob in enumerate(blobs):
        expect = encode_postings(all_docs[i], all_freqs[i], all_pos[i])
        assert blob == expect, f"term {i} blob mismatch"
    # positionless variant
    blobs = encode_many(offs, doc_ids, freqs, None)
    for i, blob in enumerate(blobs):
        assert blob == encode_postings(all_docs[i], all_freqs[i], None)


def test_encode_many_rejects_unsorted_within_term():
    from trinity_ray.codec import encode_many

    offs = np.array([0, 2, 4])
    docs = np.array([1, 5, 9, 2], dtype=np.uint64)  # second term descends? no: 9,2 descends
    freqs = np.ones(4, dtype=np.uint64)
    with pytest.raises(ValueError):
        encode_many(offs, docs, freqs)
    # descending across term boundary is fine (resets)
    docs = np.array([5, 9, 2, 3], dtype=np.uint64)
    assert len(encode_many(offs, docs, freqs)) == 2


@given(
    st.lists(st.tuples(st.integers(1, 6), st.integers(0, 50)),
             min_size=1, max_size=400),
    st.integers(0, 2**33),
)
@settings(max_examples=60, deadline=None)
def test_block_positions_roundtrip(spec, base):
    """decode_block_positions over every block == slicing the full stream."""
    import numpy as np

    from trinity_ray.codec import PostingsBlob, encode_postings

    doc_ids = np.cumsum([1 + gap for _, gap in spec]).astype(np.uint64) + np.uint64(base)
    freqs = np.array([tf for tf, _ in spec], dtype=np.uint64)
    rng = np.random.default_rng(7)
    pos = np.concatenate([
        np.sort(rng.choice(np.arange(1, 200, dtype=np.uint64), int(tf),
                           replace=False))
        for tf in freqs
    ])
    blob = PostingsBlob(encode_postings(doc_ids, freqs, pos))
    full_pos, full_offs = blob.decode_positions(freqs)
    np.testing.assert_array_equal(full_pos, pos)
    hit = 0
    for b in range(blob.n_blocks):
        d, f = blob.decode_block(b)
        bpos, boffs = blob.decode_block_positions(b, f)
        n_hits = int(f.sum())
        np.testing.assert_array_equal(bpos, pos[hit:hit + n_hits])
        np.testing.assert_array_equal(np.diff(boffs), f.astype(np.int64))
        hit += n_hits
    assert hit == pos.size


@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=300))
@settings(max_examples=60, deadline=None)
def test_varint_uint32_compaction_roundtrip(vals):
    """uint32-compacted encode decodes identically to uint64 values."""
    import numpy as np

    from trinity_ray.codec import varint_decode, varint_encode

    arr = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr), arr.size).tolist() == vals


# ---------------------------------------------------------------------------
# packed (bit-packed FOR) codec + payload channel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [1, 2, BLOCK - 1, BLOCK, BLOCK + 1,
                               5 * BLOCK + 17, 3000])
@pytest.mark.parametrize("with_positions", [True, False])
def test_packed_roundtrip(n, with_positions):
    rng = np.random.default_rng(n)
    doc_ids, freqs, positions = _random_postings(rng, n, with_positions)
    blob = encode_postings(doc_ids, freqs, positions, codec="packed")
    pb = PostingsBlob(blob)
    assert pb.version == 2
    d, f = pb.decode_docs_freqs()
    np.testing.assert_array_equal(d, doc_ids)
    np.testing.assert_array_equal(f, freqs)
    if with_positions:
        p, offs = pb.decode_positions(f)
        np.testing.assert_array_equal(p, positions)


@pytest.mark.parametrize("codec", ["varint", "packed"])
def test_packed_block_decode_equals_full(codec):
    rng = np.random.default_rng(7)
    doc_ids, freqs, positions = _random_postings(rng, 2000)
    pb = PostingsBlob(encode_postings(doc_ids, freqs, positions, codec=codec))
    full_d, full_f = pb.decode_docs_freqs()
    got_d, got_f = [], []
    for i in range(pb.n_blocks):
        d, f = pb.decode_block(i)
        got_d.append(d)
        got_f.append(f)
    np.testing.assert_array_equal(np.concatenate(got_d), full_d)
    np.testing.assert_array_equal(np.concatenate(got_f), full_f)


def test_packed_encode_many_matches_single():
    from trinity_ray.codec import encode_many

    rng = np.random.default_rng(11)
    offsets = [0]
    all_d, all_f, all_p = [], [], []
    for t in range(23):
        n = int(rng.integers(1, 4 * BLOCK))
        d, f, p = _random_postings(rng, n)
        offsets.append(offsets[-1] + n)
        all_d.append(d)
        all_f.append(f)
        all_p.append(p)
    blobs = encode_many(np.array(offsets), np.concatenate(all_d),
                        np.concatenate(all_f), np.concatenate(all_p),
                        codec="packed")
    assert len(blobs) == 23
    for t in range(23):
        single = encode_postings(all_d[t], all_f[t], all_p[t], codec="packed")
        assert blobs[t] == single, f"term {t} blob differs from single-term"


@pytest.mark.parametrize("codec", ["varint", "packed"])
@pytest.mark.parametrize("width", [1, 4, 8])
def test_payload_roundtrip(codec, width):
    rng = np.random.default_rng(width)
    doc_ids, freqs, positions = _random_postings(rng, 700)
    n_hits = int(freqs.sum())
    hi = (1 << (8 * width)) - 1
    payloads = rng.integers(0, min(hi, 1 << 62), size=n_hits,
                            dtype=np.uint64)
    blob = encode_postings(doc_ids, freqs, positions, payloads=payloads,
                           payload_width=width, codec=codec)
    pb = PostingsBlob(blob)
    assert pb.payload_width == width
    d, f = pb.decode_docs_freqs()
    pay, offs = pb.decode_payloads(f)
    np.testing.assert_array_equal(pay, payloads)
    # block-level payload decode == full-stream slice
    for i in range(pb.n_blocks):
        bd, bf = pb.decode_block(i)
        bpay, boffs = pb.decode_block_payloads(i, bf)
        h0 = int(pb.hit_base[i])
        np.testing.assert_array_equal(bpay, payloads[h0:h0 + int(bf.sum())])


@given(st.integers(1, 400), st.integers(1, 8), st.integers(0, 1))
@settings(max_examples=30, deadline=None)
def test_payload_roundtrip_hypothesis(n, width, codec_i):
    codec = ["varint", "packed"][codec_i]
    rng = np.random.default_rng(n * 8 + width)
    doc_ids, freqs, positions = _random_postings(rng, n)
    n_hits = int(freqs.sum())
    hi = min((1 << (8 * width)) - 1, (1 << 62))
    payloads = rng.integers(0, hi + 1, size=n_hits, dtype=np.uint64)
    blob = encode_postings(doc_ids, freqs, positions, payloads=payloads,
                           payload_width=width, codec=codec)
    pb = PostingsBlob(blob)
    d, f = pb.decode_docs_freqs()
    np.testing.assert_array_equal(d, doc_ids)
    pay, _ = pb.decode_payloads(f)
    np.testing.assert_array_equal(pay, payloads)


def test_payload_overflow_rejected():
    rng = np.random.default_rng(0)
    doc_ids, freqs, positions = _random_postings(rng, 10)
    payloads = np.full(int(freqs.sum()), 1 << 20, dtype=np.uint64)
    with pytest.raises(ValueError, match="payload exceeds"):
        encode_postings(doc_ids, freqs, positions, payloads=payloads,
                        payload_width=2)


def test_packed_encode_many_huge_and_mixed_widths():
    """encode_many packed path: terms with very different delta magnitudes
    exercise the width-grouped batched packing and the ragged final block."""
    from trinity_ray.codec import encode_many

    rng = np.random.default_rng(3)
    d1 = np.cumsum(rng.integers(1, 3, 300, dtype=np.uint64), dtype=np.uint64)
    d2 = np.cumsum(rng.integers(1 << 30, 1 << 33, 300, dtype=np.uint64),
                   dtype=np.uint64)
    f1 = rng.integers(1, 4, 300, dtype=np.uint64)
    f2 = rng.integers(1, 65000, 300, dtype=np.uint64)
    offsets = np.array([0, 300, 600])
    blobs = encode_many(offsets, np.concatenate([d1, d2]),
                        np.concatenate([f1, f2]), None, codec="packed")
    for blob, (d, f) in zip(blobs, [(d1, f1), (d2, f2)]):
        pb = PostingsBlob(blob)
        gd, gf = pb.decode_docs_freqs()
        np.testing.assert_array_equal(gd, d)
        np.testing.assert_array_equal(gf, f)


@given(st.integers(0, 10_000), st.booleans(), st.integers(0, 4),
       st.sampled_from(["varint", "packed"]))
@settings(max_examples=40, deadline=None)
def test_concat_encoded_many_differential(seed, with_pay, pay_width_sel,
                                          codec):
    """Byte-concat merge == decode+re-encode reference on random term
    groups, for BOTH codecs (v1 re-varints each non-first first delta; v2
    overwrites it in place within the block's bit width):
    docs/freqs/positions/payloads identical, block access works across
    source seams, dictionary stats agree."""
    from trinity_ray.codec import concat_encoded_many, encode_postings

    rng = np.random.default_rng(seed)
    pay_w = [0, 1, 2, 4, 8][pay_width_sel] if with_pay else 0
    all_blobs, term_rows, refs = [], [0], []
    for t in range(int(rng.integers(1, 12))):
        n_src = int(rng.integers(1, 6))
        base = int(rng.integers(0, 1000))
        D, F, P, Y = [], [], [], []
        for _ in range(n_src):
            n = int(rng.integers(1, 3 * BLOCK))
            gaps = rng.integers(1, 2000, n).astype(np.uint64)
            d = np.cumsum(gaps, dtype=np.uint64) + np.uint64(base)
            base = int(d[-1]) + int(rng.integers(1, 50))
            f = rng.integers(1, 7, n).astype(np.uint64)
            nh = int(f.sum())
            pos = np.concatenate([
                np.sort(rng.choice(np.arange(1, 1 << 13, dtype=np.uint64),
                                   size=int(x), replace=False)) for x in f])
            pay = (rng.integers(0, 1 << (8 * pay_w - 1) if pay_w < 8
                                else 1 << 62, nh, dtype=np.uint64)
                   if pay_w else None)
            all_blobs.append(encode_postings(d, f, pos, payloads=pay,
                                             payload_width=pay_w,
                                             codec=codec))
            D.append(d)
            F.append(f)
            P.append(pos)
            if pay_w:
                Y.append(pay)
        term_rows.append(len(all_blobs))
        refs.append((np.concatenate(D), np.concatenate(F),
                     np.concatenate(P),
                     np.concatenate(Y) if pay_w else None))
    lens = np.fromiter((len(b) for b in all_blobs), np.int64)
    cat = np.frombuffer(b"".join(all_blobs), np.uint8)
    off = np.concatenate(([0], np.cumsum(lens)))[:-1]
    from trinity_ray.codec import _codec_version

    out = concat_encoded_many(cat, off, lens,
                              np.asarray(term_rows, np.int64),
                              want_version=_codec_version(codec))
    assert out is not None
    blobs, df, mtf, sh = out
    for t, (d, f, p, y) in enumerate(refs):
        pb = PostingsBlob(blobs[t])
        gd, gf = pb.decode_docs_freqs()
        np.testing.assert_array_equal(gd, d)
        np.testing.assert_array_equal(gf, f)
        gp, _ = pb.decode_positions(gf)
        np.testing.assert_array_equal(gp, p)
        if y is not None:
            gy, _ = pb.decode_payloads(gf)
            np.testing.assert_array_equal(gy, y)
        assert df[t] == d.size and sh[t] == int(f.sum())
        assert mtf[t] == int(f.max())
        # block access through the stitched directory, incl. seam blocks
        got_d = np.concatenate([pb.decode_block(i)[0]
                                for i in range(pb.n_blocks)])
        np.testing.assert_array_equal(got_d, d)


def test_concat_encoded_many_rejects_overlap_and_mixed():
    from trinity_ray.codec import concat_encoded_many, encode_postings

    d1 = np.array([1, 5, 9], dtype=np.uint64)
    d2 = np.array([7, 12], dtype=np.uint64)  # overlaps d1's range
    f = lambda d: np.ones(d.size, dtype=np.uint64)
    blobs = [encode_postings(d1, f(d1)), encode_postings(d2, f(d2))]
    lens = np.fromiter((len(b) for b in blobs), np.int64)
    cat = np.frombuffer(b"".join(blobs), np.uint8)
    off = np.concatenate(([0], np.cumsum(lens)))[:-1]
    assert concat_encoded_many(cat, off, lens,
                               np.array([0, 2], np.int64)) is None
    # MIXED-codec groups defer to the decode path
    blobs2 = [encode_postings(d1, f(d1)),
              encode_postings(np.array([20, 30], np.uint64),
                              np.ones(2, np.uint64), codec="packed")]
    lens2 = np.fromiter((len(b) for b in blobs2), np.int64)
    cat2 = np.frombuffer(b"".join(blobs2), np.uint8)
    off2 = np.concatenate(([0], np.cumsum(lens2)))[:-1]
    assert concat_encoded_many(cat2, off2, lens2,
                               np.array([0, 2], np.int64)) is None
    # an explicit cross-codec rewrite (want_version != source codec) defers
    # to the decode path even when sources are uniform
    blobs3 = [encode_postings(d1, f(d1), codec="packed"),
              encode_postings(np.array([20, 30], np.uint64),
                              np.ones(2, np.uint64), codec="packed")]
    lens3 = np.fromiter((len(b) for b in blobs3), np.int64)
    cat3 = np.frombuffer(b"".join(blobs3), np.uint8)
    off3 = np.concatenate(([0], np.cumsum(lens3)))[:-1]
    assert concat_encoded_many(cat3, off3, lens3,
                               np.array([0, 2], np.int64),
                               want_version=1) is None
    # ...and packed-overlap is rejected like varint-overlap
    blobs4 = [encode_postings(d1, f(d1), codec="packed"),
              encode_postings(d2, f(d2), codec="packed")]
    lens4 = np.fromiter((len(b) for b in blobs4), np.int64)
    cat4 = np.frombuffer(b"".join(blobs4), np.uint8)
    off4 = np.concatenate(([0], np.cumsum(lens4)))[:-1]
    assert concat_encoded_many(cat4, off4, lens4,
                               np.array([0, 2], np.int64)) is None


def test_terms_bin_writer_large_binary_offsets(tmp_path):
    """add_table must parse int64 (large_binary) offsets: encode_many_arrow
    switches to large_binary once a run's blob bytes exceed 2 GiB, and
    reading its offsets buffer as int32 scrambles every blob range."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from trinity_ray.index.build import TermsBinWriter
    from trinity_ray.index.segment import hits_path

    rng = np.random.default_rng(7)
    blobs = []
    for n in (3, 17, 130):
        d, f, p = _random_postings(rng, n)
        blobs.append(encode_postings(d, f, p))

    def table(binary_type):
        return pa.table({
            "term": pa.array(["a", "b", "c"]),
            "df": pa.array([3, 17, 130], pa.uint32()),
            "max_tf": pa.array([5, 5, 5], pa.uint32()),
            "sum_hits": pa.array([9, 40, 300], pa.uint64()),
            "blob": pa.array(blobs, binary_type),
        })

    outs = {}
    for name, typ in (("narrow", pa.binary()), ("wide", pa.large_binary())):
        terms = str(tmp_path / f"{name}-terms.parquet")
        binf = str(tmp_path / f"{name}-postings.bin")
        w = TermsBinWriter(terms, binf)
        w.add_table(table(typ))
        w.close()
        outs[name] = (
            pq.read_table(terms).to_pydict(),
            open(binf, "rb").read(),
            open(hits_path(binf), "rb").read(),
        )
    assert outs["narrow"] == outs["wide"]
    assert len(outs["wide"][1]) > 0 and len(outs["wide"][2]) > 0
