"""Blocked compressed posting lists with a skiplist directory — TWO codecs
behind one seam, mirroring the reference's pluggable-codec design point
(codecs.h:67-317: two interchangeable codecs, per-blob identification,
cross-codec merge):

- ``varint`` (version 1): LEB128 doc-delta / tf / position-delta sections
  (the Google-style codec, /root/reference/google_codec.cpp:19-176).
- ``packed`` (version 2): per-block bit-packed FOR sections — each block
  stores its values at the block-max bit width (PFOR without exceptions;
  the Lucene-style packed-ints idea, lucene_codec.cpp:163-388).

Blob layout (little-endian), one per term::

    header (32 B):
      u8  magic (0x54), u8 version (codec id: 1 varint / 2 packed)
      u8  flags (bit0 = positions, bit1 = per-hit payloads)
      u8  payload_width               # bytes per hit payload (0..8)
      u32 doc_count
      u32 n_blocks
      u32 docs_len, u32 freqs_len, u32 pos_len, u32 pay_len  # section bytes
      u32 n_hits                      # total hits (sum of tf)
    block directory ("skiplist", fixed-width => vectorized seek):
      u64[n_blocks] last_docid      # last docID in block  (advance = searchsorted)
      u32[n_blocks] docs_off        # byte offset of block start in docs section
      u32[n_blocks] freqs_off       #   "            "        freqs section
      u32[n_blocks] pos_off         #   "            "        positions section
      u32[n_blocks] hit_base        # cumulative hit count before block
      u16[n_blocks] counts          # docs in block (<= BLOCK)
      u16[n_blocks] max_tf          # block-max term frequency (block-max WAND)
      [version 2 only]
      u8[n_blocks] bw_docs          # bit width of the block's doc deltas
      u8[n_blocks] bw_freqs         #   "            "        tfs
      u8[n_blocks] bw_pos           #   "            "        position deltas
    sections:
      docs    # doc-ID deltas (delta[0] absolute; block-first delta relative
              # to the previous block's last docID)
      freqs   # tf per doc
      pos     # per doc: first position absolute, then deltas
      pay     # per hit: payload_width raw little-endian bytes (uncompressed
              # opaque app payload <= 8 B, codecs.h:194-195 / runtime.h:8-20)

The directory plays the role of the reference's skiplists (every-N-docs
entries, google_codec.cpp:146-158 / lucene_codec.cpp:368-381): `advance(target)`
is a `searchsorted` on ``last_docid`` followed by decoding one block; `max_tf`
is the block-max needed for WAND pruning (BM25 per-term score is monotone in
tf, see similarity.h:228-235).

Blobs are SELF-DESCRIBING (the version byte is the codec id), so a merge can
mix codecs freely: decode dispatches per blob, re-encode uses the output
codec — the reference's cross-codec merge paths (merge.cpp:288-394).

Encoders require strictly ascending doc IDs, mirroring the reference's hard
abort on broken ordering (google_codec.cpp:27-30).

Format limits (u32 header fields, like the reference's 32-bit
term_index_ctx ranges, codecs.h:47-55): one term's postings WITHIN ONE
SEGMENT are capped at 2^32-1 docs / hits / section bytes.  Segments are
partition-sized (millions of docs), so the limits bind per-partition, not
per-corpus; a cluster-scale corpus distributes a hot term across many
segments and the dictionary df (u64 at query time via summation) is
unaffected.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128  # docs per block (reference Lucene codec BLOCK_SIZE, lucene_codec.h:49)
_MAGIC = 0x54
CODECS = {"varint": 1, "packed": 2}  # codec name -> blob version byte
_HEADER = 4 + 8 + 16 + 4  # magic..payload_width + counts + 4 lens + n_hits


def _codec_version(codec: str) -> int:
    try:
        return CODECS[codec]
    except KeyError:
        raise ValueError(f"unknown codec {codec!r}; have {sorted(CODECS)}")


def index_part_len(blob: bytes | memoryview) -> int:
    """Byte length of a blob's INDEX PART (header + directory + docs +
    freqs sections): the storage split point between ``postings.bin`` and
    the hits file holding positions + payloads (the reference routes
    positions/payloads to a separate ``hits.data``, lucene_codec.cpp:
    107-137, so docs-only/BM25 reads fetch zero position bytes).  Parses
    only the fixed 32-byte header."""
    b = np.frombuffer(blob, dtype=np.uint8)[:_HEADER]
    if b.size < _HEADER or b[0] != _MAGIC or int(b[1]) not in (1, 2):
        raise ValueError("bad postings blob header")
    nb = int(b[8:12].view("<u4")[0])
    docs_len, freqs_len = (int(x) for x in b[12:20].view("<u4"))
    per_block = 28 + (3 if int(b[1]) == 2 else 0)
    return _HEADER + per_block * nb + docs_len + freqs_len


def index_part_lens(data: np.ndarray, starts: np.ndarray,
                    ends: np.ndarray) -> np.ndarray:
    """Vectorized :func:`index_part_len` over ``n`` blobs packed in one
    byte buffer (``data[starts[i]:ends[i]]`` is blob *i*): one numpy pass
    parses every fixed 32-byte header, with the same magic/version
    validation as the scalar path so a truncated or corrupt blob raises
    ``bad postings blob header`` instead of splitting at a garbage offset.
    This is THE index/hits split formula — keep in lockstep with
    :func:`index_part_len` (single definition each; no other copies)."""
    starts = starts.astype(np.int64, copy=False)
    ends = ends.astype(np.int64, copy=False)
    if starts.size == 0:
        return np.zeros(0, np.int64)
    if ((ends - starts) < _HEADER).any():
        raise ValueError("bad postings blob header")
    ver = data[starts + 1]
    if (data[starts] != _MAGIC).any() or (~np.isin(ver, (1, 2))).any():
        raise ValueError("bad postings blob header")

    def u32(at: int) -> np.ndarray:        # unaligned LE u32 header field
        return (data[starts + at].astype(np.int64)
                | (data[starts + at + 1].astype(np.int64) << 8)
                | (data[starts + at + 2].astype(np.int64) << 16)
                | (data[starts + at + 3].astype(np.int64) << 24))

    per_block = 28 + 3 * (ver == 2)                      # v2: +3 bw bytes
    split = _HEADER + per_block * u32(8) + u32(12) + u32(16)
    if (split > ends - starts).any():
        raise ValueError("bad postings blob header")
    return split


# ---------------------------------------------------------------------------
# bit-packed FOR kernels (codec "packed")
# ---------------------------------------------------------------------------

def _bit_width(values: np.ndarray) -> int:
    """Bits needed for the max value (0 if all zero)."""
    return int(values.max()).bit_length() if values.size else 0


def _pack_bits(values: np.ndarray, w: int) -> np.ndarray:
    """Pack values (uint64) at w bits each, little-endian bit order."""
    if w == 0 or values.size == 0:
        return np.empty(0, dtype=np.uint8)
    bits = ((values[:, None] >> np.arange(w, dtype=np.uint64)) &
            np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little")


def _unpack_bits(buf: np.ndarray, w: int, count: int) -> np.ndarray:
    """Inverse of :func:`_pack_bits`."""
    if w == 0 or count == 0:
        return np.zeros(count, dtype=np.uint64)
    bits = np.unpackbits(buf, count=count * w, bitorder="little")
    return _bits_to_values(bits.reshape(count, w), w)


def _bits_to_values(bits2d: np.ndarray, w: int) -> np.ndarray:
    """(n, w) little-endian bit matrix -> uint64 values via w
    shift-accumulate passes — numpy integer matmul has no BLAS path and
    runs 2-9x slower than this at the widths FOR blocks use."""
    out = np.zeros(bits2d.shape[0], dtype=np.uint64)
    for k in range(w):
        out |= bits2d[:, k].astype(np.uint64) << np.uint64(k)
    return out


# ---------------------------------------------------------------------------
# vectorized varint (LEB128, u64)
# ---------------------------------------------------------------------------

def _compact(values: np.ndarray) -> np.ndarray:
    """uint32 view of the data when every value fits — halves the memory
    traffic of the varint passes (encode is bandwidth-bound at high
    parallelism); uint64 only when values demand it (absolute docIDs at
    10^12-doc scale)."""
    v = np.ascontiguousarray(values)
    if v.dtype == np.uint32 or v.size == 0:
        return v.astype(np.uint64, copy=False) if v.size == 0 else v
    if int(v.max()) < 0x100000000:
        return v.astype(np.uint32)
    return v.astype(np.uint64, copy=False)


def varint_encode(values: np.ndarray, nbytes: np.ndarray | None = None) -> bytes:
    """LEB128-encode an unsigned array, fully vectorized.  ``nbytes`` (from
    :func:`_byte_lengths` on the same values) skips a duplicate pass."""
    v = _compact(values)
    if v.size == 0:
        return b""
    mask7f = v.dtype.type(0x7F)
    nbits = _byte_lengths(v) if nbytes is None else nbytes
    maxlen = int(nbits.max())
    if maxlen == 1:
        # all values < 128 (the common case for tf and dense doc deltas):
        # the encoding IS the low byte — one astype, no offset scatter
        return v.astype(np.uint8).tobytes()
    offsets = np.concatenate(([0], np.cumsum(nbits, dtype=np.int64)))
    out = np.zeros(offsets[-1], dtype=np.uint8)
    starts = offsets[:-1]
    # k=0 writes EVERY value — skip the all-true mask's fancy gather
    out[starts] = ((v & mask7f)
                   | ((nbits > 1).astype(v.dtype) << v.dtype.type(7))
                   ).astype(np.uint8)
    for k in range(1, maxlen):
        m = nbits > k
        byte = ((v[m] >> v.dtype.type(7 * k)) & mask7f).astype(np.uint8)
        cont = (nbits[m] > k + 1).astype(np.uint8) << 7
        out[starts[m] + k] = byte | cont
    return out.tobytes()


def varint_decode(buf: np.ndarray | bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes to uint64, fully vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, memoryview)) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(b < 128)
    if count is not None:
        ends = ends[:count]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = (b[starts] & 0x7F).astype(np.uint64)
    maxlen = int(lengths.max())
    for k in range(1, maxlen):
        m = lengths > k
        vals[m] |= (b[starts[m] + k].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * k)
    return vals


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _make_header(version: int, has_pos: bool, payload_width: int, n: int,
                 n_blocks: int, lens: tuple[int, int, int, int],
                 n_hits: int) -> bytes:
    flags = (1 if has_pos else 0) | (2 if payload_width else 0)
    return (bytes((_MAGIC, version, flags, payload_width))
            + np.array([n, n_blocks], dtype="<u4").tobytes()
            + np.array(lens, dtype="<u4").tobytes()
            + np.array([n_hits], dtype="<u4").tobytes())


def _payload_bytes(payloads: np.ndarray | None, width: int) -> bytes:
    """Raw fixed-width little-endian payload stream (one value per hit)."""
    if payloads is None or width == 0:
        return b""
    if not (1 <= width <= 8):
        raise ValueError("payload_width must be 1..8 bytes")
    p = np.ascontiguousarray(payloads, dtype=np.uint64)
    if width == 8:
        return p.astype("<u8").tobytes()
    full = p.astype("<u8").view(np.uint8).reshape(-1, 8)
    if (full[:, width:] != 0).any():
        raise ValueError(f"payload exceeds {width} bytes")
    return np.ascontiguousarray(full[:, :width]).tobytes()


def encode_postings(
    doc_ids: np.ndarray,
    freqs: np.ndarray,
    positions: np.ndarray | None = None,
    payloads: np.ndarray | None = None,
    payload_width: int = 0,
    codec: str = "varint",
) -> bytes:
    """Encode one term's postings.

    ``doc_ids``: strictly ascending uint64; ``freqs``: uint32 tf per doc;
    ``positions``: concatenated per-doc ascending positions (len == freqs.sum())
    or None for a positionless index; ``payloads``: one <=8-byte opaque value
    per hit (same order as positions) stored raw at ``payload_width`` bytes.
    """
    version = _codec_version(codec)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    freqs = np.ascontiguousarray(freqs, dtype=np.uint64)
    n = doc_ids.size
    if n == 0:
        raise ValueError("empty postings")
    if n > 1 and not (np.diff(doc_ids.astype(np.int64)) > 0).all():
        raise ValueError("doc_ids must be strictly ascending")  # google_codec.cpp:27-30

    n_hits = int(freqs.sum())
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])

    has_pos = positions is not None
    if has_pos:
        positions = np.ascontiguousarray(positions, dtype=np.uint64)
        if positions.size != n_hits:
            raise ValueError("positions length must equal freqs.sum()")
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(freqs[:-1].astype(np.int64), out=starts[1:]) if n > 1 else None
        pdelta = np.empty_like(positions)
        pdelta[0] = positions[0]
        np.subtract(positions[1:], positions[:-1], out=pdelta[1:])
        pdelta[starts] = positions[starts]  # first pos of each doc absolute
    else:
        pdelta = None
    if payloads is not None and payloads.size != n_hits:
        raise ValueError("payloads length must equal freqs.sum()")
    pay_bytes = _payload_bytes(payloads, payload_width)

    # block structure
    n_blocks = (n + BLOCK - 1) // BLOCK
    bstarts = np.arange(n_blocks, dtype=np.int64) * BLOCK
    bends = np.minimum(bstarts + BLOCK, n)
    last_docid = doc_ids[bends - 1]
    counts = (bends - bstarts).astype(np.uint16)
    hit_base = np.zeros(n_blocks, dtype=np.uint32)
    if n_blocks > 1:
        hit_cum = np.cumsum(freqs.astype(np.int64))
        hit_base[1:] = hit_cum[bstarts[1:] - 1].astype(np.uint32)
    max_tf = np.minimum(
        np.maximum.reduceat(freqs, bstarts), 0xFFFF
    ).astype(np.uint16)
    hstarts = hit_base.astype(np.int64)
    hends = np.concatenate((hstarts[1:], [n_hits]))

    widths_dir = b""
    if version == 1:
        docs_bytes = varint_encode(deltas)
        freqs_bytes = varint_encode(freqs)
        pos_bytes = varint_encode(pdelta) if has_pos else b""
        docs_off = _section_offsets(deltas, bstarts)
        freqs_off = _section_offsets(freqs, bstarts)
        pos_off = (_section_offsets(pdelta,
                                    np.minimum(hstarts, pdelta.size))
                   if has_pos else np.zeros(n_blocks, dtype=np.uint32))
    else:  # packed
        docs_bytes, docs_off, bw_d = _pack_section(deltas, bstarts, bends)
        freqs_bytes, freqs_off, bw_f = _pack_section(freqs, bstarts, bends)
        if has_pos:
            pos_bytes, pos_off, bw_p = _pack_section(pdelta, hstarts, hends)
        else:
            pos_bytes = b""
            pos_off = np.zeros(n_blocks, dtype=np.uint32)
            bw_p = np.zeros(n_blocks, dtype=np.uint8)
        widths_dir = (bw_d.tobytes() + bw_f.tobytes() + bw_p.tobytes())

    header = _make_header(version, has_pos, payload_width if payloads is not None else 0,
                          n, n_blocks,
                          (len(docs_bytes), len(freqs_bytes), len(pos_bytes),
                           len(pay_bytes)), n_hits)
    parts = [
        header,
        last_docid.astype("<u8").tobytes(),
        docs_off.astype("<u4").tobytes(),
        freqs_off.astype("<u4").tobytes(),
        pos_off.astype("<u4").tobytes(),
        hit_base.astype("<u4").tobytes(),
        counts.astype("<u2").tobytes(),
        max_tf.astype("<u2").tobytes(),
        widths_dir,
        docs_bytes if isinstance(docs_bytes, bytes) else docs_bytes.tobytes(),
        freqs_bytes if isinstance(freqs_bytes, bytes) else freqs_bytes.tobytes(),
        pos_bytes if isinstance(pos_bytes, bytes) else pos_bytes.tobytes(),
        pay_bytes,
    ]
    return b"".join(parts)


def _block_widths(values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-block bit width = bit_length(block max), vectorized (<=64 shift
    passes over n_blocks elements, not n values)."""
    bmax = np.maximum.reduceat(values.astype(np.uint64), starts)
    widths = np.zeros(starts.size, dtype=np.uint8)
    tmp = bmax.copy()
    while True:
        m = tmp > 0
        if not m.any():
            break
        widths[m] += 1
        tmp >>= np.uint64(1)
    return widths


def _range_idx(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated [s, s+len) ranges as one index array."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    cum = np.concatenate(([0], np.cumsum(lens)))
    out = np.arange(total, dtype=np.int64)
    out += np.repeat(starts.astype(np.int64) - cum[:-1], lens)
    return out


def _pack_section(values: np.ndarray, starts: np.ndarray, ends: np.ndarray
                  ) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Bit-pack per block at the block-max width (FOR, no exceptions).

    Vectorized: blocks are grouped by width; groups whose blocks are all
    byte-aligned (count*width % 8 == 0 — every FULL block, since
    BLOCK=128) pack in ONE packbits pass per width; ragged blocks (the
    final partial block of a term) pack individually.  Returns (section
    bytes, u32 block byte offsets, u8 block widths)."""
    nb = starts.size
    values = values.astype(np.uint64, copy=False)
    cnt = (ends - starts).astype(np.int64)
    widths = (_block_widths(values, starts) if values.size
              else np.zeros(nb, dtype=np.uint8))
    blen = (cnt * widths.astype(np.int64) + 7) // 8
    offs64 = np.concatenate(([0], np.cumsum(blen)))
    out = np.zeros(int(offs64[-1]), dtype=np.uint8)
    bitlen = cnt * widths.astype(np.int64)
    aligned = (bitlen % 8) == 0
    for w in np.unique(widths):
        if w == 0:
            continue
        sel = np.flatnonzero((widths == w) & aligned)
        if sel.size:
            vals = values[_range_idx(starts[sel], cnt[sel])]
            bits = ((vals[:, None] >> np.arange(w, dtype=np.uint64))
                    & np.uint64(1)).astype(np.uint8)
            packed = np.packbits(bits.reshape(-1), bitorder="little")
            out[_range_idx(offs64[sel], blen[sel])] = packed
        for i in np.flatnonzero((widths == w) & ~aligned):
            c = _pack_bits(values[starts[i]:ends[i]], int(w))
            out[offs64[i]:offs64[i] + c.size] = c
    return out.tobytes(), offs64[:-1].astype(np.uint32), widths


def _unpack_section(sec: np.ndarray, offs: np.ndarray, widths: np.ndarray,
                    cnt: np.ndarray) -> np.ndarray:
    """Decode a whole bit-packed section (all blocks, value order)."""
    total = int(cnt.sum())
    out = np.zeros(total, dtype=np.uint64)
    vstarts = np.concatenate(([0], np.cumsum(cnt)))
    bitlen = cnt.astype(np.int64) * widths.astype(np.int64)
    blen = (bitlen + 7) // 8
    aligned = (bitlen % 8) == 0
    for w in np.unique(widths):
        if w == 0:
            continue
        sel = np.flatnonzero((widths == w) & aligned)
        if sel.size:
            raw = sec[_range_idx(offs[sel].astype(np.int64), blen[sel])]
            bits = np.unpackbits(raw, bitorder="little")
            vals = _bits_to_values(bits.reshape(-1, int(w)), int(w))
            out[_range_idx(vstarts[sel], cnt[sel])] = vals
        for i in np.flatnonzero((widths == w) & ~aligned):
            o = int(offs[i])
            out[vstarts[i]:vstarts[i + 1]] = _unpack_bits(
                sec[o:o + int(blen[i])], int(w), int(cnt[i]))
    return out


def _section_offsets(values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Byte offset of each block start within one varint section."""
    cum = np.concatenate(([0], np.cumsum(_byte_lengths(values), dtype=np.int64)))
    return cum[starts].astype(np.uint32)


def _byte_lengths(values: np.ndarray) -> np.ndarray:
    """LEB128 byte length per value, as int8 (max 10) — encode is
    bandwidth-bound, so the per-value metadata array is kept 8x narrower
    than int64; CALLERS must cumsum with dtype=np.int64."""
    v = values if values.dtype.kind == "u" else values.astype(np.uint64)
    nbytes = np.ones(v.shape, dtype=np.int8)
    tmp = v >> v.dtype.type(7)
    mask = tmp > 0
    while mask.any():
        nbytes[mask] += 1
        tmp >>= v.dtype.type(7)
        mask = tmp > 0
    return nbytes


def encode_many(
    term_offsets: np.ndarray,
    doc_ids: np.ndarray,
    freqs: np.ndarray,
    positions: np.ndarray | None = None,
    payloads: np.ndarray | None = None,
    payload_width: int = 0,
    codec: str = "varint",
) -> list[bytes]:
    """Encode MANY terms' postings in a few global vectorized passes.

    ``term_offsets`` (int64, len T+1) delimits each term's slice of
    ``doc_ids``/``freqs`` (term-major, doc-ascending within term);
    ``positions`` / ``payloads`` are the full concatenated hit streams
    (len == freqs.sum()) in the same order.  Returns one self-contained
    blob per term, identical to :func:`encode_postings` output.

    This is the index-build hot path: the reference's profile shows encode
    dominating segment commit (indexer.cpp:303-306, 11.8s of ~17s), so ALL
    work here is global numpy — section encoding (varint passes or
    width-grouped bit packing) AND blob assembly (one fancy scatter per
    field into one contiguous buffer; the per-term bytes-concat loop this
    replaces was ~70% of encode time at ~14 copies per term)."""
    out, bo = _encode_many_buffer(term_offsets, doc_ids, freqs, positions,
                                  payloads, payload_width, codec)
    return [out[bo[t]:bo[t + 1]].tobytes() for t in range(bo.size - 1)]


def encode_many_arrow(
    term_offsets: np.ndarray,
    doc_ids: np.ndarray,
    freqs: np.ndarray,
    positions: np.ndarray | None = None,
    payloads: np.ndarray | None = None,
    payload_width: int = 0,
    codec: str = "varint",
):
    """:func:`encode_many`, but returning a ZERO-COPY Arrow binary array
    (one blob per term) over the single assembled buffer — the build path
    puts this straight into the terms table without materializing T bytes
    objects."""
    import pyarrow as pa

    out, bo = _encode_many_buffer(term_offsets, doc_ids, freqs, positions,
                                  payloads, payload_width, codec)
    n = bo.size - 1
    if bo[-1] <= 0x7FFFFFFF:
        return pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(bo.astype(np.int32)), pa.py_buffer(out)])
    return pa.Array.from_buffers(
        pa.large_binary(), n, [None, pa.py_buffer(bo), pa.py_buffer(out)])


def _encode_many_buffer(
    term_offsets: np.ndarray,
    doc_ids: np.ndarray,
    freqs: np.ndarray,
    positions: np.ndarray | None = None,
    payloads: np.ndarray | None = None,
    payload_width: int = 0,
    codec: str = "varint",
) -> tuple[np.ndarray, np.ndarray]:
    """Core of :func:`encode_many`: (uint8 buffer, int64 blob offsets)."""
    version = _codec_version(codec)
    term_offsets = np.ascontiguousarray(term_offsets, dtype=np.int64)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    freqs = np.ascontiguousarray(freqs, dtype=np.uint64)
    T = term_offsets.size - 1
    n = doc_ids.size
    if n == 0 or T == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    tstarts = term_offsets[:-1]
    n_t = np.diff(term_offsets)
    if (n_t <= 0).any():
        raise ValueError("every term must have at least one posting")

    # --- doc deltas with per-term reset ---
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    deltas[tstarts] = doc_ids[tstarts]
    if n > 1:
        inner = np.ones(n, dtype=bool)
        inner[tstarts] = False
        if (doc_ids[1:] <= doc_ids[:-1])[inner[1:]].any():
            raise ValueError("doc_ids must be strictly ascending within term")

    hit_cum = np.concatenate(([0], np.cumsum(freqs.astype(np.int64))))  # per-posting hit offsets
    has_pos = positions is not None
    if has_pos:
        positions = np.ascontiguousarray(positions, dtype=np.uint64)
        if positions.size != hit_cum[-1]:
            raise ValueError("positions length must equal freqs.sum()")
        dstarts_h = hit_cum[:-1]  # first hit index of each posting (doc)
        pdelta = np.empty_like(positions)
        if positions.size:
            pdelta[0] = positions[0]
            np.subtract(positions[1:], positions[:-1], out=pdelta[1:])
            pdelta[dstarts_h] = positions[dstarts_h]
    else:
        pdelta = None

    if payloads is not None:
        if payloads.size != hit_cum[-1]:
            raise ValueError("payloads length must equal freqs.sum()")
        pay_all = np.frombuffer(_payload_bytes(payloads, payload_width),
                                dtype=np.uint8)
        pw = payload_width
    else:
        pay_all = np.empty(0, dtype=np.uint8)
        pw = 0

    # --- global block structure (blocks tile the posting stream) ---
    nblocks_t = (n_t + BLOCK - 1) // BLOCK
    total_blocks = int(nblocks_t.sum())
    block_term = np.repeat(np.arange(T), nblocks_t)
    first_block_of_term = np.concatenate(([0], np.cumsum(nblocks_t)))
    block_in_term = np.arange(total_blocks) - first_block_of_term[block_term]
    bstart = tstarts[block_term] + block_in_term * BLOCK
    bend = np.minimum(bstart + BLOCK, term_offsets[1:][block_term])

    g_last_docid = doc_ids[bend - 1]
    g_counts = (bend - bstart).astype(np.uint16)
    g_max_tf = np.minimum(np.maximum.reduceat(freqs, bstart), 0xFFFF).astype(np.uint16)
    g_hit_base = (hit_cum[bstart] - hit_cum[tstarts[block_term]]).astype(np.uint32)

    widths_b = (None, None, None)
    if version == 1:
        deltas_c = _compact(deltas)
        nb_d = _byte_lengths(deltas_c)
        docs_all = np.frombuffer(varint_encode(deltas_c, nb_d), dtype=np.uint8)
        docs_cum = np.concatenate(([0], np.cumsum(nb_d, dtype=np.int64)))
        freqs_c = _compact(freqs)
        nb_f = _byte_lengths(freqs_c)
        freqs_all = np.frombuffer(varint_encode(freqs_c, nb_f), dtype=np.uint8)
        freqs_cum = np.concatenate(([0], np.cumsum(nb_f, dtype=np.int64)))
        if has_pos:
            pdelta_c = _compact(pdelta)
            nb_p = _byte_lengths(pdelta_c)
            pos_all = np.frombuffer(varint_encode(pdelta_c, nb_p), dtype=np.uint8)
            pos_cum = np.concatenate(([0], np.cumsum(nb_p, dtype=np.int64)))
        else:
            pos_all = np.empty(0, dtype=np.uint8)
            pos_cum = np.zeros(1, dtype=np.int64)
        g_docs_off = (docs_cum[bstart] - docs_cum[tstarts[block_term]]).astype(np.uint32)
        g_freqs_off = (freqs_cum[bstart] - freqs_cum[tstarts[block_term]]).astype(np.uint32)
        if has_pos:
            g_pos_off = (pos_cum[hit_cum[bstart]] - pos_cum[hit_cum[tstarts[block_term]]]).astype(np.uint32)
        else:
            g_pos_off = np.zeros(total_blocks, dtype=np.uint32)
        # per-term byte ranges in the three sections
        t_docs = docs_cum[term_offsets]
        t_freqs = freqs_cum[term_offsets]
        t_pos = pos_cum[hit_cum[term_offsets]] if has_pos else np.zeros(T + 1, dtype=np.int64)
    else:  # packed: ONE width-grouped packing pass per section, all terms
        sec_d, off_d, bw_d = _pack_section(deltas, bstart, bend)
        sec_f, off_f, bw_f = _pack_section(freqs, bstart, bend)
        docs_all = np.frombuffer(sec_d, dtype=np.uint8)
        freqs_all = np.frombuffer(sec_f, dtype=np.uint8)
        fb = first_block_of_term
        t_docs = np.concatenate((off_d[fb[:-1]].astype(np.int64),
                                 [docs_all.size]))
        t_freqs = np.concatenate((off_f[fb[:-1]].astype(np.int64),
                                  [freqs_all.size]))
        g_docs_off = (off_d.astype(np.int64)
                      - t_docs[block_term]).astype(np.uint32)
        g_freqs_off = (off_f.astype(np.int64)
                       - t_freqs[block_term]).astype(np.uint32)
        if has_pos:
            hbstart = hit_cum[bstart]
            hbend = hit_cum[bend]
            sec_p, off_p, bw_p = _pack_section(pdelta, hbstart, hbend)
            pos_all = np.frombuffer(sec_p, dtype=np.uint8)
            t_pos = np.concatenate((off_p[fb[:-1]].astype(np.int64),
                                    [pos_all.size]))
            g_pos_off = (off_p.astype(np.int64)
                         - t_pos[block_term]).astype(np.uint32)
        else:
            pos_all = np.empty(0, dtype=np.uint8)
            t_pos = np.zeros(T + 1, dtype=np.int64)
            g_pos_off = np.zeros(total_blocks, dtype=np.uint32)
            bw_p = np.zeros(total_blocks, dtype=np.uint8)
        widths_b = (bw_d, bw_f, bw_p)

    t_pay = hit_cum[term_offsets] * pw  # per-term payload byte ranges

    last_b = g_last_docid.astype("<u8")
    docs_off_b = g_docs_off.astype("<u4")
    freqs_off_b = g_freqs_off.astype("<u4")
    pos_off_b = g_pos_off.astype("<u4")
    hit_base_b = g_hit_base.astype("<u4")
    counts_b = g_counts.astype("<u2")
    max_tf_b = g_max_tf.astype("<u2")

    # ---- vectorized blob assembly ----
    # Every field's source data is already term-major and contiguous (the
    # global block/section arrays), so each field lands in the output with
    # ONE fancy scatter: out[ranges] = field_bytes — no per-term slicing,
    # no T x 14 bytes-object concatenations.
    nblk = nblocks_t.astype(np.int64)
    widths_w = 3 if version == 2 else 0
    sec_d = np.diff(t_docs).astype(np.int64)
    sec_f = np.diff(t_freqs).astype(np.int64)
    sec_p = np.diff(t_pos).astype(np.int64)
    sec_y = np.diff(t_pay).astype(np.int64)
    dir_w = 8 + 4 + 4 + 4 + 4 + 2 + 2
    blob_len = (_HEADER + nblk * (dir_w + widths_w)
                + sec_d + sec_f + sec_p + sec_y)
    bo = np.concatenate(([0], np.cumsum(blob_len))).astype(np.int64)
    out = np.empty(int(bo[-1]), dtype=np.uint8)

    hits_t = (hit_cum[term_offsets[1:]]
              - hit_cum[term_offsets[:-1]]).astype(np.int64)
    hdr = np.zeros((T, _HEADER), dtype=np.uint8)
    hdr[:, 0] = _MAGIC
    hdr[:, 1] = version
    hdr[:, 2] = (1 if has_pos else 0) | (2 if pw else 0)
    hdr[:, 3] = pw
    hdr[:, 4:8] = n_t.astype("<u4")[:, None].view(np.uint8)
    hdr[:, 8:12] = nblk.astype("<u4")[:, None].view(np.uint8)
    hdr[:, 12:16] = sec_d.astype("<u4")[:, None].view(np.uint8)
    hdr[:, 16:20] = sec_f.astype("<u4")[:, None].view(np.uint8)
    hdr[:, 20:24] = sec_p.astype("<u4")[:, None].view(np.uint8)
    hdr[:, 24:28] = sec_y.astype("<u4")[:, None].view(np.uint8)
    hdr[:, 28:32] = hits_t.astype("<u4")[:, None].view(np.uint8)
    out[(bo[:-1, None] + np.arange(_HEADER)).ravel()] = hdr.ravel()

    cursor = bo[:-1] + _HEADER
    for arr, w in ((last_b, 8), (docs_off_b, 4), (freqs_off_b, 4),
                   (pos_off_b, 4), (hit_base_b, 4), (counts_b, 2),
                   (max_tf_b, 2)):
        out[_range_idx(cursor, nblk * w)] = arr.view(np.uint8)
        cursor = cursor + nblk * w
    if version == 2:
        for arr in widths_b:
            out[_range_idx(cursor, nblk)] = np.ascontiguousarray(
                arr, dtype=np.uint8)
            cursor = cursor + nblk
    for src, lens in ((docs_all, sec_d), (freqs_all, sec_f),
                      (pos_all, sec_p), (pay_all, sec_y)):
        if lens.sum():
            out[_range_idx(cursor, lens)] = src
        cursor = cursor + lens
    return out, bo


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

class PostingsBlob:
    """Zero-ish-copy view over one encoded term blob.

    Exposes full-stream vectorized decode (the hot path for query execution)
    and block-level access (the skiplist path: ``advance``/WAND).
    """

    __slots__ = (
        "buf", "version", "doc_count", "n_blocks", "has_positions",
        "payload_width", "last_docid", "docs_off", "freqs_off", "pos_off",
        "hit_base", "counts", "max_tf", "bw_docs", "bw_freqs", "bw_pos",
        "n_hits",
        "_docs_sec", "_freqs_sec", "_pos_sec", "_pay_sec",
        "_pos_len", "_pay_len", "_hits_loader",
    )

    def __init__(self, blob: bytes | memoryview, hits_loader=None):
        """``blob`` is either a FULL blob (header + directory + all four
        sections) or its INDEX PART only (everything up to the end of the
        freqs section).  In the second case ``hits_loader`` must return the
        positions+payloads byte range on first use — the storage split that
        lets docs-only/BM25 reads fetch zero position bytes (the
        reference's separate hits file, lucene_codec.cpp:107-137)."""
        buf = np.frombuffer(blob, dtype=np.uint8)
        if buf[0] != _MAGIC or buf[1] not in (1, 2):
            raise ValueError("bad postings blob header")
        self.buf = buf
        self.version = int(buf[1])  # == codec id (self-describing blobs)
        self.has_positions = bool(buf[2] & 1)
        self.payload_width = int(buf[3]) if (buf[2] & 2) else 0
        self.doc_count = int(buf[4:8].view("<u4")[0])
        self.n_blocks = int(buf[8:12].view("<u4")[0])
        docs_len, freqs_len, pos_len, pay_len = (
            int(x) for x in buf[12:28].view("<u4"))
        self.n_hits = int(buf[28:32].view("<u4")[0])
        nb = self.n_blocks
        o = _HEADER
        self.last_docid = buf[o:o + 8 * nb].view("<u8"); o += 8 * nb
        self.docs_off = buf[o:o + 4 * nb].view("<u4"); o += 4 * nb
        self.freqs_off = buf[o:o + 4 * nb].view("<u4"); o += 4 * nb
        self.pos_off = buf[o:o + 4 * nb].view("<u4"); o += 4 * nb
        self.hit_base = buf[o:o + 4 * nb].view("<u4"); o += 4 * nb
        self.counts = buf[o:o + 2 * nb].view("<u2"); o += 2 * nb
        self.max_tf = buf[o:o + 2 * nb].view("<u2"); o += 2 * nb
        if self.version == 2:
            self.bw_docs = buf[o:o + nb]; o += nb
            self.bw_freqs = buf[o:o + nb]; o += nb
            self.bw_pos = buf[o:o + nb]; o += nb
        else:
            self.bw_docs = self.bw_freqs = self.bw_pos = None
        self._docs_sec = buf[o:o + docs_len]; o += docs_len
        self._freqs_sec = buf[o:o + freqs_len]; o += freqs_len
        self._pos_len, self._pay_len = pos_len, pay_len
        self._hits_loader = hits_loader
        if buf.size >= o + pos_len + pay_len:       # full blob
            self._pos_sec = buf[o:o + pos_len]; o += pos_len
            self._pay_sec = buf[o:o + pay_len]
        elif buf.size == o:                          # index part only
            self._pos_sec = self._pay_sec = None
        else:
            raise ValueError("truncated postings blob")

    def _hits(self) -> None:
        """Fetch + slice the positions/payloads byte range on first use."""
        if self._pos_sec is not None:
            return
        if self._hits_loader is None:
            raise ValueError("index-only blob has no hits loader")
        hb = np.frombuffer(self._hits_loader(), dtype=np.uint8)
        if hb.size != self._pos_len + self._pay_len:
            raise ValueError("hits range size mismatch")
        self._pos_sec = hb[:self._pos_len]
        self._pay_sec = hb[self._pos_len:]

    @property
    def pos_sec(self) -> np.ndarray:
        self._hits()
        return self._pos_sec

    @property
    def pay_sec(self) -> np.ndarray:
        self._hits()
        return self._pay_sec

    # -- full-stream decode (vectorized) ------------------------------------
    def _counts64(self) -> np.ndarray:
        return self.counts.astype(np.int64)

    def _hits_per_block(self, freqs: np.ndarray) -> np.ndarray:
        cnt = self._counts64()
        ends = np.cumsum(cnt)
        hcum = np.concatenate(([0], np.cumsum(freqs.astype(np.int64))))
        return np.diff(np.concatenate(([0], hcum[ends])))

    def _decode_doc_section(self) -> np.ndarray:
        if self.version == 1:
            return varint_decode(self._docs_sec, self.doc_count)
        return _unpack_section(self._docs_sec, self.docs_off.astype(np.int64),
                               self.bw_docs, self._counts64())

    def _decode_freq_section(self) -> np.ndarray:
        if self.version == 1:
            return varint_decode(self._freqs_sec, self.doc_count)
        return _unpack_section(self._freqs_sec,
                               self.freqs_off.astype(np.int64),
                               self.bw_freqs, self._counts64())

    def decode_docs_freqs(self) -> tuple[np.ndarray, np.ndarray]:
        deltas = self._decode_doc_section()
        doc_ids = np.cumsum(deltas, dtype=np.uint64)
        freqs = self._decode_freq_section()
        return doc_ids, freqs

    def decode_positions(self, freqs: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
        """Return (positions, doc_hit_offsets).

        ``positions`` is the concatenated per-doc ascending position array;
        ``doc_hit_offsets`` (len doc_count+1) delimits each doc's slice.
        """
        if not self.has_positions:
            raise ValueError("positionless blob")
        if freqs is None:
            freqs = self._decode_freq_section()
        if self.version == 1:
            deltas = varint_decode(self.pos_sec, int(freqs.sum()))
        else:
            deltas = _unpack_section(self.pos_sec,
                                     self.pos_off.astype(np.int64),
                                     self.bw_pos,
                                     self._hits_per_block(freqs))
        offsets = np.zeros(self.doc_count + 1, dtype=np.int64)
        np.cumsum(freqs.astype(np.int64), out=offsets[1:])
        c = np.cumsum(deltas, dtype=np.uint64)
        starts = offsets[:-1]
        base = np.repeat(c[starts] - deltas[starts], np.diff(offsets))
        return (c - base), offsets

    def decode_payloads(self, freqs: np.ndarray | None = None
                        ) -> tuple[np.ndarray, np.ndarray]:
        """Return (payloads, doc_hit_offsets): one uint64 per hit, raw
        little-endian fixed width (the <=8-byte opaque app payload channel,
        codecs.h:194-195 / runtime.h:8-20)."""
        if not self.payload_width:
            raise ValueError("blob has no payloads")
        if freqs is None:
            freqs = self._decode_freq_section()
        w = self.payload_width
        n_hits = int(freqs.sum())
        if w == 8:
            vals = self.pay_sec.view("<u8").astype(np.uint64)
        else:
            full = np.zeros((n_hits, 8), dtype=np.uint8)
            full[:, :w] = np.asarray(self.pay_sec).reshape(n_hits, w)
            vals = full.reshape(-1).view("<u8").astype(np.uint64)
        offsets = np.zeros(self.doc_count + 1, dtype=np.int64)
        np.cumsum(freqs.astype(np.int64), out=offsets[1:])
        return vals, offsets

    # -- block access (skiplist path) ---------------------------------------
    def seek_block(self, target: int) -> int:
        """First block whose last docID >= target (advance seek)."""
        return int(np.searchsorted(self.last_docid, target, side="left"))

    def decode_block(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        if not (0 <= i < self.n_blocks):
            raise IndexError(i)
        d0 = int(self.docs_off[i])
        f0 = int(self.freqs_off[i])
        d1 = int(self.docs_off[i + 1]) if i + 1 < self.n_blocks else self._docs_sec.size
        f1 = int(self.freqs_off[i + 1]) if i + 1 < self.n_blocks else self._freqs_sec.size
        cnt = int(self.counts[i])
        if self.version == 1:
            deltas = varint_decode(self._docs_sec[d0:d1], cnt)
            freqs = varint_decode(self._freqs_sec[f0:f1], cnt)
        else:
            deltas = _unpack_bits(self._docs_sec[d0:d1],
                                  int(self.bw_docs[i]), cnt)
            freqs = _unpack_bits(self._freqs_sec[f0:f1],
                                 int(self.bw_freqs[i]), cnt)
        base = np.uint64(0) if i == 0 else self.last_docid[i - 1]
        doc_ids = np.cumsum(deltas, dtype=np.uint64)
        if i > 0:
            # first delta of a block is relative to the previous doc, which is
            # the previous block's last docID only for the block's first doc
            doc_ids += base
        return doc_ids, freqs

    def decode_block_positions(self, i: int, freqs: np.ndarray,
                               ) -> tuple[np.ndarray, np.ndarray]:
        """Positions of one block only (selective phrase verification).

        Block position slices decode independently because each doc's first
        position is stored absolute (see encode: pdelta[doc_start] = abs).
        Returns (pos_flat, doc_hit_offsets) for the block's docs; ``freqs``
        is the block's freq array from :meth:`decode_block`."""
        if not self.has_positions:
            raise ValueError("positionless blob")
        p0 = int(self.pos_off[i])
        p1 = int(self.pos_off[i + 1]) if i + 1 < self.n_blocks else self.pos_sec.size
        n_hits = int(freqs.sum())
        if self.version == 1:
            deltas = varint_decode(self.pos_sec[p0:p1], n_hits)
        else:
            deltas = _unpack_bits(self.pos_sec[p0:p1],
                                  int(self.bw_pos[i]), n_hits)
        offsets = np.zeros(freqs.size + 1, dtype=np.int64)
        np.cumsum(freqs.astype(np.int64), out=offsets[1:])
        c = np.cumsum(deltas, dtype=np.uint64)
        starts = offsets[:-1]
        base = np.repeat(c[starts] - deltas[starts], np.diff(offsets))
        return (c - base), offsets

    def decode_block_payloads(self, i: int, freqs: np.ndarray
                              ) -> tuple[np.ndarray, np.ndarray]:
        """Payloads of one block only; ``freqs`` is the block's freq array.
        Payload byte offsets derive from hit_base (fixed width, no
        directory needed)."""
        if not self.payload_width:
            raise ValueError("blob has no payloads")
        w = self.payload_width
        n_hits = int(freqs.sum())
        y0 = int(self.hit_base[i]) * w
        raw = self.pay_sec[y0:y0 + n_hits * w]
        if w == 8:
            vals = raw.view("<u8").astype(np.uint64)
        else:
            full = np.zeros((n_hits, 8), dtype=np.uint8)
            full[:, :w] = np.asarray(raw).reshape(n_hits, w)
            vals = full.reshape(-1).view("<u8").astype(np.uint64)
        offsets = np.zeros(freqs.size + 1, dtype=np.int64)
        np.cumsum(freqs.astype(np.int64), out=offsets[1:])
        return vals, offsets


# ---------------------------------------------------------------------------
# vectorized multi-blob decode (the merge fast path)
# ---------------------------------------------------------------------------

def decode_blobs(blobs: list[bytes], want_positions: bool = True):
    """Decode MANY blobs with a few global passes instead of one small
    numpy call-chain per blob — the segment-merge hot path: a merge block
    holds one row per (term, source segment), i.e. millions of TINY blobs
    whose per-blob decode overhead would dominate (measured 100+ s for a
    376-segment merge done blob-by-blob).

    Returns ``(doc_counts, doc_ids, freqs, pos, hit_counts, pay,
    pay_width)`` where array streams are concatenated in blob order;
    ``pos``/``pay`` are None when absent from every blob.  ``pay_width`` is
    0 unless EVERY blob carries payloads (mixed inputs drop the channel,
    matching the per-term merge semantics).

    Version-1 (varint) blobs decode fully vectorized; version-2 (packed)
    blobs fall back to per-blob decode into the same output streams.
    """
    n_b = len(blobs)
    if n_b == 0:
        e = np.empty(0, dtype=np.uint64)
        return (np.empty(0, np.int64), e, e, None,
                np.empty(0, np.int64), None, 0)
    lens = np.fromiter((len(b) for b in blobs), np.int64, n_b)
    cat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    off = np.concatenate(([0], np.cumsum(lens)))[:-1]
    ver = cat[off + 1]
    flags = cat[off + 2]
    pws = cat[off + 3].astype(np.int64)
    pws[(flags & 2) == 0] = 0

    def u32(field_off: int) -> np.ndarray:
        idx = (off[:, None] + (field_off + np.arange(4))).reshape(-1)
        return (cat[idx].reshape(n_b, 4).copy().view("<u4")
                .ravel().astype(np.int64))

    doc_count = u32(4)
    n_blocks = u32(8)
    docs_len = u32(12)
    freqs_len = u32(16)
    pos_len = u32(20)
    pay_len = u32(24)
    blob_hits = u32(28)
    dir_len = n_blocks * np.where(ver == 2, 31, 28)
    sec0 = off + _HEADER + dir_len            # docs section start
    has_pos = bool((flags & 1).all()) and want_positions
    pay_width = int(pws[0]) if (pws > 0).all() and np.unique(pws).size == 1 \
        else 0

    vstarts = np.concatenate(([0], np.cumsum(doc_count)))
    total_docs = int(vstarts[-1])
    out_deltas = np.empty(total_docs, dtype=np.uint64)
    out_freqs = np.empty(total_docs, dtype=np.uint64)

    v1 = np.flatnonzero(ver == 1)
    v2 = np.flatnonzero(ver == 2)
    if v1.size:
        d_stream = cat[_range_idx(sec0[v1], docs_len[v1])]
        deltas = varint_decode(d_stream, int(doc_count[v1].sum()))
        out_deltas[_range_idx(vstarts[v1], doc_count[v1])] = deltas
        f_stream = cat[_range_idx(sec0[v1] + docs_len[v1], freqs_len[v1])]
        fr = varint_decode(f_stream, int(doc_count[v1].sum()))
        out_freqs[_range_idx(vstarts[v1], doc_count[v1])] = fr
    for i in v2:
        pb = PostingsBlob(cat[off[i]:off[i] + lens[i]].tobytes())
        d, f = pb.decode_docs_freqs()
        # store deltas-with-blob-reset so the global cumsum-reset pass below
        # reconstructs identically for both versions
        dd = np.empty_like(d)
        dd[0] = d[0]
        np.subtract(d[1:], d[:-1], out=dd[1:])
        out_deltas[vstarts[i]:vstarts[i + 1]] = dd
        out_freqs[vstarts[i]:vstarts[i + 1]] = f

    # absolute docIDs: cumsum with reset at each blob start
    c = np.cumsum(out_deltas, dtype=np.uint64)
    starts = vstarts[:-1]
    base = np.repeat(c[starts] - out_deltas[starts], doc_count)
    doc_ids = c - base

    hit_cum_docs = np.concatenate(
        ([0], np.cumsum(out_freqs.astype(np.int64))))
    hit_counts = np.diff(hit_cum_docs[vstarts])  # hits per blob
    hstarts = np.concatenate(([0], np.cumsum(hit_counts)))
    total_hits = int(hstarts[-1])

    pos = None
    if has_pos:
        out_pd = np.empty(total_hits, dtype=np.uint64)
        if v1.size:
            p_stream = cat[_range_idx(
                sec0[v1] + docs_len[v1] + freqs_len[v1], pos_len[v1])]
            pd = varint_decode(p_stream, int(hit_counts[v1].sum()))
            out_pd[_range_idx(hstarts[v1], hit_counts[v1])] = pd
        for i in v2:
            pb = PostingsBlob(cat[off[i]:off[i] + lens[i]].tobytes())
            f = out_freqs[vstarts[i]:vstarts[i + 1]]
            p, _ = pb.decode_positions(f)
            # re-delta with per-doc absolute firsts (the stored form)
            pdl = np.empty_like(p)
            if p.size:
                pdl[0] = p[0]
                np.subtract(p[1:], p[:-1], out=pdl[1:])
                doc_hit_starts = np.concatenate(
                    ([0], np.cumsum(f.astype(np.int64))))[:-1]
                pdl[doc_hit_starts] = p[doc_hit_starts]
            out_pd[hstarts[i]:hstarts[i + 1]] = pdl
        # per-doc reconstruction: first position absolute per doc
        cpd = np.cumsum(out_pd, dtype=np.uint64)
        dstarts = hit_cum_docs[:-1]
        pbase = np.repeat(cpd[dstarts] - out_pd[dstarts],
                          np.diff(hit_cum_docs))
        pos = cpd - pbase

    pay = None
    if pay_width:
        pay_start = sec0 + docs_len + freqs_len + pos_len
        raw = cat[_range_idx(pay_start, pay_len)]
        if pay_width == 8:
            pay = raw.copy().view("<u8").astype(np.uint64)
        else:
            full = np.zeros((total_hits, 8), dtype=np.uint8)
            full[:, :pay_width] = raw.reshape(total_hits, pay_width)
            pay = full.reshape(-1).view("<u8").astype(np.uint64)

    return (doc_count, doc_ids, out_freqs, pos, hit_counts, pay, pay_width)


# ---------------------------------------------------------------------------
# byte-level blob concatenation (the merge append fast path)
# ---------------------------------------------------------------------------

def _reset_cumsum(vals: np.ndarray, group_offsets: np.ndarray) -> np.ndarray:
    """Exclusive cumsum of ``vals`` restarting at each group boundary."""
    c = np.concatenate(([0], np.cumsum(vals)))[:-1]
    base = np.repeat(c[group_offsets[:-1]], np.diff(group_offsets))
    return c - base


def concat_encoded_many(cat: np.ndarray, off: np.ndarray, lens: np.ndarray,
                        term_rows: np.ndarray, want_version: int | None = None):
    """Merge MANY terms' source blobs by BYTE CONCATENATION — the
    reference's append_index_chunk fast path (merge.cpp:166-180): no
    posting is decoded; the only rewrite is each non-first blob's first doc
    delta (stored absolute per blob), re-encoded relative to the previous
    blob's last docID.  Everything else — freqs/positions/payload sections,
    block directories — is copied and offset-rebased in global vectorized
    passes.

    Works for BOTH codecs.  v1 (varint): the first delta is re-varinted,
    shifting in-blob byte offsets by the length difference.  v2 (bit-packed
    FOR): the rebased delta is strictly smaller than the stored absolute
    first docID, which is itself <= its block's max — so it always fits the
    block's existing bit width and is OVERWRITTEN IN PLACE (bits [0, w) of
    the blob's docs section); no lengths change at all.

    ``cat``: all source blobs as one uint8 array; ``off``/``lens``: per-row
    byte ranges in term-major, doc-ascending order; ``term_rows``: int64
    (T+1) row offsets per term.  ``want_version``: when given, require the
    sources to already be this codec (an explicit cross-codec rewrite must
    take the decode path).

    Returns ``(blobs, df, max_tf, sum_hits)`` (one entry per term) or None
    when ineligible: mixed codec versions, wrong codec vs ``want_version``,
    mixed flags/payload widths, or non-ascending doc ranges (overlapping
    generations must take the decode path).  Masked sources must be
    excluded by the CALLER.
    """
    R = off.size
    if R == 0:
        return ([], np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64))
    off = off.astype(np.int64)
    ver = cat[off + 1]
    out_ver = int(ver[0])
    if not (ver == out_ver).all() or out_ver not in (1, 2):
        return None
    if want_version is not None and out_ver != want_version:
        return None
    flags = cat[off + 2]
    pws = cat[off + 3]
    if np.unique(flags).size != 1 or np.unique(pws).size != 1:
        return None

    def u32f(fo: int) -> np.ndarray:
        idx = (off[:, None] + (fo + np.arange(4))).reshape(-1)
        return cat[idx].reshape(R, 4).copy().view("<u4").ravel().astype(np.int64)

    dc = u32f(4)
    nb = u32f(8)
    dl = u32f(12)
    fl = u32f(16)
    pl = u32f(20)
    yl = u32f(24)
    nh = u32f(28)
    dir0 = off + _HEADER
    # docs section start: v1 directory is 28*nb bytes; v2 appends the
    # 3*nb width bytes (bw_docs | bw_freqs | bw_pos)
    sec0 = dir0 + (28 if out_ver == 1 else 31) * nb

    if out_ver == 1:
        # ---- first doc delta per row (absolute): vectorized varint read ----
        val = (cat[sec0] & 0x7F).astype(np.uint64)
        ln1 = np.ones(R, dtype=np.int64)
        cont = cat[sec0] >= 128
        k = 1
        while cont.any() and k < 10:
            m = np.flatnonzero(cont)
            b = cat[sec0[m] + k]
            val[m] |= (b.astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * k)
            ln1[m] += 1
            cont[m] = b >= 128
            k += 1
    else:
        # ---- first doc delta per row: lowest bw_docs[0] bits of the docs
        # section (block-0 values start at bit 0) ----
        w0 = cat[dir0 + 28 * nb].astype(np.int64)   # first bw_docs byte
        idx8 = np.minimum(sec0[:, None] + np.arange(8),
                          cat.size - 1).reshape(-1)
        raw8 = cat[idx8].reshape(R, 8).copy().view("<u8").ravel()
        w0mask = np.full(R, np.uint64(0xFFFFFFFFFFFFFFFF))
        sub = np.flatnonzero(w0 < 64)
        w0mask[sub] = (np.uint64(1) << w0[sub].astype(np.uint64)) \
            - np.uint64(1)
        val = raw8 & w0mask
        ln1 = np.zeros(R, dtype=np.int64)            # nothing varint-sized

    # previous row's last docID (u64 at the end of its last_docid array)
    is_first = np.zeros(R, dtype=bool)
    is_first[term_rows[:-1]] = True
    pl_pos = dir0 + 8 * nb - 8       # last last_docid entry per row
    prev_idx = (pl_pos[:-1][:, None] + np.arange(8)).reshape(-1)
    prev_last_all = cat[prev_idx].reshape(R - 1, 4 * 2).copy().view(
        "<u8").ravel() if R > 1 else np.empty(0, np.uint64)
    nonfirst = np.flatnonzero(~is_first)
    prev_last = prev_last_all[nonfirst - 1]
    first_doc_nf = val[nonfirst]
    if nonfirst.size and not (first_doc_nf > prev_last).all():
        return None  # overlapping ranges: decode path required
    new_delta = first_doc_nf - prev_last
    if out_ver == 1:
        ndc = _compact(new_delta)
        nb_new = _byte_lengths(ndc) if new_delta.size else np.empty(0, np.int64)
        vb = np.frombuffer(varint_encode(ndc, nb_new), dtype=np.uint8) \
            if new_delta.size else np.empty(0, np.uint8)
        vb_off = np.concatenate(([0], np.cumsum(nb_new, dtype=np.int64)))[:-1] \
            if new_delta.size else np.empty(0, np.int64)
        head_len = ln1.copy()
        head_len[nonfirst] = nb_new
    else:
        head_len = ln1                # in-place overwrite: no length change
    out_dl = dl - ln1 + head_len
    shift = head_len - ln1           # applies to in-blob offsets > block 0

    # u32-overflow check BEFORE any stream allocation: a merged mega-term
    # whose doc count / section bytes / hits exceed the u32 header and
    # directory fields must take the decode path (which raises loudly on a
    # true overflow) — and must not first assemble multi-GB streams here
    T = term_rows.size - 1
    t_dc = np.add.reduceat(dc, term_rows[:-1])
    t_nb = np.add.reduceat(nb, term_rows[:-1])
    t_dl = np.add.reduceat(out_dl, term_rows[:-1])
    t_fl = np.add.reduceat(fl, term_rows[:-1])
    t_pl = np.add.reduceat(pl, term_rows[:-1])
    t_yl = np.add.reduceat(yl, term_rows[:-1])
    t_nh = np.add.reduceat(nh, term_rows[:-1])
    u32max = (1 << 32) - 1
    if max(int(t_dc.max()), int(t_nb.max()), int(t_dl.max()),
           int(t_fl.max()), int(t_pl.max()), int(t_yl.max()),
           int(t_nh.max())) > u32max:
        return None

    # ---- global output streams (row order == term-major output order) ----
    out_row_off = np.concatenate(([0], np.cumsum(out_dl)))[:-1]
    if out_ver == 1:
        docs_stream = np.empty(int((out_dl).sum()), dtype=np.uint8)
        fi = np.flatnonzero(is_first)
        docs_stream[_range_idx(out_row_off[fi], ln1[fi])] = \
            cat[_range_idx(sec0[fi], ln1[fi])]
        if nonfirst.size:
            docs_stream[_range_idx(out_row_off[nonfirst], nb_new)] = \
                vb[_range_idx(vb_off, nb_new)]
        docs_stream[_range_idx(out_row_off + head_len, dl - ln1)] = \
            cat[_range_idx(sec0 + ln1, dl - ln1)]
    else:
        # one straight copy, then overwrite bits [0, w0) of each non-first
        # blob's docs section with the rebased delta (fits by construction:
        # new_delta <= stored first delta <= block-0 max)
        docs_stream = cat[_range_idx(sec0, dl)].copy()
        if nonfirst.size:
            old = raw8[nonfirst]
            neww = (old & ~w0mask[nonfirst]) | new_delta
            kb = (w0[nonfirst] + 7) // 8      # bytes to write back (<= 8)
            for j in range(8):
                sel = np.flatnonzero(kb > j)
                if not sel.size:
                    break
                docs_stream[out_row_off[nonfirst[sel]] + j] = (
                    (neww[sel] >> np.uint64(8 * j))
                    & np.uint64(0xFF)).astype(np.uint8)
    freqs_stream = cat[_range_idx(sec0 + dl, fl)]
    pos_stream = cat[_range_idx(sec0 + dl + fl, pl)]
    pay_stream = cat[_range_idx(sec0 + dl + fl + pl, yl)]
    last_stream = cat[_range_idx(dir0, 8 * nb)]
    counts_stream = cat[_range_idx(dir0 + 24 * nb, 2 * nb)]
    maxtf_stream = cat[_range_idx(dir0 + 26 * nb, 2 * nb)]

    # ---- block directory rebasing (global, vectorized) ----
    def u32_blocks(start: np.ndarray) -> np.ndarray:
        return cat[_range_idx(start, 4 * nb)].copy().view("<u4").astype(np.int64)

    d_off_b = u32_blocks(dir0 + 8 * nb)
    f_off_b = u32_blocks(dir0 + 12 * nb)
    p_off_b = u32_blocks(dir0 + 16 * nb)
    hb_b = u32_blocks(dir0 + 20 * nb)
    block_row = np.repeat(np.arange(R), nb)
    row_block_off = np.concatenate(([0], np.cumsum(nb)))
    block_j = np.arange(block_row.size) - row_block_off[:-1][block_row]
    d_base = _reset_cumsum(out_dl, term_rows)
    f_base = _reset_cumsum(fl, term_rows)
    p_base = _reset_cumsum(pl, term_rows)
    h_base = _reset_cumsum(nh, term_rows)
    d_off_b += d_base[block_row] + np.where(block_j > 0, shift[block_row], 0)
    f_off_b += f_base[block_row]
    p_off_b += p_base[block_row]
    hb_b += h_base[block_row]

    # ---- per-term headers + dictionary stats ----
    # (directory offsets are bounded by the per-term section byte totals
    # already checked above)
    mtf_all = maxtf_stream.copy().view("<u2").astype(np.int64)
    # per-term max over block max_tf: reduceat over block space
    t_first_block = row_block_off[term_rows[:-1]]
    t_mtf = np.maximum.reduceat(mtf_all, t_first_block)
    headers = np.zeros((T, _HEADER), dtype=np.uint8)
    headers[:, 0] = _MAGIC
    headers[:, 1] = out_ver
    headers[:, 2] = flags[0]
    headers[:, 3] = pws[0]
    headers[:, 4:8] = t_dc.astype("<u4")[:, None].view(np.uint8)
    headers[:, 8:12] = t_nb.astype("<u4")[:, None].view(np.uint8)
    headers[:, 12:16] = t_dl.astype("<u4")[:, None].view(np.uint8)
    headers[:, 16:20] = t_fl.astype("<u4")[:, None].view(np.uint8)
    headers[:, 20:24] = t_pl.astype("<u4")[:, None].view(np.uint8)
    headers[:, 24:28] = t_yl.astype("<u4")[:, None].view(np.uint8)
    headers[:, 28:32] = t_nh.astype("<u4")[:, None].view(np.uint8)

    # per-term slice boundaries of each stream
    bnd = lambda v: np.concatenate(([0], np.cumsum(v)))
    c_blk = bnd(t_nb)
    c_dl, c_fl, c_pl, c_yl = bnd(t_dl), bnd(t_fl), bnd(t_pl), bnd(t_yl)
    last_u8 = last_stream.tobytes()
    d_off_u8 = d_off_b.astype("<u4").tobytes()
    f_off_u8 = f_off_b.astype("<u4").tobytes()
    p_off_u8 = p_off_b.astype("<u4").tobytes()
    hb_u8 = hb_b.astype("<u4").tobytes()
    counts_u8 = counts_stream.tobytes()
    maxtf_u8 = maxtf_stream.tobytes()
    if out_ver == 2:
        # per-block width bytes, one stream per section (the merged blob's
        # widths directory is section-major: all bw_docs, then bw_freqs,
        # then bw_pos)
        wd_u8 = cat[_range_idx(dir0 + 28 * nb, nb)].tobytes()
        wf_u8 = cat[_range_idx(dir0 + 29 * nb, nb)].tobytes()
        wp_u8 = cat[_range_idx(dir0 + 30 * nb, nb)].tobytes()
    docs_u8 = docs_stream.tobytes()
    freqs_u8 = freqs_stream.tobytes()
    pos_u8 = pos_stream.tobytes()
    pay_u8 = pay_stream.tobytes()
    blobs = []
    for t in range(T):
        b0, b1 = int(c_blk[t]), int(c_blk[t + 1])
        widths_dir = (wd_u8[b0:b1] + wf_u8[b0:b1] + wp_u8[b0:b1]
                      if out_ver == 2 else b"")
        blobs.append(
            headers[t].tobytes()
            + last_u8[8 * b0:8 * b1]
            + d_off_u8[4 * b0:4 * b1]
            + f_off_u8[4 * b0:4 * b1]
            + p_off_u8[4 * b0:4 * b1]
            + hb_u8[4 * b0:4 * b1]
            + counts_u8[2 * b0:2 * b1]
            + maxtf_u8[2 * b0:2 * b1]
            + widths_dir
            + docs_u8[c_dl[t]:c_dl[t + 1]]
            + freqs_u8[c_fl[t]:c_fl[t + 1]]
            + pos_u8[c_pl[t]:c_pl[t + 1]]
            + pay_u8[c_yl[t]:c_yl[t + 1]]
        )
    return blobs, t_dc, np.minimum(t_mtf, 0xFFFFFFFF), t_nh
