"""Blocked, delta+varint compressed posting lists with a skiplist directory.

Re-expresses the reference's posting-list codecs (Google-style codec:
/root/reference/google_codec.cpp:19-176 — N-doc blocks, varint doc deltas,
skiplist of (last_docid, offset); Lucene-style: /root/reference/
lucene_codec.cpp:163-388 — 128-doc blocks, separate hits stream, rich
skiplist entries) as numpy-vectorized kernels over one self-contained blob
per (segment, term).

Blob layout (little-endian), one per term::

    header:
      u8  magic (0x54), u8 version (1), u8 flags (bit0 = has positions), u8 pad
      u32 doc_count
      u32 n_blocks
      u32 docs_len, u32 freqs_len, u32 pos_len        # varint section byte sizes
    block directory ("skiplist", fixed-width => vectorized seek):
      u64[n_blocks] last_docid      # last docID in block  (advance = searchsorted)
      u32[n_blocks] docs_off        # byte offset of block start in docs section
      u32[n_blocks] freqs_off       #   "            "        freqs section
      u32[n_blocks] pos_off         #   "            "        positions section
      u32[n_blocks] hit_base        # cumulative hit count before block
      u16[n_blocks] counts          # docs in block (<= BLOCK)
      u16[n_blocks] max_tf          # block-max term frequency (block-max WAND)
    payload:
      docs varints   # doc-ID deltas over the whole stream (delta[0] absolute)
      freqs varints  # tf per doc
      pos varints    # per doc: first position absolute, then deltas

The directory plays the role of the reference's skiplists (every-N-docs
entries, google_codec.cpp:146-158 / lucene_codec.cpp:368-381): `advance(target)`
is a `searchsorted` on ``last_docid`` followed by decoding one block; `max_tf`
is the block-max needed for WAND pruning (BM25 per-term score is monotone in
tf, see similarity.h:228-235).

Encoders require strictly ascending doc IDs, mirroring the reference's hard
abort on broken ordering (google_codec.cpp:27-30).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128  # docs per block (reference Lucene codec BLOCK_SIZE, lucene_codec.h:49)
_MAGIC = 0x54
_VERSION = 1
_HEADER = 4 + 4 + 4 + 12  # magic..pad + doc_count + n_blocks + 3 section lens


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
    offsets = np.concatenate(([0], np.cumsum(nbits)))
    out = np.zeros(offsets[-1], dtype=np.uint8)
    maxlen = int(nbits.max())
    for k in range(maxlen):
        m = nbits > k
        byte = ((v[m] >> v.dtype.type(7 * k)) & mask7f).astype(np.uint8)
        cont = (nbits[m] > k + 1).astype(np.uint8) << 7
        out[offsets[:-1][m] + k] = byte | cont
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

def encode_postings(
    doc_ids: np.ndarray,
    freqs: np.ndarray,
    positions: np.ndarray | None = None,
) -> bytes:
    """Encode one term's postings.

    ``doc_ids``: strictly ascending uint64; ``freqs``: uint32 tf per doc;
    ``positions``: concatenated per-doc ascending positions (len == freqs.sum())
    or None for a positionless index.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    freqs = np.ascontiguousarray(freqs, dtype=np.uint64)
    n = doc_ids.size
    if n == 0:
        raise ValueError("empty postings")
    if n > 1 and not (np.diff(doc_ids.astype(np.int64)) > 0).all():
        raise ValueError("doc_ids must be strictly ascending")  # google_codec.cpp:27-30

    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    docs_bytes = varint_encode(deltas)
    freqs_bytes = varint_encode(freqs)

    has_pos = positions is not None
    if has_pos:
        positions = np.ascontiguousarray(positions, dtype=np.uint64)
        if positions.size != int(freqs.sum()):
            raise ValueError("positions length must equal freqs.sum()")
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(freqs[:-1].astype(np.int64), out=starts[1:]) if n > 1 else None
        pdelta = np.empty_like(positions)
        pdelta[0] = positions[0]
        np.subtract(positions[1:], positions[:-1], out=pdelta[1:])
        pdelta[starts] = positions[starts]  # first pos of each doc absolute
        pos_bytes = varint_encode(pdelta)
    else:
        pos_bytes = b""

    # block directory
    n_blocks = (n + BLOCK - 1) // BLOCK
    bstarts = np.arange(n_blocks, dtype=np.int64) * BLOCK
    bends = np.minimum(bstarts + BLOCK, n)
    last_docid = doc_ids[bends - 1]
    counts = (bends - bstarts).astype(np.uint16)
    # byte offsets: need per-value byte length prefix sums at block starts
    docs_off = _section_offsets(deltas, bstarts)
    freqs_off = _section_offsets(freqs, bstarts)
    hit_base = np.zeros(n_blocks, dtype=np.uint32)
    if n_blocks > 1:
        hit_cum = np.cumsum(freqs.astype(np.int64))
        hit_base[1:] = hit_cum[bstarts[1:] - 1].astype(np.uint32)
    if has_pos:
        pos_off = _section_offsets(pdelta, np.minimum(hit_base.astype(np.int64), pdelta.size))
    else:
        pos_off = np.zeros(n_blocks, dtype=np.uint32)
    max_tf = np.minimum(
        np.maximum.reduceat(freqs, bstarts), 0xFFFF
    ).astype(np.uint16)

    header = np.zeros(_HEADER, dtype=np.uint8)
    header[0] = _MAGIC
    header[1] = _VERSION
    header[2] = 1 if has_pos else 0
    header[4:8] = np.frombuffer(np.uint32(n).tobytes(), dtype=np.uint8)
    header[8:12] = np.frombuffer(np.uint32(n_blocks).tobytes(), dtype=np.uint8)
    header[12:24] = np.frombuffer(
        np.array([len(docs_bytes), len(freqs_bytes), len(pos_bytes)], dtype=np.uint32).tobytes(),
        dtype=np.uint8,
    )
    parts = [
        header.tobytes(),
        last_docid.astype("<u8").tobytes(),
        docs_off.astype("<u4").tobytes(),
        freqs_off.astype("<u4").tobytes(),
        pos_off.astype("<u4").tobytes(),
        hit_base.astype("<u4").tobytes(),
        counts.astype("<u2").tobytes(),
        max_tf.astype("<u2").tobytes(),
        docs_bytes,
        freqs_bytes,
        pos_bytes,
    ]
    return b"".join(parts)


def _section_offsets(values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Byte offset of each block start within one varint section."""
    cum = np.concatenate(([0], np.cumsum(_byte_lengths(values))))
    return cum[starts].astype(np.uint32)


def _byte_lengths(values: np.ndarray) -> np.ndarray:
    """LEB128 byte length per value (vectorized, dtype-preserving)."""
    v = values if values.dtype.kind == "u" else values.astype(np.uint64)
    nbytes = np.ones(v.shape, dtype=np.int64)
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
) -> list[bytes]:
    """Encode MANY terms' postings in a few global vectorized passes.

    ``term_offsets`` (int64, len T+1) delimits each term's slice of
    ``doc_ids``/``freqs`` (term-major, doc-ascending within term);
    ``positions`` is the full concatenated hit stream (len == freqs.sum())
    in the same order.  Returns one self-contained blob per term, identical
    to :func:`encode_postings` output.

    This is the index-build hot path: the reference's profile shows encode
    dominating segment commit (indexer.cpp:303-306, 11.8s of ~17s), so all
    varint work here is global numpy; only final blob assembly loops per term.
    """
    term_offsets = np.ascontiguousarray(term_offsets, dtype=np.int64)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    freqs = np.ascontiguousarray(freqs, dtype=np.uint64)
    T = term_offsets.size - 1
    n = doc_ids.size
    if n == 0 or T == 0:
        return []
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

    deltas_c = _compact(deltas)
    nb_d = _byte_lengths(deltas_c)
    docs_all = np.frombuffer(varint_encode(deltas_c, nb_d), dtype=np.uint8)
    docs_cum = np.concatenate(([0], np.cumsum(nb_d)))
    freqs_c = _compact(freqs)
    nb_f = _byte_lengths(freqs_c)
    freqs_all = np.frombuffer(varint_encode(freqs_c, nb_f), dtype=np.uint8)
    freqs_cum = np.concatenate(([0], np.cumsum(nb_f)))

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
        pdelta_c = _compact(pdelta)
        nb_p = _byte_lengths(pdelta_c)
        pos_all = np.frombuffer(varint_encode(pdelta_c, nb_p), dtype=np.uint8)
        pos_cum = np.concatenate(([0], np.cumsum(nb_p)))
    else:
        pos_all = np.empty(0, dtype=np.uint8)
        pos_cum = np.zeros(1, dtype=np.int64)

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
    g_docs_off = (docs_cum[bstart] - docs_cum[tstarts[block_term]]).astype(np.uint32)
    g_freqs_off = (freqs_cum[bstart] - freqs_cum[tstarts[block_term]]).astype(np.uint32)
    g_hit_base = (hit_cum[bstart] - hit_cum[tstarts[block_term]]).astype(np.uint32)
    if has_pos:
        g_pos_off = (pos_cum[hit_cum[bstart]] - pos_cum[hit_cum[tstarts[block_term]]]).astype(np.uint32)
    else:
        g_pos_off = np.zeros(total_blocks, dtype=np.uint32)

    # per-term byte ranges in the three sections
    t_docs = docs_cum[term_offsets]
    t_freqs = freqs_cum[term_offsets]
    t_pos = pos_cum[hit_cum[term_offsets]] if has_pos else np.zeros(T + 1, dtype=np.int64)

    last_b = g_last_docid.astype("<u8")
    docs_off_b = g_docs_off.astype("<u4")
    freqs_off_b = g_freqs_off.astype("<u4")
    pos_off_b = g_pos_off.astype("<u4")
    hit_base_b = g_hit_base.astype("<u4")
    counts_b = g_counts.astype("<u2")
    max_tf_b = g_max_tf.astype("<u2")

    flags = 1 if has_pos else 0
    blobs: list[bytes] = []
    for t in range(T):
        b0, b1 = first_block_of_term[t], first_block_of_term[t + 1]
        d0, d1 = t_docs[t], t_docs[t + 1]
        f0, f1 = t_freqs[t], t_freqs[t + 1]
        p0, p1 = t_pos[t], t_pos[t + 1]
        header = (
            bytes((_MAGIC, _VERSION, flags, 0))
            + np.array([n_t[t], b1 - b0, d1 - d0, f1 - f0, p1 - p0], dtype="<u4").tobytes()
        )
        blobs.append(
            header
            + last_b[b0:b1].tobytes()
            + docs_off_b[b0:b1].tobytes()
            + freqs_off_b[b0:b1].tobytes()
            + pos_off_b[b0:b1].tobytes()
            + hit_base_b[b0:b1].tobytes()
            + counts_b[b0:b1].tobytes()
            + max_tf_b[b0:b1].tobytes()
            + docs_all[d0:d1].tobytes()
            + freqs_all[f0:f1].tobytes()
            + pos_all[p0:p1].tobytes()
        )
    return blobs


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

class PostingsBlob:
    """Zero-ish-copy view over one encoded term blob.

    Exposes full-stream vectorized decode (the hot path for query execution)
    and block-level access (the skiplist path: ``advance``/WAND).
    """

    __slots__ = (
        "buf", "doc_count", "n_blocks", "has_positions",
        "last_docid", "docs_off", "freqs_off", "pos_off", "hit_base",
        "counts", "max_tf", "_docs_sec", "_freqs_sec", "_pos_sec",
    )

    def __init__(self, blob: bytes | memoryview):
        buf = np.frombuffer(blob, dtype=np.uint8)
        if buf[0] != _MAGIC or buf[1] != _VERSION:
            raise ValueError("bad postings blob header")
        self.buf = buf
        self.has_positions = bool(buf[2] & 1)
        self.doc_count = int(buf[4:8].view("<u4")[0])
        self.n_blocks = int(buf[8:12].view("<u4")[0])
        docs_len, freqs_len, pos_len = (int(x) for x in buf[12:24].view("<u4"))
        nb = self.n_blocks
        o = _HEADER
        self.last_docid = buf[o:o + 8 * nb].view("<u8"); o += 8 * nb
        self.docs_off = buf[o:o + 4 * nb].view("<u4"); o += 4 * nb
        self.freqs_off = buf[o:o + 4 * nb].view("<u4"); o += 4 * nb
        self.pos_off = buf[o:o + 4 * nb].view("<u4"); o += 4 * nb
        self.hit_base = buf[o:o + 4 * nb].view("<u4"); o += 4 * nb
        self.counts = buf[o:o + 2 * nb].view("<u2"); o += 2 * nb
        self.max_tf = buf[o:o + 2 * nb].view("<u2"); o += 2 * nb
        self._docs_sec = buf[o:o + docs_len]; o += docs_len
        self._freqs_sec = buf[o:o + freqs_len]; o += freqs_len
        self._pos_sec = buf[o:o + pos_len]

    # -- full-stream decode (vectorized) ------------------------------------
    def decode_docs_freqs(self) -> tuple[np.ndarray, np.ndarray]:
        deltas = varint_decode(self._docs_sec, self.doc_count)
        doc_ids = np.cumsum(deltas, dtype=np.uint64)
        freqs = varint_decode(self._freqs_sec, self.doc_count)
        return doc_ids, freqs

    def decode_positions(self, freqs: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
        """Return (positions, doc_hit_offsets).

        ``positions`` is the concatenated per-doc ascending position array;
        ``doc_hit_offsets`` (len doc_count+1) delimits each doc's slice.
        """
        if not self.has_positions:
            raise ValueError("positionless blob")
        if freqs is None:
            freqs = varint_decode(self._freqs_sec, self.doc_count)
        deltas = varint_decode(self._pos_sec, int(freqs.sum()))
        offsets = np.zeros(self.doc_count + 1, dtype=np.int64)
        np.cumsum(freqs.astype(np.int64), out=offsets[1:])
        c = np.cumsum(deltas, dtype=np.uint64)
        starts = offsets[:-1]
        base = np.repeat(c[starts] - deltas[starts], np.diff(offsets))
        return (c - base), offsets

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
        deltas = varint_decode(self._docs_sec[d0:d1], cnt)
        base = np.uint64(0) if i == 0 else self.last_docid[i - 1]
        doc_ids = np.cumsum(deltas, dtype=np.uint64)
        if i > 0:
            # first delta of a block is relative to the previous doc, which is
            # the previous block's last docID only for the block's first doc
            doc_ids += base
        freqs = varint_decode(self._freqs_sec[f0:f1], cnt)
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
        p1 = int(self.pos_off[i + 1]) if i + 1 < self.n_blocks else self._pos_sec.size
        n_hits = int(freqs.sum())
        deltas = varint_decode(self._pos_sec[p0:p1], n_hits)
        offsets = np.zeros(freqs.size + 1, dtype=np.int64)
        np.cumsum(freqs.astype(np.int64), out=offsets[1:])
        c = np.cumsum(deltas, dtype=np.uint64)
        starts = offsets[:-1]
        base = np.repeat(c[starts] - deltas[starts], np.diff(offsets))
        return (c - base), offsets
