"""Tokenizers for the Ray-Data Trinity engine.

Two tokenizers, both usable on the document side and the query side (the
reference requires parser parity between the two sides — see
/root/reference/queries.h:246-247 and common.h:59-72):

* :func:`trinity_tokenize` — behavioral re-implementation of the reference's
  ``default_token_parser_impl`` (/root/reference/queries.cpp:2098-2341) as a
  single compiled master regex + per-match normalization, instead of the
  reference's char-by-char scanner.  Handles the documented special cases:

  - acronyms with punctuation: ``I.B.M`` -> ``IBM``, ``U.S.A.`` -> ``USA``,
    ``M.P.ACT`` -> ``MPACT``
  - ``word:domain`` tokens: ``site:x-box.com``, ``site:.gr`` kept whole
  - single-letter contractions: ``L'Oreal`` -> ``LOREAL``
  - numeric forms (locale-ish): ``9.000`` -> ``9000`` (thousands separator,
    fractional part all zeros and >= 3 digits), ``1.0`` -> ``1``,
    ``8.25`` -> ``8.25``, ``8,25`` -> ``8.25``
    (note: the reference *comment* says ``9.000 => 9`` but the code appends
    the all-zero fractional when it is >= 3 digits — we follow the code)
  - genitive apostrophes: ``John's`` -> ``JOHNS``
  - single-letter ampersand pairs: ``d&d``, ``x&y`` kept whole
  - trailing ``+``/``#`` after a letter: ``C++``, ``C#`` kept
  - hyphens are separators: ``x-men`` -> ``X``, ``MEN`` (the reference's
    current choice, queries.cpp:2310-2317)

  Our one deliberate normalization on top: all terms are upper-cased
  (case-insensitive search; the reference leaves case policy to the
  application, and upper-case matches its ``JOHNS``/``IBM`` examples).

* :func:`simple_tokenize` — ``[A-Z0-9]+`` runs of ``upper(text)``.  This is
  the tokenizer used for the oracle-SQL-checked query entries, because it is
  expressible in DuckDB as ``regexp_extract_all(upper(text), '[A-Z0-9]+')``.

Terms longer than MAX_TERM_LEN (= 64, /root/reference/trinity_limits.h:14)
are dropped.  Token positions are 1-based and capped at MAX_POSITION
(= 2**14, /root/reference/trinity_limits.h:15); hits beyond the cap are not
indexed.
"""

from __future__ import annotations

import re
from typing import Callable

MAX_TERM_LEN = 64
MAX_POSITION = 1 << 14  # positions must be < this (reference: pos < (1<<14))

_APOS = "'’"

TOKEN_RE = re.compile(
    # 1. acronym: a.X.a(lpha)+ groups, optional further .alpha groups, optional
    #    trailing dot  (reference queries.cpp:2120-2149)
    rf"(?P<acro>[A-Za-z]\.[A-Za-z0-9]\.[A-Za-z]+(?:\.[A-Za-z]+)*\.?)"
    # 2. word:domain (reference queries.cpp:2152-2166)
    rf"|(?P<site>[A-Za-z]+:(?:[A-Za-z0-9]|[.\-](?=[A-Za-z0-9]))+)"
    # 3. single-letter contraction L'Oreal (reference queries.cpp:2167-2185)
    rf"|(?P<contr>(?<![A-Za-z0-9])[A-Za-z][{_APOS}][A-Za-z][A-Za-z0-9]*)"
    # 4. number with one ./, separator (reference queries.cpp:2187-2256)
    rf"|(?P<num>[0-9]+[.,][0-9]+)"
    # 5. single-letter & pair: d&d (reference queries.cpp:2297-2309)
    rf"|(?P<amp>(?<![A-Za-z0-9])[A-Za-z]&[A-Za-z](?![A-Za-z0-9]))"
    # 6. general word run, optional genitive 's, optional +/# suffixes
    #    (reference queries.cpp:2258-2296, 2318-2325)
    rf"|(?P<word>[A-Za-z0-9]+(?:[{_APOS}][Ss](?![A-Za-z0-9']))?"
    rf"(?:(?<=[A-Za-z])[+#]\+*[A-Za-z0-9]*)*)"
)

_WORD_APOS_RE = re.compile(rf"[{_APOS}]([Ss])(?![A-Za-z0-9])")
_SIMPLE_RE = re.compile(r"[A-Za-z0-9]+")
# public alias: the one word pattern shared by every oracle-parity op
# (ops.text, ops.dedup, ops.decontam) — change tokenization HERE, not in
# per-module copies
WORD_RE = _SIMPLE_RE

# capture-free twin of TOKEN_RE: findall returns full-match STRINGS (no
# Match objects) — the hot-path tokenizer classifies each token by cheap
# character checks instead of named-group dispatch (the alternatives'
# character inventories are disjoint: ':' only in site, '&' only in amp,
# './,' only in acro/num, apostrophes only in contr/genitive)
_TOKEN_RE_NC = re.compile(re.sub(r"\(\?P<[a-z]+>", "(?:", TOKEN_RE.pattern))


def _norm_num(tok: str) -> str:
    """Reference numeric normalization (queries.cpp:2187-2256)."""
    intpart, frac = re.split(r"[.,]", tok, maxsplit=1)
    if frac.strip("0") == "":
        # all-zero fractional: >=3 digits means thousands separator
        return intpart + frac if len(frac) >= 3 else intpart
    return intpart + "." + frac


def trinity_tokenize(text: str) -> list[str]:
    """Tokenize ``text`` with the reference parser's semantics; upper-cased.

    ASCII fast path: upper-case the whole text once (C speed) and skip the
    per-token ``.upper()`` — safe because every character class here is
    ASCII-only, so tokenization commutes with ASCII upper-casing.  Non-ASCII
    text (where e.g. ``ß.upper() == 'SS'`` would change what matches) takes
    the per-token path for exact parity.

    Hot-path shape: one capture-free ``findall`` (token strings come back
    from the C regex engine with no Match objects), then per-token
    classification via :func:`_normalize_trinity_term` — the SINGLE source
    of truth for trinity normalization, shared with the build path
    (``normalize_raw_terms``).  1.8x faster than named-group dispatch on
    the code corpus, token-for-token identical (parity fuzzed against the
    spans variant, which keeps the named groups).  Every TOKEN_RE match is
    pure ASCII by construction (all character classes are ASCII), so
    per-token upper-casing on the non-ASCII path is length-preserving."""
    pre_upper = text.isascii()
    if pre_upper:
        text = text.upper()
    out: list[str] = []
    for tok in _TOKEN_RE_NC.findall(text):
        norm = _normalize_trinity_term(tok if pre_upper else tok.upper())
        if norm is not None:
            out.append(norm)
    return out


def simple_tokenize(text: str) -> list[str]:
    """``[A-Z0-9]+`` runs, upper-cased — DuckDB-expressible (oracle parity)."""
    if text.isascii():  # one C-speed upper instead of one per token
        return [t for t in _SIMPLE_RE.findall(text.upper())
                if len(t) <= MAX_TERM_LEN]
    return [t.upper() for t in _SIMPLE_RE.findall(text) if len(t) <= MAX_TERM_LEN]


def simple_tokenize_spans(text: str) -> tuple[list[str], list[int]]:
    """(tokens, byte/char start offsets) for the simple tokenizer — the
    span source for the per-hit payload channel (offsets enable snippet
    extraction without re-tokenizing the doc)."""
    toks: list[str] = []
    offs: list[int] = []
    for m in _SIMPLE_RE.finditer(text):
        t = m.group(0)
        if len(t) <= MAX_TERM_LEN:
            toks.append(t.upper())
            offs.append(m.start())
    return toks, offs


def trinity_tokenize_spans(text: str) -> tuple[list[str], list[int]]:
    """(tokens, char start offsets) for the trinity tokenizer — the
    reference's payload channel is tokenizer-agnostic (indexer.h:99-149),
    so the span variant must exist for every tokenizer.  The offset is the
    match start in the ORIGINAL text (normalization like acronym-dot
    stripping changes the token, not its source span)."""
    pre_upper = text.isascii()
    utext = text.upper() if pre_upper else text
    toks: list[str] = []
    offs: list[int] = []
    for m in TOKEN_RE.finditer(utext):
        kind = m.lastgroup
        tok = m.group()
        if kind == "acro":
            tok = tok.replace(".", "")
        elif kind == "contr":
            tok = tok[0] + tok[2:]
        elif kind == "num":
            tok = _norm_num(tok)
        elif kind == "word":
            if "'" in tok or "’" in tok:
                tok = _WORD_APOS_RE.sub(r"\1", tok)
        if len(tok) <= MAX_TERM_LEN:
            toks.append(tok if pre_upper else tok.upper())
            offs.append(m.start())
    return toks, offs


def _normalize_trinity_term(tok: str) -> str | None:
    """Normalization half of :func:`trinity_tokenize` for ONE raw
    (already upper-cased) token; ``None`` == dropped (> MAX_TERM_LEN).

    Idempotent on its own output: every rewrite removes the character that
    triggered it (dots, apostrophes) or keeps the token verbatim — so a
    stream that mixes raw tokens with already-normalized ones (the
    non-ASCII fallback in :func:`batch_raw_tokens`) normalizes correctly.
    """
    if not tok.isalnum():
        if ":" in tok or "&" in tok:
            pass                      # site / amp kept verbatim
        elif "." in tok or "," in tok:
            tok = _norm_num(tok) if tok[0].isdigit() else tok.replace(".", "")
        elif "'" in tok or "’" in tok:
            if tok[1] in _APOS:       # single-letter contraction
                tok = tok[0] + tok[2:]
            else:                     # genitive 's
                tok = _WORD_APOS_RE.sub(r"\1", tok)
    return tok if len(tok) <= MAX_TERM_LEN else None


def batch_raw_tokens(texts: list[str], name: str) -> tuple[list[str], "object"]:
    """Vectorization seam for the index build: the flat RAW token stream of
    a batch plus per-doc raw counts (numpy int64).

    Raw means upper-cased but NOT normalized/length-filtered — the builder
    dictionary-encodes this stream (Arrow, C speed) and then runs
    :func:`normalize_raw_terms` over the ~1000x smaller set of DISTINCT
    tokens instead of per-token Python classification (the tokenize loop
    was ~50% of build CPU; the regex scan itself is the irreducible part).
    Non-ASCII docs (where upper-casing does not commute with tokenization)
    fall back to the exact per-doc tokenizer; its output is already
    normalized, which is safe because normalization is idempotent.
    """
    import numpy as _np

    regex = _TOKEN_RE_NC if name == "trinity" else _SIMPLE_RE
    exact = TOKENIZERS[name]
    flat: list[str] = []
    counts = _np.empty(len(texts), _np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        toks = regex.findall(t.upper()) if t.isascii() else exact(t)
        flat.extend(toks)
        counts[i] = len(toks)
    return flat, counts


def normalize_raw_terms(terms: list[str], name: str) -> list[str | None]:
    """Map DISTINCT raw tokens from :func:`batch_raw_tokens` to indexed
    terms (``None`` == dropped by MAX_TERM_LEN)."""
    if name == "trinity":
        return [_normalize_trinity_term(t) for t in terms]
    return [t if len(t) <= MAX_TERM_LEN else None for t in terms]


# bytes twins of the scan regexes: byte-pattern findall over ASCII input is
# ~10% faster than str and allocates ~25% smaller objects (bytes header <
# str header) — less heap churn per token matters at 32-way parallelism
# where the build is memory-bandwidth-bound.  The unicode apostrophe
# alternative can never fire on ASCII input, so it is dropped from the
# byte pattern (multi-byte chars don't belong in a bytes character class).
_TOKEN_RE_NC_B = re.compile(
    _TOKEN_RE_NC.pattern.replace("’", "").encode("ascii"))
_SIMPLE_RE_B = re.compile(_SIMPLE_RE.pattern.encode("ascii"))

# Character inventory of TOKEN_RE's non-alnum pattern chars ("joiners").
# Every character a trinity token can contain is alnum or one of these, so
# a token can never cross a run of [alnum+joiner] chars — that makes
# maximal [alnum|joiner] runs ("regions") a complete dispatch unit: a
# region with NO joiner is exactly one token (the word alternative matches
# the whole run), and only joiner-bearing regions need the regex at all.
# On real corpora (source code AND prose) >99.9% of regions are pure, so
# the regex engine almost never runs.  MUST stay in lockstep with
# TOKEN_RE; test_tokenizer's batch-parity fuzz draws from this inventory.
_TRINITY_JOINERS = b".,:&'+#-"

_SCAN_LUTS: dict[str, "object"] = {}


def _scan_lut(name: str):
    """(alnum|joiner bool LUT, joiner bool LUT) per tokenizer, cached."""
    lut = _SCAN_LUTS.get(name)
    if lut is None:
        import numpy as _np

        alnum = _np.zeros(256, bool)
        alnum[_np.frombuffer(
            b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
            b"0123456789", _np.uint8)] = True
        join = _np.zeros(256, bool)
        if name == "trinity":
            join[_np.frombuffer(_TRINITY_JOINERS, _np.uint8)] = True
        # "simple" is [A-Za-z0-9]+: no joiners — every region IS a token
        _SCAN_LUTS[name] = lut = (alnum | join, join)
    return lut


def _token_spans(arr, name: str, splits=None):
    """(starts, ends) of every token in the upper-cased ASCII uint8 array
    ``arr``, in document order — the vectorized region scan described at
    ``_TRINITY_JOINERS``.  ``splits`` (optional, sorted int positions) are
    hard token boundaries (document edges in the Arrow-buffer path):
    any region straddling one is split there.  Mixed (joiner-bearing)
    regions run the byte regex on a standalone slice — the chars before/
    after a region (and a string edge) are equally non-alnum, so the
    lookbehind/lookahead context is identical either way.

    THE single span scanner: every tokenize path (list and Arrow-buffer)
    goes through here, so TOKEN_RE lockstep fixes land everywhere."""
    import numpy as _np

    cls, join = _scan_lut(name)
    ext = _np.zeros(len(arr) + 2, _np.int8)
    ext[1:-1] = cls[arr]
    d = _np.diff(ext)
    # one transition pass instead of two (d is -1/0/+1; starts and ends
    # strictly alternate start-first, so even/odd positions split them
    # without re-reading d)
    nz = _np.flatnonzero(d)
    rs, re_ = nz[0::2], nz[1::2]
    if splits is not None and splits.size:
        # ext[b] / ext[b+1] are cls of the chars before/at b: a split
        # strictly inside a region has both set — split the region there
        crossing = splits[(ext[splits] & ext[splits + 1]) != 0]
        if crossing.size:
            crossing = _np.unique(crossing)
            rs = _np.insert(rs, _np.searchsorted(rs, crossing), crossing)
            re_ = _np.insert(re_, _np.searchsorted(re_, crossing), crossing)
    # joiners are rare (<0.1% of bytes): locate them sparsely and count
    # per region via searchsorted — replaces a full-length int64 cumsum
    # (8 B/char of write traffic on the build hot path)
    jpos = _np.flatnonzero(join[arr])
    mixed = (_np.searchsorted(jpos, rs, side="left")
             < _np.searchsorted(jpos, re_, side="left"))
    ts, te = rs[~mixed], re_[~mixed]
    if mixed.any():
        regex = _TOKEN_RE_NC_B if name == "trinity" else _SIMPLE_RE_B
        ex_s: list[int] = []
        ex_e: list[int] = []
        for s0, e0 in zip(rs[mixed].tolist(), re_[mixed].tolist()):
            seg = arr[s0:e0].tobytes()
            for m in regex.finditer(seg):
                ex_s.append(s0 + m.start())
                ex_e.append(s0 + m.end())
        if ex_s:
            ts = _np.concatenate([ts, _np.array(ex_s, _np.int64)])
            te = _np.concatenate([te, _np.array(ex_e, _np.int64)])
            order = _np.argsort(ts, kind="stable")
            ts, te = ts[order], te[order]
    return ts, te


def _finish_token_stream(arr, ts, te, doc_starts, n: int, name: str):
    """Shared tail of both batch tokenize paths: gather token bytes from
    ``arr`` into one contiguous buffer, wrap as a zero-copy Arrow
    ``large_binary`` array, count tokens per doc (``doc_starts`` = start
    offset of each doc in ``arr``), dictionary-encode, and normalize the
    DISTINCT terms."""
    import numpy as _np
    import pyarrow as _pa

    tl = te - ts
    total = int(tl.sum())
    values = _np.empty(total, _np.uint8)
    if total:
        cum = _np.concatenate(([0], _np.cumsum(tl)))
        # int32 gather indices: gidx VALUES index into `arr`, so the
        # guard covers both the token-byte count AND the batch length
        # (a >=2 GiB batch with few token bytes must not wrap) — halves
        # the dominant scratch-array traffic in the normal case
        idt = (_np.int32 if max(total, arr.size) < (1 << 31)
               else _np.int64)
        gidx = _np.arange(total, dtype=idt)
        gidx += _np.repeat((ts - cum[:-1]).astype(idt), tl)
        _np.take(arr, gidx, out=values)
    offs = _np.zeros(len(ts) + 1, _np.int64)
    _np.cumsum(tl, out=offs[1:])
    # large_binary: a batch of max-length docs can flatten past the
    # 2 GiB 32-bit-offset cap of plain binary
    tok_arr = _pa.LargeBinaryArray.from_buffers(
        _pa.large_binary(), len(ts),
        [None, _pa.py_buffer(offs), _pa.py_buffer(values)])
    counts = _np.bincount(
        _np.searchsorted(doc_starts, ts, side="right") - 1, minlength=n)
    de = tok_arr.dictionary_encode()
    distinct = de.dictionary.cast(_pa.large_string()).to_pylist()
    norm = normalize_raw_terms(distinct, name)
    idx = de.indices.to_numpy(zero_copy_only=False)
    return idx, norm, counts


def batch_token_stream(texts: list[str], name: str
                       ) -> tuple["object", list[str | None], "object"]:
    """Fused tokenize -> Arrow-dictionary-encode for the index-build hot
    path: returns ``(token_idx, distinct_norm, raw_counts)`` where
    ``token_idx`` (np.int64, one per raw hit) indexes ``distinct_norm``
    (normalized DISTINCT terms, ``None`` = dropped by MAX_TERM_LEN) and
    ``raw_counts`` is the per-doc raw token count.

    All-ASCII batches (the overwhelming norm) take a fully vectorized
    path: ONE upper-case/encode pass over the '\\n'-joined batch, a numpy
    region scan for token spans (see ``_TRINITY_JOINERS`` — the regex
    runs only on the <0.1% of regions containing joiner chars), one fancy
    gather into a contiguous values buffer consumed zero-copy as an Arrow
    ``large_binary`` array, and one C ``dictionary_encode`` — no Python
    object per token anywhere (r4's findall loop allocated ~200k bytes
    objects per 1024-doc partition; r5 A/B: 0.137 s -> 0.056 s and far
    less allocator traffic, which is what throttles 32-way builds).
    Batches containing non-ASCII docs fall back to the per-doc loop
    (exact tokenizer for those docs; normalization is idempotent)."""
    import numpy as _np
    import pyarrow as _pa

    exact = TOKENIZERS[name]   # validate name up front on EVERY path
    n = len(texts)
    joined = "\n".join(texts) if None not in texts else \
        "\n".join(t or "" for t in texts)
    if joined.isascii():
        big = joined.upper().encode("ascii")
        arr = _np.frombuffer(big, _np.uint8)
        ts, te = _token_spans(arr, name)
        doc_starts = _np.zeros(n, _np.int64)
        if n > 1:
            lens = _np.fromiter((len(t) if t else 0 for t in texts),
                                _np.int64, n)
            _np.cumsum(lens[:-1] + 1, out=doc_starts[1:])
        return _finish_token_stream(arr, ts, te, doc_starts, n, name)
    else:
        regex = _TOKEN_RE_NC_B if name == "trinity" else _SIMPLE_RE_B
        flat: list[bytes] = []
        counts = _np.empty(n, _np.int64)
        for i, t in enumerate(texts):
            t = t or ""
            if t.isascii():
                toks = regex.findall(t.upper().encode("ascii"))
            else:
                toks = [x.encode("utf-8") for x in exact(t)]
            flat.extend(toks)
            counts[i] = len(toks)
        de = _pa.array(flat, _pa.large_binary()).dictionary_encode()
        del flat
    distinct = de.dictionary.cast(_pa.large_string()).to_pylist()
    norm = normalize_raw_terms(distinct, name)
    idx = de.indices.to_numpy(zero_copy_only=False)
    return idx, norm, counts


def arrow_ascii_view(col):
    """``(values uint8 view, int64 offsets, upper-cased values view)``
    over an all-ASCII Arrow string array's buffers, or ``None`` when the
    zero-copy path can't be used (non-ASCII bytes, nulls — whose offset
    extents are not guaranteed empty — or a sliced array).  Callers fall
    back to ``to_pylist()``.  The upper-case copy comes from Arrow's
    SIMD ``ascii_upper`` kernel (~10x a numpy LUT gather); the original
    ``vals`` stay available for content hashing."""
    import numpy as _np
    import pyarrow as _pa
    import pyarrow.compute as _pc

    if col.null_count or col.offset:
        return None
    t = col.type
    if t == _pa.string():
        odt = _np.int32
    elif t == _pa.large_string():
        odt = _np.int64
    else:
        return None
    bufs = col.buffers()
    n = len(col)
    offs = _np.frombuffer(bufs[1], odt, n + 1)
    if odt is _np.int32:
        offs = offs.astype(_np.int64)  # n+1 values, tiny
    L = int(offs[-1]) if offs.size else 0
    vals = (_np.frombuffer(bufs[2], _np.uint8, L)
            if L and bufs[2] is not None else _np.empty(0, _np.uint8))
    if vals.size and int(vals.max()) >= 0x80:
        return None
    up = (_np.frombuffer(_pc.ascii_upper(col).buffers()[2], _np.uint8, L)
          if L else vals)
    return vals, offs, up


def batch_token_stream_buffer(vals, offs, up, name: str):
    """:func:`batch_token_stream` over a zero-copy Arrow values buffer
    (from :func:`arrow_ascii_view`): no per-doc Python strings — the
    span scan runs on the SIMD-upper-cased buffer directly.  Docs are
    adjacent WITHOUT a separator here, so interior doc boundaries go to
    :func:`_token_spans` as hard splits (the job the ``'\\n'.join``
    separator does in the list path); everything else is the shared
    scan + tail."""
    import numpy as _np
    import pyarrow as _pa

    TOKENIZERS[name]  # validate name up front on EVERY path
    n = offs.size - 1
    if vals.size == 0:
        de = _pa.array([], _pa.large_binary()).dictionary_encode()
        return (de.indices.to_numpy(zero_copy_only=False), [],
                _np.zeros(n, _np.int64))
    ts, te = _token_spans(up, name, splits=offs[1:-1])
    return _finish_token_stream(up, ts, te, offs[:-1], n, name)


TOKENIZERS: dict[str, Callable[[str], list[str]]] = {
    "trinity": trinity_tokenize,
    "simple": simple_tokenize,
}

TOKENIZER_SPANS: dict[str, Callable[[str], tuple[list[str], list[int]]]] = {
    "simple": simple_tokenize_spans,
    "trinity": trinity_tokenize_spans,
}


def get_tokenizer_spans(name: str) -> Callable[[str], tuple[list[str], list[int]]]:
    try:
        return TOKENIZER_SPANS[name]
    except KeyError:
        raise ValueError(
            f"tokenizer {name!r} has no span variant (needed for per-hit "
            f"payloads); one of {sorted(TOKENIZER_SPANS)}")


def get_tokenizer(name: str) -> Callable[[str], list[str]]:
    try:
        return TOKENIZERS[name]
    except KeyError:
        raise ValueError(f"unknown tokenizer {name!r}; one of {sorted(TOKENIZERS)}")


def tokenize_with_positions(text: str, tokenizer: Callable[[str], list[str]]) -> list[tuple[str, int]]:
    """(term, 1-based position) pairs, positions capped at MAX_POSITION-1."""
    toks = tokenizer(text)
    if len(toks) >= MAX_POSITION:
        toks = toks[: MAX_POSITION - 1]
    return [(t, i + 1) for i, t in enumerate(toks)]
