"""Tokenizer golden cases lifted from the reference parser's documented
behaviors (/root/reference/queries.cpp:2098-2341)."""

import pytest

from trinity_ray.tokenizer import (
    MAX_TERM_LEN,
    simple_tokenize,
    tokenize_with_positions,
    trinity_tokenize,
)


GOLDEN = [
    # acronyms (queries.cpp:2120-2149)
    ("I.B.M", ["IBM"]),
    ("U.S.A. rules", ["USA", "RULES"]),
    ("M.P.ACT", ["MPACT"]),
    # word:domain (queries.cpp:2152-2166)
    ("site:x-box.com ok", ["SITE:X-BOX.COM", "OK"]),
    ("site:.gr", ["SITE:.GR"]),
    ("video games", ["VIDEO", "GAMES"]),
    # single-letter contraction (queries.cpp:2167-2185)
    ("L'Oreal Revitalift", ["LOREAL", "REVITALIFT"]),
    # numbers (queries.cpp:2187-2256; code behavior, not the stale comment)
    ("9.000", ["9000"]),
    ("1.0", ["1"]),
    ("8.25", ["8.25"]),
    ("8,25", ["8.25"]),
    ("1,500", ["1.500"]),
    ("42", ["42"]),
    # genitive apostrophe (queries.cpp:2266-2290)
    ("John's boat", ["JOHNS", "BOAT"]),
    ("it's", ["ITS"]),
    # single-letter & pairs (queries.cpp:2297-2309)
    ("d&d night", ["D&D", "NIGHT"]),
    ("x&y", ["X&Y"]),
    ("ab&c", ["AB", "C"]),  # lead must be a single letter
    # +/# suffixes (queries.cpp:2318-2325)
    ("C++ and C# code", ["C++", "AND", "C#", "CODE"]),
    ("c++11", ["C++11"]),
    # hyphens are separators (queries.cpp:2310-2317)
    ("x-men pre-processing", ["X", "MEN", "PRE", "PROCESSING"]),
    ("New York-based", ["NEW", "YORK", "BASED"]),
    # code-ish input
    ("def foo(bar): return baz_qux + 42", ["DEF", "FOO", "BAR", "RETURN", "BAZ", "QUX", "42"]),
    ("#include <stdio.h>", ["INCLUDE", "STDIO", "H"]),
    ("", []),
    ("   \t\n  ", []),
]


@pytest.mark.parametrize("text,expected", GOLDEN, ids=[repr(t[:24]) for t, _ in GOLDEN])
def test_trinity_tokenize_golden(text, expected):
    assert trinity_tokenize(text) == expected


def test_long_terms_dropped():
    long = "b" * (MAX_TERM_LEN + 1)
    assert trinity_tokenize(f"a {long} c") == ["A", "C"]
    assert trinity_tokenize("b" * MAX_TERM_LEN) == ["B" * MAX_TERM_LEN]
    assert simple_tokenize(f"a {long} c") == ["A", "C"]


def test_simple_tokenize():
    assert simple_tokenize("Foo bar-baz 12.5") == ["FOO", "BAR", "BAZ", "12", "5"]


def test_positions_are_one_based():
    assert tokenize_with_positions("a b c", trinity_tokenize) == [("A", 1), ("B", 2), ("C", 3)]


def test_position_cap():
    text = " ".join(f"t{i}" for i in range(20000))
    pairs = tokenize_with_positions(text, simple_tokenize)
    assert len(pairs) == (1 << 14) - 1
    assert pairs[-1][1] == (1 << 14) - 1


def test_trinity_tokenize_spans_parity():
    """The span variant returns exactly trinity_tokenize's tokens, with each
    offset pointing at the token's match start in the ORIGINAL text — the
    payload channel is tokenizer-agnostic (indexer.h:99-149)."""
    from trinity_ray.tokenizer import trinity_tokenize_spans

    cases = [t for t, _ in GOLDEN] + [
        "Visit site:x-box.com for I.B.M deals, John's C++ code & 9.000 more",
        "naïve café L'Oreal ß test",  # non-ASCII path
    ]
    for text in cases:
        toks, offs = trinity_tokenize_spans(text)
        assert toks == trinity_tokenize(text), text
        assert len(offs) == len(toks)
        assert all(0 <= o < max(1, len(text)) for o in offs)
        assert offs == sorted(offs)
        for t, o in zip(toks, offs):
            # the source span starts with the token's first character
            # (normalization may change the rest: dots stripped, etc.)
            assert text[o].upper() == t[0] or text[o] in "'’", (text, t, o)


def test_fast_classification_matches_named_group_dispatch():
    """trinity_tokenize's capture-free findall + char-class classification
    must be token-for-token identical to the named-group dispatch (kept in
    trinity_tokenize_spans) — fuzzed over adversarial special-char soup."""
    import random

    from trinity_ray.tokenizer import trinity_tokenize_spans

    rng = random.Random(1234)
    atoms = ["I.B.M", "U.S.A.", "site:x-box.com", "site:.gr", "L'Oreal",
             "9.000", "1.0", "8.25", "8,25", "1,500", "John's", "it's",
             "d&d", "x&y", "ab&c", "C++", "C#", "c++11", "x-men", "A's",
             "a'b", "B2's", "M.P.ACT", "word", "42", "..", "''", "&&",
             "a", "Z", "9", ":", "#x", "+y", "naïve", "ß", "café's"]
    for _ in range(400):
        text = " ".join(rng.choice(atoms)
                        for _ in range(rng.randint(0, 12)))
        # also glue some atoms with random separators
        if rng.random() < 0.5:
            sep = rng.choice([",", ".", "-", "  ", "\t", "/", ""])
            text += " " + sep.join(rng.choice(atoms) for _ in range(3))
        fast = trinity_tokenize(text)
        slow = trinity_tokenize_spans(text)[0]
        assert fast == slow, repr(text)


def test_batch_raw_tokens_parity():
    """The builder's vectorization seam (raw stream + dictionary-level
    normalization) must reproduce the per-doc tokenizer exactly, including
    MAX_TERM_LEN drops, non-ASCII fallback, and empty docs."""
    import numpy as np

    from trinity_ray.tokenizer import batch_raw_tokens, normalize_raw_terms

    texts = [t for t, _ in GOLDEN]
    texts += [
        "x" * (MAX_TERM_LEN + 1) + " kept " + "y" * MAX_TERM_LEN,
        "straße GROSS muß",                 # non-ASCII fallback path
        "ße" * 40,                          # non-ASCII, long
        None if False else "",              # empty
        "I.B.M meets John's 9.000 d&d site:.gr L'Oreal C++ x-men",
    ]
    for name in ("trinity", "simple"):
        from trinity_ray.tokenizer import TOKENIZERS

        exact = TOKENIZERS[name]
        flat, counts = batch_raw_tokens(texts, name)
        assert int(counts.sum()) == len(flat)
        distinct = sorted(set(flat))
        norm = dict(zip(distinct, normalize_raw_terms(distinct, name)))
        starts = np.concatenate(([0], np.cumsum(counts)))
        for i, text in enumerate(texts):
            raw = flat[starts[i]:starts[i + 1]]
            got = [norm[t] for t in raw if norm[t] is not None]
            assert got == exact(text or ""), (name, text)


def test_batch_token_stream_parity():
    """The fused byte-scan + dictionary-encode seam (the actual build hot
    path) must reproduce the per-doc tokenizer exactly — MAX_TERM_LEN
    drops, non-ASCII fallback, empty docs, every special-case token."""
    import numpy as np

    from trinity_ray.tokenizer import TOKENIZERS, batch_token_stream

    texts = [t for t, _ in GOLDEN]
    texts += [
        "x" * (MAX_TERM_LEN + 1) + " kept " + "y" * MAX_TERM_LEN,
        "straße GROSS muß",                 # non-ASCII fallback path
        "ße" * 40,                          # non-ASCII, long
        "",
        "I.B.M meets John's 9.000 d&d site:.gr L'Oreal C++ x-men",
    ]
    for name in ("trinity", "simple"):
        exact = TOKENIZERS[name]
        idx, norm, counts = batch_token_stream(texts, name)
        assert int(counts.sum()) == idx.size
        starts = np.concatenate(([0], np.cumsum(counts)))
        for i, text in enumerate(texts):
            ids = idx[starts[i]:starts[i + 1]]
            got = [norm[j] for j in ids if norm[j] is not None]
            assert got == exact(text or ""), (name, text)


def test_batch_token_stream_ascii_fast_path_parity():
    """All-ASCII batches take the vectorized region-scan path (no regex on
    pure-alnum regions) — it must match the per-doc tokenizer exactly,
    including every joiner-bearing special form and MAX_TERM_LEN drops."""
    import numpy as np

    from trinity_ray.tokenizer import TOKENIZERS, batch_token_stream

    texts = [t for t, _ in GOLDEN if t.isascii()]
    texts += [
        "x" * (MAX_TERM_LEN + 1) + " kept " + "y" * MAX_TERM_LEN,
        "",
        "I.B.M meets John's 9.000 d&d site:.gr L'Oreal C++ x-men",
        "a.b.c... :x x: ..,, '' && ++ ## -- a-b-c d&d&d 1,2,3 a'sb",
        "line\nbreaks\nin one doc",
    ]
    assert all(t.isascii() for t in texts)
    for name in ("trinity", "simple"):
        exact = TOKENIZERS[name]
        idx, norm, counts = batch_token_stream(texts, name)
        assert int(counts.sum()) == idx.size
        starts = np.concatenate(([0], np.cumsum(counts)))
        for i, text in enumerate(texts):
            ids = idx[starts[i]:starts[i + 1]]
            got = [norm[j] for j in ids if norm[j] is not None]
            assert got == exact(text or ""), (name, text)


def test_batch_token_stream_fast_path_fuzz():
    """1000 random ASCII docs drawn joiner-heavy (the region-dispatch
    adversary: every char class boundary the scan must agree with the
    regex on).  Seeded — failures reproduce."""
    import random

    import numpy as np

    from trinity_ray.tokenizer import TOKENIZERS, batch_token_stream

    from trinity_ray.tokenizer import _TRINITY_JOINERS

    rng = random.Random(0xF457)
    alphabet = "ab zZ09" + _TRINITY_JOINERS.decode() + "  .__()"
    texts = ["".join(rng.choice(alphabet)
                     for _ in range(rng.randrange(0, 120)))
             for _ in range(1000)]
    for name in ("trinity", "simple"):
        exact = TOKENIZERS[name]
        idx, norm, counts = batch_token_stream(texts, name)
        starts = np.concatenate(([0], np.cumsum(counts)))
        for i, text in enumerate(texts):
            ids = idx[starts[i]:starts[i + 1]]
            got = [norm[j] for j in ids if norm[j] is not None]
            assert got == exact(text), (name, repr(text))


def test_trinity_joiner_inventory_lockstep():
    """_TRINITY_JOINERS must cover every non-alnum char a trinity token can
    contain — otherwise the region scan would split where TOKEN_RE joins.
    Behavioral probe: for every printable ASCII char, if the exact
    tokenizer ever emits a token containing it, it must be a joiner (or
    alnum).  Adding a new punctuation form to TOKEN_RE without updating
    _TRINITY_JOINERS fails here, loudly."""
    import string

    from trinity_ray.tokenizer import _TRINITY_JOINERS, trinity_tokenize

    joiners = set(_TRINITY_JOINERS.decode())
    alnum = set(string.ascii_letters + string.digits)
    for c in string.printable:
        if c in alnum or not c.isprintable():
            continue
        probes = [f"a{c}b", f"a{c}s", f"1{c}2", f"ab{c}cd", f"a{c}b{c}cd",
                  f"x{c}{c}y", f"a{c}", f"{c}a", f"A{c}B{c}C{c}D"]
        for p in probes:
            for tok in trinity_tokenize(p):
                for ch in tok:
                    assert ch in alnum or ch in joiners, (
                        f"TOKEN_RE emits {ch!r} (probe {p!r}, token {tok!r})"
                        f" but it is not in _TRINITY_JOINERS")


def test_batch_token_stream_unknown_name():
    import pytest

    from trinity_ray.tokenizer import batch_token_stream

    with pytest.raises(KeyError):
        batch_token_stream(["plain ascii"], "typo_name")


# ---- zero-copy Arrow buffer path (batch_token_stream_buffer) ----------


def _buffer_vs_list(texts, name="trinity"):
    import pyarrow as pa

    from trinity_ray.tokenizer import (arrow_ascii_view, batch_token_stream,
                                       batch_token_stream_buffer)

    view = arrow_ascii_view(pa.array(texts, pa.string()))
    assert view is not None
    idx2, norm2, c2 = batch_token_stream_buffer(*view, name)
    idx1, norm1, c1 = batch_token_stream(texts, name)
    assert [norm1[i] for i in idx1] == [norm2[i] for i in idx2]
    assert list(c1) == list(c2)


def test_buffer_path_parity_edge_docs():
    # doc boundaries with alnum/joiner neighbours (the '\n'.join separator
    # the buffer path replaces with explicit region splits), empty docs,
    # every TOKEN_RE alternative, tokens at doc edges
    docs = ["abc", "def", "", "x", "9.000", "I.B.M", "L'Oreal rocks",
            "c++", "d&d", "site:x-box.com", "", "", "end9", "9start",
            "a.b.c", "...", "-", "a-b", "john's", "tail.", ".head",
            "a", "b", "c"]
    _buffer_vs_list(docs)
    _buffer_vs_list(docs, "simple")


def test_buffer_path_parity_fuzz():
    import random
    import string

    from trinity_ray.tokenizer import _TRINITY_JOINERS

    rng = random.Random(7)
    alpha = (string.ascii_letters + string.digits
             + _TRINITY_JOINERS.decode() + "  \n\t!()")
    for _ in range(150):
        docs = ["".join(rng.choice(alpha)
                        for _ in range(rng.randrange(0, 30)))
                for _ in range(rng.randrange(1, 12))]
        _buffer_vs_list(docs)


def test_arrow_ascii_view_fallback_triggers():
    import pyarrow as pa

    from trinity_ray.tokenizer import arrow_ascii_view

    assert arrow_ascii_view(pa.array(["héllo"], pa.string())) is None
    assert arrow_ascii_view(pa.array(["a", None], pa.string())) is None
    sliced = pa.array(["aa", "bb", "cc"], pa.string()).slice(1, 2)
    assert arrow_ascii_view(sliced) is None
    assert arrow_ascii_view(pa.array([1, 2])) is None
    # large_string IS supported
    view = arrow_ascii_view(pa.array(["ok here"], pa.large_string()))
    assert view is not None and bytes(view[2]) == b"OK HERE"


def test_batch_token_stream_non_ascii_parity():
    """Non-ASCII docs take the list path (arrow_ascii_view refuses them);
    the batch stream must still equal per-doc tokenization — including
    multibyte chars, surrogates, and emoji splicing token boundaries."""
    import random

    from trinity_ray.tokenizer import batch_token_stream

    pool = ("héllo wörld ütf 中文 русский a1 c++ naïve 9.000 x&y "
            "emoji😀mix tab\tnl\n mix3d.aç ")
    rng = random.Random(99)
    cases = [["héllo wörld", "naïve c++", "中文 test", "a😀b", "é", ""]]
    for _ in range(40):
        cases.append(["".join(rng.choice(pool)
                              for _ in range(rng.randrange(0, 40)))
                      for _ in range(rng.randrange(1, 8))])
    for docs in cases:
        idx, norm, counts = batch_token_stream(docs, "trinity")
        toks = [norm[i] for i in idx]
        ref = []
        for d in docs:
            ref.extend(trinity_tokenize(d))
        assert toks == ref, docs
        assert list(counts) == [len(trinity_tokenize(d)) for d in docs]
