"""Percolator (reverse search, percolator.h:19-86) and the query-rewrite
hook (queries_rewrite.h:992) — matched against the forward engine / oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trinity_ray.index.build import build_index
from trinity_ray.ops.percolate import Percolator, match_doc, percolate
from trinity_ray.oracle import OracleIndex
from trinity_ray.query.ast import Or, Phrase, Token, parse_query
from trinity_ray.query.rewrite import rewrite_query
from trinity_ray.search import LocalSearcher

DOCS = [
    "the quick brown fox jumps",          # 0
    "a quick search engine",              # 1
    "fast search engine design",          # 2
    "brown table scan merge",             # 3
    "fox and table",                      # 4
    "merge table scan brown fox",         # 5
    "",                                   # 6
]

STANDING = {
    "q_and": "quick AND search",
    "q_or": "fox OR merge",
    "q_phrase": '"table scan"',
    "q_not": "table NOT merge",
    "q_some": "[2 fox table brown]",
}


def oracle_matches(query: str) -> set[int]:
    o = OracleIndex("simple")
    for i, d in enumerate(DOCS):
        o.add(i, d)
    return o.match(parse_query(query, "simple"))


def test_match_doc_against_oracle():
    """Per-doc percolation == forward oracle matching for every query."""
    from trinity_ray.tokenizer import get_tokenizer

    tok = get_tokenizer("simple")
    for name, q in STANDING.items():
        node = parse_query(q, "simple")
        want = oracle_matches(q)
        for i, d in enumerate(DOCS):
            term_pos: dict[str, list[int]] = {}
            for p, t in enumerate(tok(d), start=1):
                term_pos.setdefault(t, []).append(p)
            assert match_doc(node, term_pos) == (i in want), (name, i)


def test_percolate_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS, pa.string()),
    }))
    got = percolate(ds, STANDING, concurrency=2).to_pandas()
    got_pairs = {(int(r.doc_id), r.query_name) for r in got.itertuples()}
    want_pairs = {(d, name) for name, q in STANDING.items()
                  for d in oracle_matches(q)}
    assert got_pairs == want_pairs


def test_percolator_phrase_positions():
    p = Percolator({"ph": '"brown fox"'}, tokenizer="simple")
    t = pa.table({"doc_id": pa.array([0, 5], pa.int64()),
                  "text": pa.array([DOCS[0], DOCS[5]], pa.string())})
    out = p(t)
    assert out.column("doc_id").to_pylist() == [0, 5]


SYNONYMS = {("QUICK",): ["FAST"], ("TABLE", "SCAN"): ["FULL SCAN"]}


def _cb(gram):
    return SYNONYMS.get(gram)


def test_rewrite_builds_or_tree():
    node = parse_query("quick search", "simple")
    rw = rewrite_query(node, k=2, callback=_cb)
    # quick -> (QUICK OR FAST), search untouched
    terms = {c for c in getattr(rw, "children", [rw])}
    assert any(isinstance(c, Or) and Token("FAST") in c.children
               and Token("QUICK") in c.children for c in terms)
    assert Token("SEARCH") in terms


def test_rewrite_longest_gram_first():
    node = parse_query("table scan merge", "simple")
    rw = rewrite_query(node, k=2, callback=_cb)
    ors = [c for c in rw.children if isinstance(c, Or)]
    assert len(ors) == 1
    assert Phrase(("TABLE", "SCAN")) in ors[0].children
    assert Phrase(("FULL", "SCAN")) in ors[0].children
    assert Token("MERGE") in rw.children


def test_rewrite_budget_zero_is_identity():
    node = parse_query("quick search", "simple")
    assert rewrite_query(node, 2, _cb, budget=0) == node


def test_rewritten_query_equals_manual_or(tmp_path, ray_session):
    """Searching the rewritten AST == searching the manually-expanded query
    (rank-identical docIDs + scores)."""
    pq.write_table(pa.table({"text": pa.array(DOCS * 40, pa.string())}),
                   str(tmp_path / "d.parquet"), row_group_size=70)
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "d.parquet"), idx, content_column="text",
                tokenizer="simple", positions=True)
    s = LocalSearcher(idx)
    rw = rewrite_query(parse_query("quick search", "simple"), 2, _cb)
    manual = parse_query("(quick OR fast) search", "simple")
    a = s.search(rw, k=20)
    b = s.search(manual, k=20)
    np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
    np.testing.assert_array_equal(a.scores, b.scores)


def test_trigger_index_equals_exhaustive(ray_session):
    """Predicate grouping (group_execnodes analogue): the trigger-term
    index must be a pure optimization — identical matches to evaluating
    every standing query per doc, across every query shape."""
    import numpy as np
    import pyarrow as pa

    from trinity_ray.ops.percolate import Percolator, match_doc, trigger_terms
    from trinity_ray.query.ast import parse_query
    from trinity_ray.tokenizer import MAX_POSITION, get_tokenizer

    queries = {
        "tok": "alpha",
        "and": "alpha AND beta",
        "or": "beta OR gamma",
        "phrase": '"alpha beta"',
        "not": "alpha NOT beta",          # triggered by alpha
        "pure_not": "NOT beta",            # unconditional
        "some": "[2 alpha beta gamma]",
        "optional": "<beta> gamma",
        "matchall": "",                    # unconditional
        "mixed": "(alpha OR beta) AND (gamma OR delta)",
    }
    docs = ["alpha beta", "beta gamma", "delta", "", "alpha beta gamma delta",
            "gamma", "alpha", "epsilon zeta", "beta", "alpha gamma"]
    p = Percolator(queries, tokenizer="simple", text_column="t",
                   id_column="i")
    got = p(pa.table({"i": pa.array(range(len(docs)), pa.int64()),
                      "t": pa.array(docs)}))
    # exhaustive reference: evaluate every plan for every doc
    tok = get_tokenizer("simple")
    expect = []
    for i, text in enumerate(docs):
        toks = tok(text)[: MAX_POSITION - 1]
        tp = {}
        for pos, t in enumerate(toks, start=1):
            tp.setdefault(t, []).append(pos)
        for name, q in sorted(queries.items()):
            if match_doc(parse_query(q, "simple"), tp):
                expect.append((i, name))
    assert list(zip(got.column("i").to_pylist(),
                    got.column("query_name").to_pylist())) == expect
    # the index is genuinely selective: single-token query triggers on one
    # term; unconditional queries are in `always`
    assert trigger_terms(parse_query("alpha", "simple")) == {"ALPHA"}
    # bare negation normalizes to ConstFalse (matches nothing) -> empty
    # trigger set, indexed nowhere
    assert trigger_terms(parse_query("NOT beta", "simple")) == frozenset()
    assert trigger_terms(parse_query("", "simple")) is None
    assert len(p.always) == 1  # only the MatchAll query is unconditional


def test_weighted_rewrite_provenance(tmp_path, ray_session):
    """Synonym alternatives score at their instance weight; originals keep
    1.0; a term that is both original and synonym takes the max."""
    import os

    from trinity_ray.query.ast import collect_scorable_weights

    p = os.path.join(str(tmp_path), "docs.parquet")
    pq.write_table(pa.table({"text": pa.array(DOCS)}), p)
    idx = os.path.join(str(tmp_path), "idx")
    build_index(p, idx, content_column="text", tokenizer="simple")

    node = rewrite_query(
        parse_query("fox", "simple"), k=1,
        callback=lambda g: [("MERGE", 0.25)] if g == ("FOX",) else None)
    assert collect_scorable_weights(node) == {"FOX": 1.0, "MERGE": 0.25}
    s = LocalSearcher(idx)
    idf = s.resolve_idf(node)
    base = s.resolve_idf(parse_query("fox OR merge", "simple"))
    assert abs(idf["FOX"] - base["FOX"]) < 1e-15
    assert abs(idf["MERGE"] - 0.25 * base["MERGE"]) < 1e-15
    # scores reflect the down-weight: doc 5 has fox+merge
    rw = s.search(node, k=10)
    ow = s.search("fox OR merge", k=10)
    sc_r = {int(d): x for d, x in zip(rw.doc_ids, rw.scores)}
    sc_o = {int(d): x for d, x in zip(ow.doc_ids, ow.scores)}
    assert set(sc_r) == set(sc_o)
    for d in sc_r:
        assert sc_r[d] <= sc_o[d] + 1e-12
    assert any(sc_r[d] < sc_o[d] - 1e-12 for d in sc_r)  # merge docs dropped
    # max rule: MERGE as original elsewhere in the query wins over 0.25
    both = Or((node, Token("MERGE")))
    assert collect_scorable_weights(both)["MERGE"] == 1.0
    # default alt_weight applies when the callback returns bare strings
    node2 = rewrite_query(
        parse_query("fox", "simple"), k=1,
        callback=lambda g: ["MERGE"] if g == ("FOX",) else None,
        alt_weight=0.5)
    assert collect_scorable_weights(node2)["MERGE"] == 0.5


def test_rewrite_geometry_sequence_scoring(tmp_path, ray_session):
    """Sequence-aware scoring of REWRITTEN queries (rewrite_ctx provenance
    / translationCoefficient, queries_rewrite.h:312-492): a synonym
    spliced for 'quick' inherits query index 0, so a doc with the synonym
    ADJACENT to 'search' earns the same sequence bonus as the original —
    while the flat distinct-token geometry would demand
    quick@p, synonym@p+1, search@p+2 and award nothing."""
    docs = [
        "quick search engine",     # 0: original adjacent
        "rapid search engine",     # 1: synonym adjacent
        "search the quick index",  # 2: both terms, not adjacent
        "rapid quest search",      # 3: synonym, not adjacent to search
    ] * 10
    src = str(tmp_path / "g.parquet")
    pq.write_table(pa.table({"text": pa.array(docs)}), src)
    idx = str(tmp_path / "gidx")
    build_index(src, idx, content_column="text", tokenizer="simple")
    s = LocalSearcher(idx)

    node = parse_query("quick AND search", "simple")
    geom: list = []
    # alternatives are contract-normalized (index tokenizer output form)
    rq = rewrite_query(node, 2,
                       lambda gram: ["RAPID"] if gram == ("QUICK",) else None,
                       geometry=geom)
    assert geom == [("QUICK", "RAPID"), ("SEARCH",)]
    r0 = s.search_sequence(rq, k=0, bonus=0.0, index_terms=geom)
    r1 = s.search_sequence(rq, k=0, bonus=0.5, index_terms=geom)
    base = {int(d): sc for d, sc in zip(r0.doc_ids, r0.scores)}
    bonused = {int(d): sc for d, sc in zip(r1.doc_ids, r1.scores)}
    for d in base:
        delta = round(bonused[d] - base[d], 9)
        if d % 4 in (0, 1):        # original OR synonym adjacent to search
            assert delta == 0.5, (d, delta)
        else:                      # terms present but never adjacent
            assert delta == 0.0, (d, delta)
    # flat distinct-token control ([QUICK, RAPID, SEARCH]): the ORIGINAL
    # adjacent doc loses its bonus — quick and search sit at flat indices
    # 0 and 2, so quick@p, search@p+1 no longer chains.  Provenance
    # geometry is what keeps rewrites sequence-scorable.
    from trinity_ray.query.ast import collect_scorable_terms

    flat = collect_scorable_terms(rq)
    assert flat == ["QUICK", "RAPID", "SEARCH"]
    rf = s.search_sequence(rq, k=0, bonus=0.5, index_terms=flat)
    flatb = {int(d): sc for d, sc in zip(rf.doc_ids, rf.scores)}
    for d in base:
        if d % 4 == 0:
            assert round(flatb[d] - base[d], 9) == 0.0, d


def test_rewrite_budget_prunes_lowest_weight_alternatives():
    """A wide synonym fan-out is pruned to the budget, highest weight
    first (queries_rewrite.h:522-948 budget seam); small fan-outs are
    unchanged by the budget machinery."""
    wide = [(f"SYN{i}", 0.001 * (i + 1)) for i in range(1000)]

    def cb(gram):
        return wide if gram == ("QUICK",) else None

    node = parse_query("quick search", "simple")
    rw = rewrite_query(node, 2, cb, budget=8)
    ors = [c for c in rw.children if isinstance(c, Or)]
    assert len(ors) == 1
    # original + exactly budget alternatives
    assert len(ors[0].children) == 1 + 8
    assert Token("QUICK") in ors[0].children
    # the 8 HIGHEST weights survive (SYN992..SYN999)
    kept = {c.term for c in ors[0].children if c.term.startswith("SYN")}
    assert kept == {f"SYN{i}" for i in range(992, 1000)}
    # small fan-outs: budgeted == unbudgeted result
    assert rewrite_query(node, 2, _cb, budget=8) == \
        rewrite_query(node, 2, _cb, budget=1_000_000)
    # the budget is global across grams: a second expansion sees the rest
    node2 = parse_query("quick quick2", "simple")

    def cb2(gram):
        return [("A", 1.0), ("B", 0.9)] if gram[0].startswith("QUICK") else None

    rw2 = rewrite_query(node2, 1, cb2, budget=3)
    ors2 = [c for c in rw2.children if isinstance(c, Or)]
    assert [len(o.children) for o in ors2] == [3, 2]  # 2 alts, then 1 left


def test_near_parser_numeric_terms():
    """Only the FIRST numeric after 'near' is the window; later numerics
    are search terms (code-review r4 finding)."""
    from trinity_ray.query.ast import Near

    assert parse_query("[near 2 1984 war]", "simple") == \
        Near(("1984", "WAR"), window=2)
    # grammar: the FIRST numeric after 'near' is always the window — a
    # numeric first TERM needs an explicit window ([near 1984 war] reads
    # window=1984 over the single term WAR, which folds to Token)
    from trinity_ray.query.ast import Token as _Tok
    assert parse_query("[near 1984 war]", "simple") == _Tok("WAR")
    assert parse_query("[near 3 alpha 42 beta]", "simple") == \
        Near(("ALPHA", "42", "BETA"), window=3)
    # MatchSome first-numeric behavior unchanged
    from trinity_ray.query.ast import MatchSome, Token
    ms = parse_query("[2 alpha beta gamma]", "simple")
    assert ms == MatchSome(2, (Token("ALPHA"), Token("BETA"),
                               Token("GAMMA")))


def test_near_window_clamped_at_parse_time():
    """A syntactically valid query with an absurd window must clamp at
    parse time, never raise inside match execution (ADVICE r4)."""
    from trinity_ray.query.ast import Near
    from trinity_ray.tokenizer import MAX_POSITION

    node = parse_query("[near 99999 alpha beta]", "simple")
    assert node == Near(("ALPHA", "BETA"), window=MAX_POSITION - 1)


def test_rewrite_translation_coefficient():
    """rewrite_ctx.translationCoefficient algebra (queries.h:400-417,
    queries.cpp set_rewrite_translation_coeff): an alternative's weight is
    callback_weight x min(span, cnt)/max(span, cnt) x source weight."""
    from trinity_ray.query.ast import Or, Phrase, Token

    # expansion 1 -> 3: tc = 1/3
    rw = rewrite_query(parse_query("cod game", "simple"), 1,
                       lambda g: ["CALL OF DUTY"] if g == ("COD",) else None)
    ors = [c for c in rw.children if isinstance(c, Or)]
    alt = next(c for c in ors[0].children if isinstance(c, Phrase))
    assert abs(alt.weight - 1 / 3) < 1e-9
    # the original keeps weight 1.0
    orig = next(c for c in ors[0].children if isinstance(c, Token))
    assert orig.weight == 1.0

    # contraction 2 -> 1 with an explicit callback weight: 0.8 * 1/2
    rw2 = rewrite_query(parse_query("mac book pro", "simple"), 2,
                        lambda g: [("MACBOOK", 0.8)]
                        if g == ("MAC", "BOOK") else None)
    or2 = next(c for c in rw2.children if isinstance(c, Or))
    alt2 = next(c for c in or2.children if isinstance(c, Token)
                and c.term == "MACBOOK")
    assert abs(alt2.weight - 0.4) < 1e-9
    # equal-length rewrites stay at the callback weight (tc = 1)
    rw3 = rewrite_query(parse_query("dup", "simple"), 1,
                        lambda g: [("VECTOR", 0.5)] if g == ("DUP",) else None)
    altv = next(c for c in rw3.children if isinstance(c, Token)
                and c.term == "VECTOR")
    assert altv.weight == 0.5


def test_rewrite_coefficients_compose_across_passes():
    """Chained rewrite passes multiply coefficients (the nested multi-gram
    composition, queries_rewrite.h:391/440/484): [ps four] -> PS4 (1/2),
    then PS4 -> 'PLAYSTATION 4' composes to 1/2 * 1/2 = 1/4."""
    from trinity_ray.query.ast import Or, Phrase, Token

    p1 = rewrite_query(parse_query("ps four game", "simple"), 2,
                       lambda g: ["PS4"] if g == ("PS", "FOUR") else None)
    tok = next(c for o in p1.children if isinstance(o, Or)
               for c in o.children if isinstance(c, Token)
               and c.term == "PS4")
    assert abs(tok.weight - 0.5) < 1e-9
    p2 = rewrite_query(p1, 1,
                       lambda g: ["PLAYSTATION 4"] if g == ("PS4",) else None)
    phr = [c for c in _iter_nodes(p2) if isinstance(c, Phrase)
           and c.terms == ("PLAYSTATION", "4")]
    assert phr and abs(phr[0].weight - 0.25) < 1e-9


def _iter_nodes(node):
    from trinity_ray.query.ast import (And, MatchSome, Not, Optional_, Or)

    yield node
    if isinstance(node, (And, Or, MatchSome)):
        for c in node.children:
            yield from _iter_nodes(c)
    elif isinstance(node, Not):
        yield from _iter_nodes(node.child)
    elif isinstance(node, Optional_):
        yield from _iter_nodes(node.child)


def test_percolator_fuzz_vs_search_oracle(tmp_path, ray_session):
    """Random standing queries (AND/OR/NOT/phrase/MatchSome/Optional) over
    random docs: percolate's per-doc evaluation must agree exactly with
    indexing the same batch and running each query through the search
    engine — two independent code paths for the same boolean semantics."""
    VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
             "theta", "nosuch1"]
    rng = np.random.default_rng(424242)

    def rand_q(depth):
        k = rng.choice(["tok", "tok", "phrase", "and", "or", "not",
                        "some", "opt"] if depth > 0 else ["tok", "phrase"])
        if k == "tok":
            return str(rng.choice(VOCAB))
        if k == "phrase":
            n = int(rng.integers(2, 4))
            return '"' + " ".join(str(t) for t in rng.choice(VOCAB, n)) + '"'
        if k == "not":
            return f"({rand_q(depth - 1)} NOT {rand_q(0)})"
        if k == "opt":
            return f"({rand_q(depth - 1)} <{str(rng.choice(VOCAB))}>)"
        if k == "some":
            n = int(rng.integers(2, 5))
            kk = int(rng.integers(1, n + 1))
            return ("[" + str(kk) + " "
                    + " ".join(rand_q(0) for _ in range(n)) + "]")
        op = " AND " if k == "and" else " OR "
        n = int(rng.integers(2, 4))
        return "(" + op.join(rand_q(depth - 1) for _ in range(n)) + ")"

    for trial in range(5):
        docs = [" ".join(rng.choice(VOCAB[:8], rng.integers(1, 18)).tolist())
                for _ in range(120)]
        queries = {f"q{qi}": rand_q(2) for qi in range(15)}
        perc = Percolator(queries, tokenizer="simple")
        tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                        "text": pa.array(docs)})
        out = perc(tbl).to_pydict()
        got = set(zip(out["doc_id"], out["query_name"]))
        base = tmp_path / f"perc{trial}"
        base.mkdir()
        pq.write_table(tbl, str(base / "d.parquet"))
        idx = str(base / "idx")
        build_index(str(base / "d.parquet"), idx, content_column="text",
                    tokenizer="simple", positions=True,
                    id_columns=("doc_id",))
        s = LocalSearcher(idx)
        want = set()
        for qid, qs in queries.items():
            for d in s.search(qs, k=0).doc_ids:
                want.add((int(d), qid))
        assert got == want, (trial, sorted(got ^ want)[:6])


# ---------------------------------------------------------------------------
# operator-bearing (parsed) rewrite alternatives — queries_rewrite.h parses
# every alternative with ast_parser (":370-376,:415,:463"), so alternatives
# can be full sub-queries; the translation coefficient follows
# set_rewrite_translation_coeff (queries.cpp:1589-1647): token count over
# an AND-only subtree, bailout (tc=1) for anything else
# ---------------------------------------------------------------------------

def test_rewrite_parsed_alt_structure_and_coefficients():
    from trinity_ray.query.ast import And, Or, Phrase, Token

    # AND-only alternative: 1 -> 3 tokens, tc = 1/3 on every leaf
    rw = rewrite_query(parse_query("cod game", "simple"), 1,
                       lambda g: ["CALL AND OF AND DUTY"]
                       if g == ("COD",) else None)
    sub = next(c for o in rw.children if isinstance(o, Or)
               for c in o.children if isinstance(c, And))
    assert all(isinstance(t, Token) and abs(t.weight - 1 / 3) < 1e-9
               for t in sub.children)

    # OR-bearing alternative: the reference's first walk bails out, every
    # leaf keeps tc=1 (only callback weight x src weight apply)
    rw2 = rewrite_query(parse_query("lotr saga", "simple"), 1,
                        lambda g: [('GANDALF OR "LORD OF THE RINGS"', 0.5)]
                        if g == ("LOTR",) else None)
    leaves = [c for c in _iter_nodes(rw2) if isinstance(c, (Token, Phrase))]
    gand = next(c for c in leaves if isinstance(c, Token)
                and c.term == "GANDALF")
    phr = next(c for c in leaves if isinstance(c, Phrase)
               and c.terms == ("LORD", "OF", "THE", "RINGS"))
    assert gand.weight == 0.5 and phr.weight == 0.5

    # quoted phrase inside an alternative keeps byte-exact terms (the
    # pass-through tokenizer: the callback owns normalization)
    rw3 = rewrite_query(parse_query("scan", "simple"), 1,
                        lambda g: ['"FULL SCAN" OR FULLSCAN']
                        if g == ("SCAN",) else None)
    assert any(isinstance(c, Phrase) and c.terms == ("FULL", "SCAN")
               for c in _iter_nodes(rw3))
    assert any(isinstance(c, Token) and c.term == "FULLSCAN"
               for c in _iter_nodes(rw3))


def test_rewrite_parsed_alt_search_equals_manual(tmp_path, ray_session):
    """Searching a rewrite spliced from an operator-bearing alternative ==
    searching the manually-expanded query (rank-identical ids + scores)."""
    pq.write_table(pa.table({"text": pa.array(DOCS * 40, pa.string())}),
                   str(tmp_path / "d.parquet"), row_group_size=70)
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "d.parquet"), idx, content_column="text",
                tokenizer="simple", positions=True)
    s = LocalSearcher(idx)
    rw = rewrite_query(
        parse_query("quick search", "simple"), 1,
        lambda g: ["FAST OR BROWN"] if g == ("QUICK",) else None)
    manual = parse_query("(quick OR fast OR brown) search", "simple")
    a = s.search(rw, k=20)
    b = s.search(manual, k=20)
    np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
    np.testing.assert_array_equal(a.scores, b.scores)


def test_rewrite_budget_prunes_composite_alternatives():
    """The budget prune key for a composite alternative is its best leaf
    weight; lower-weighted composite alts are pruned first."""
    from trinity_ray.query.ast import Or, Token

    def cb(g):
        if g == ("QUICK",):
            return [("SPEEDY OR RAPID", 0.9), ("HASTY AND SWIFT", 0.2),
                    ("FAST", 0.6)]
        return None

    rw = rewrite_query(parse_query("quick", "simple"), 1, cb, budget=2)
    terms = {c.term for c in _iter_nodes(rw) if isinstance(c, Token)}
    # 0.9-weight OR-alt and 0.6 token survive; 0.2 AND-alt pruned
    assert "SPEEDY" in terms and "RAPID" in terms and "FAST" in terms
    assert "HASTY" not in terms and "SWIFT" not in terms


def test_rewrite_alt_keyword_needs_whitespace_delimiters():
    """'AND-GATE CIRCUIT' is a bare word sequence (hyphen-adjacent AND is
    a term, not the operator) — it must NOT be grammar-parsed into a
    negation."""
    from trinity_ray.query.ast import Phrase

    n = _alt_node("AND-GATE CIRCUIT", 1)
    assert n == Phrase(("AND-GATE", "CIRCUIT"), weight=0.5)


def test_rewrite_alt_trailing_junk_raises():
    with pytest.raises(ValueError, match="unparsed trailing"):
        _alt_node("FOO) BAR", 1)


from trinity_ray.query.rewrite import _alt_node  # noqa: E402
