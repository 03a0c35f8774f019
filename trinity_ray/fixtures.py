"""Deterministic synthetic source-code corpus + reference query set
(FIXTURES.md §1-2).  Seeded; same tables at any parallelism.  No external
data.  The corpus shape is the authoritative input_hint schema:
(repo, path, commit, lang, content).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["python", "c", "cpp", "go", "java", "js"]
EXT = {"python": "py", "c": "c", "cpp": "cc", "go": "go", "java": "java", "js": "js"}

_KEYWORDS = {
    "python": ["def", "return", "import", "class", "self", "for", "in", "if",
               "else", "while", "range", "lambda", "yield", "None", "True"],
    "c": ["include", "int", "char", "return", "void", "struct", "static",
          "const", "sizeof", "malloc", "free", "while", "for", "if"],
    "cpp": ["include", "namespace", "template", "class", "return", "const",
            "virtual", "override", "std", "vector", "string", "auto"],
    "go": ["func", "return", "package", "import", "defer", "go", "chan",
           "struct", "interface", "range", "select", "var"],
    "java": ["public", "class", "static", "void", "return", "import",
             "private", "final", "extends", "implements", "new", "throws"],
    "js": ["function", "return", "const", "let", "var", "async", "await",
           "export", "import", "class", "this", "new"],
}

_IDENT_STEMS = [
    "parse", "build", "index", "merge", "query", "token", "batch", "block",
    "stream", "buffer", "cache", "shard", "score", "rank", "fetch", "store",
    "encode", "decode", "hash", "sort", "scan", "filter", "reduce", "map",
    "split", "join", "flush", "commit", "load", "dump", "emit", "visit",
]
_IDENT_SUFFIX = ["er", "ctx", "impl", "util", "node", "info", "data", "spec",
                 "state", "entry", "table", "group", "chunk", "frame"]

# planted rare terms: appear in exactly a handful of docs
PLANTED_RARE = ["xylophone77", "quixotic42", "zanzibar9", "ephemeralglyph"]
# planted phrases: adjacent token runs for phrase queries
PLANTED_PHRASES = [
    ["rosetta", "stone", "cipher"],
    ["amber", "falcon", "nest", "watch"],
    ["velvet", "compiler", "dusk"],
]
# tokenizer edge cases sprinkled into comments (queries.cpp:2098-2341 behaviors)
EDGE_SNIPPETS = [
    "I.B.M mainframe",
    "see site:x-box.com docs",
    "version 9.000 or 8.25",
    "John's parser",
    "d&d style",
    "C++ bindings and C# interop",
    "x-men pre-processing pass",
    "L'Oreal demo",
]

REFERENCE_QUERIES: list[tuple[str, str, str]] = [
    # (query_id-ish name, kind, text) — required coverage per FIXTURES.md §2
    ("q_rare_term", "term", "xylophone77"),
    ("q_hot_term", "term", "return"),
    ("q_implicit_and", "and", "parse buffer commit"),
    ("q_strict_and", "and", "encode AND decode"),
    ("q_or", "or", "xylophone77 OR quixotic42 OR zanzibar9"),
    ("q_or_group_and", "mixed", "(merge OR split) cache"),
    ("q_not", "not", "index NOT python"),
    ("q_minus", "not", "query -js"),
    ("q_phrase2", "phrase", '"rosetta stone"'),
    ("q_phrase3", "phrase", '"rosetta stone cipher"'),
    ("q_phrase4", "phrase", '"amber falcon nest watch"'),
    ("q_mixed", "mixed", '"velvet compiler" OR (shard NOT go)'),
    ("q_unknown", "term", "definitelynotaterm12345"),
    ("q_unknown_and", "and", "parse definitelynotaterm12345"),
    ("q_unknown_or", "or", "parse OR definitelynotaterm12345"),
    ("q_match_some", "match_some", "[2 parse merge query flush]"),
    ("q_optional", "mixed", "<score> rank"),
    ("q_edge_cpp", "term", "C++"),
    ("q_edge_acronym", "term", "I.B.M"),
    ("q_edge_site", "term", "site:x-box.com"),
]


def make_corpus_table(n_docs: int, seed: int = 42, base: int = 0) -> pa.Table:
    """Deterministic corpus slice of ``n_docs`` rows starting at row ``base``."""
    rng = np.random.default_rng(seed + base)
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(base, base + n_docs):
        lang = LANGS[i % len(LANGS)]
        repo = f"org{i % 40}/repo{i % 173}"
        path = f"src/pkg{i % 23}/mod{i % 97}.{EXT[lang]}"
        commit = hashlib.sha1(f"42:{repo}:{path}:{i}".encode()).hexdigest()
        contents.append(_make_content(rng, i, lang))
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
    return pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.string()),
    })


def _make_content(rng: np.random.Generator, i: int, lang: str) -> str:
    kws = _KEYWORDS[lang]
    n_lines = int(rng.integers(8, 40))
    lines = []
    for _ in range(n_lines):
        n_words = int(rng.integers(3, 10))
        words = []
        for _ in range(n_words):
            r = rng.random()
            if r < 0.45:
                words.append(kws[int(rng.integers(0, len(kws)))])
            elif r < 0.9:
                words.append(
                    _IDENT_STEMS[int(rng.integers(0, len(_IDENT_STEMS)))]
                    + "_"
                    + _IDENT_SUFFIX[int(rng.integers(0, len(_IDENT_SUFFIX)))]
                )
            else:
                words.append(str(int(rng.integers(0, 5000))))
        lines.append(" ".join(words))
    # planted rare terms in ~1/200 docs each (deterministic by doc number)
    for j, t in enumerate(PLANTED_RARE):
        if i % 211 == j * 13 % 211:
            lines.append(f"// marker {t} here")
    # planted phrases in ~1/40 docs
    for j, ph in enumerate(PLANTED_PHRASES):
        if i % 37 == j * 11 % 37:
            lines.append("/* " + " ".join(ph) + " */")
    # tokenizer edge cases in ~1/25 docs
    if i % 25 == 7:
        lines.append("// " + EDGE_SNIPPETS[i % len(EDGE_SNIPPETS)])
    return "\n".join(lines)


def write_corpus(
    out_dir: str,
    n_docs: int,
    n_files: int = 4,
    seed: int = 42,
    row_group_size: int = 2048,
) -> list[str]:
    """Write the corpus as ``n_files`` parquet files (the partitioning unit).

    Deterministic: file f holds rows [f*chunk, ...) — identical bytes at any
    build parallelism, which is what makes docID assignment reproducible.
    """
    os.makedirs(out_dir, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    paths = []
    base = 0
    for f in range(n_files):
        n = min(per, n_docs - base)
        if n <= 0:
            break
        tbl = make_corpus_table(n, seed=seed, base=base)
        p = os.path.join(out_dir, f"corpus-{f:04d}.parquet")
        pq.write_table(tbl, p, row_group_size=row_group_size)
        paths.append(p)
        base += n
    return paths
