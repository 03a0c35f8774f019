"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All vectorized map_batches stages; the regex /
tables are compiled once per actor (callable classes)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from trinity_ray.rayutil import actor_pool
from trinity_ray.tokenizer import get_tokenizer

from trinity_ray.tokenizer import WORD_RE as _WORD_RE  # one shared oracle-parity pattern

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
           "was", "with", "as", "on", "be", "at", "by", "this", "have"},
    "de": {"der", "die", "und", "das", "ist", "ein", "zu", "den", "mit",
           "von", "nicht", "auf", "im", "sich", "des", "dem", "ich"},
    "fr": {"le", "la", "les", "et", "des", "un", "une", "est", "dans",
           "que", "qui", "pour", "pas", "sur", "au", "il", "ne", "je"},
    "es": {"el", "la", "los", "las", "y", "de", "que", "en", "un", "una",
           "es", "por", "con", "para", "no", "se", "su", "al", "lo"},
}


class TokenCounter:
    """Adds ``n_tokens`` (whitespace+punct token count) and ``n_bpe_ish``
    (a BPE-ish sub-word count: tokens split at case/digit boundaries)."""

    def __init__(self, text_column: str = "text", tokenizer: str = "simple"):
        self.col = text_column
        self.tokenize = get_tokenizer(tokenizer)
        self.bpe_re = re.compile(
            r"[A-Z]{2,}(?=[A-Z][a-z]|\b)|[A-Z]?[a-z]+|[A-Z]+|[0-9]{1,4}"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.col).to_pylist()
        n_tok = [len(self.tokenize(t or "")) for t in texts]
        n_bpe = [len(self.bpe_re.findall(t or "")) for t in texts]
        return batch.append_column("n_tokens", pa.array(n_tok, pa.int64())) \
                    .append_column("n_bpe_ish", pa.array(n_bpe, pa.int64()))


class QualityScorer:
    """Length / punctuation / stopword-ratio quality features + a combined
    0..1 score; thresholds in the spirit of C4/Gopher-style filters."""

    def __init__(self, text_column: str = "text"):
        self.col = text_column
        self.word_re = _WORD_RE
        self.punct_re = re.compile(r"[^\w\s]")
        self.stop = _LANG_PROFILES["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.col).to_pylist()
        n = len(texts)
        n_chars = np.empty(n, np.int64)
        n_words = np.empty(n, np.int64)
        mean_wlen = np.empty(n, np.float64)
        punct_ratio = np.empty(n, np.float64)
        stop_ratio = np.empty(n, np.float64)
        for i, t in enumerate(texts):
            t = t or ""
            words = self.word_re.findall(t)
            lw = [w for w in words]
            n_chars[i] = len(t)
            n_words[i] = len(words)
            mean_wlen[i] = (sum(len(w) for w in words) / len(words)) if words else 0.0
            punct_ratio[i] = len(self.punct_re.findall(t)) / max(1, len(t))
            stop_ratio[i] = (sum(1 for w in lw if w.lower() in self.stop)
                             / max(1, len(words)))
        # combined heuristic score: in-range word stats, some stopwords
        score = (
            np.clip(n_words / 50.0, 0, 1) * 0.25
            + np.where((mean_wlen >= 3) & (mean_wlen <= 10), 0.25, 0.0)
            + np.clip(stop_ratio / 0.2, 0, 1) * 0.25
            + np.where(punct_ratio < 0.2, 0.25, 0.0)
        )
        return (batch
                .append_column("n_chars_q", pa.array(n_chars, pa.int64()))
                .append_column("n_words", pa.array(n_words, pa.int64()))
                .append_column("mean_word_len", pa.array(mean_wlen, pa.float64()))
                .append_column("punct_ratio", pa.array(punct_ratio, pa.float64()))
                .append_column("stop_ratio", pa.array(stop_ratio, pa.float64()))
                .append_column("quality_score", pa.array(score, pa.float64())))


class LangId:
    """Stopword/character n-gram heuristic language ID (no external models).
    Emits ``lang_pred`` and ``lang_conf``."""

    def __init__(self, text_column: str = "text"):
        self.col = text_column
        self.word_re = _WORD_RE
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.col).to_pylist()
        preds, confs = [], []
        for t in texts:
            words = [w.lower() for w in self.word_re.findall(t or "")][:2000]
            if not words:
                preds.append("und")
                confs.append(0.0)
                continue
            best, best_hits = "und", 0
            for lang, prof in self.profiles.items():
                hits = sum(1 for w in words if w in prof)
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best if best_hits else "und")
            confs.append(best_hits / len(words))
        return batch.append_column("lang_pred", pa.array(preds, pa.string())) \
                    .append_column("lang_conf", pa.array(confs, pa.float64()))


class Fingerprinter:
    """64-bit rolling-hash document fingerprint over the token stream
    (order-sensitive, whitespace-insensitive): poly rolling hash mod 2^61-1."""

    MOD = (1 << 61) - 1
    BASE = 1_000_003

    def __init__(self, text_column: str = "text", tokenizer: str = "simple"):
        self.col = text_column
        self.tokenize = get_tokenizer(tokenizer)

    def fingerprint(self, text: str) -> int:
        import zlib

        h = 0
        for tok in self.tokenize(text or ""):
            th = zlib.crc32(tok.encode())  # process-stable, unlike hash()
            h = (h * self.BASE + th) % self.MOD
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self.fingerprint(t) for t in batch.column(self.col).to_pylist()]
        return batch.append_column("fingerprint", pa.array(fps, pa.uint64()))


class MinShingleFingerprinter:
    """MinHash-style document fingerprint: the lexicographic minimum of
    md5(k-token shingle) over the token stream — order-sensitive through
    the shingles, whitespace-insensitive, and exactly SQL-expressible
    (DuckDB min(md5(...)) over list slices), unlike the crc32 rolling
    hash.  Docs with fewer than k tokens hash the whole joined stream."""

    def __init__(self, text_column: str = "text", tokenizer: str = "simple",
                 k: int = 8):
        self.col = text_column
        self.tokenize = get_tokenizer(tokenizer)
        self.k = k

    def fingerprint(self, text: str) -> str:
        toks = self.tokenize(text or "")
        if len(toks) < self.k:
            return hashlib.md5(" ".join(toks).encode()).hexdigest()
        return min(hashlib.md5(" ".join(toks[i:i + self.k]).encode()
                               ).hexdigest()
                   for i in range(len(toks) - self.k + 1))

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self.fingerprint(t) for t in batch.column(self.col).to_pylist()]
        return batch.append_column("fp_md5", pa.array(fps, pa.string()))


def min_shingle_fingerprint(ds, text_column: str = "text",
                            tokenizer: str = "simple", k: int = 8,
                            batch_size: int = 2048,
                            concurrency: int | None = None):
    kwargs = {} if concurrency is None else {"concurrency": actor_pool(concurrency)}
    return ds.map_batches(MinShingleFingerprinter, fn_constructor_kwargs=dict(
        text_column=text_column, tokenizer=tokenizer, k=k),
        batch_format="pyarrow", batch_size=batch_size, **_act(kwargs))


def token_count(ds, text_column: str = "text", tokenizer: str = "simple",
                batch_size: int = 2048, concurrency: int | None = None):
    kwargs = {} if concurrency is None else {"concurrency": actor_pool(concurrency)}
    return ds.map_batches(TokenCounter, fn_constructor_kwargs=dict(
        text_column=text_column, tokenizer=tokenizer),
        batch_format="pyarrow", batch_size=batch_size, **_act(kwargs))


def quality_score(ds, text_column: str = "text", batch_size: int = 2048,
                  concurrency: int | None = None):
    kwargs = {} if concurrency is None else {"concurrency": actor_pool(concurrency)}
    return ds.map_batches(QualityScorer, fn_constructor_kwargs=dict(
        text_column=text_column),
        batch_format="pyarrow", batch_size=batch_size, **_act(kwargs))


def lang_id(ds, text_column: str = "text", batch_size: int = 2048,
            concurrency: int | None = None):
    kwargs = {} if concurrency is None else {"concurrency": actor_pool(concurrency)}
    return ds.map_batches(LangId, fn_constructor_kwargs=dict(
        text_column=text_column),
        batch_format="pyarrow", batch_size=batch_size, **_act(kwargs))


def fingerprint(ds, text_column: str = "text", tokenizer: str = "simple",
                batch_size: int = 2048, concurrency: int | None = None):
    kwargs = {} if concurrency is None else {"concurrency": actor_pool(concurrency)}
    return ds.map_batches(Fingerprinter, fn_constructor_kwargs=dict(
        text_column=text_column, tokenizer=tokenizer),
        batch_format="pyarrow", batch_size=batch_size, **_act(kwargs))


def _act(kwargs: dict) -> dict:
    from trinity_ray.rayutil import package_runtime_env

    out = dict(kwargs)
    out.setdefault("concurrency", 2)
    out["runtime_env"] = package_runtime_env()
    return out


class _PartialTermCounts:
    """Per-batch combiner: tokenize, count WITHIN the batch, emit one
    (term, cnt) row per DISTINCT term — the partial/combiner side of the
    vocabulary aggregate.  Only distinct-term partials reach the shuffle,
    so the groupby moves ~vocabulary-sized data, not ~corpus-sized."""

    def __init__(self, text_column: str, tokenizer: str):
        self.col = text_column
        self.tokenize = get_tokenizer(tokenizer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column(self.col).to_pylist():
            c.update(self.tokenize(t or ""))
        if not c:
            return pa.table({"term": pa.array([], pa.large_string()),
                             "cnt": pa.array([], pa.int64())})
        terms, cnts = zip(*c.items())
        return pa.table({"term": pa.array(terms, pa.large_string()),
                         "cnt": pa.array(cnts, pa.int64())})


class _PartialTermDocCounts:
    """Per-batch combiner for DOCUMENT frequency: one (term, df) row per
    distinct term with the number of batch docs containing it.  Exact
    under composition because a document never splits across batches, so
    per-batch distinct-doc counts sum to the global distinct-doc count."""

    def __init__(self, text_column: str, tokenizer: str):
        self.col = text_column
        self.tokenize = get_tokenizer(tokenizer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column(self.col).to_pylist():
            c.update(set(self.tokenize(t or "")))
        if not c:
            return pa.table({"term": pa.array([], pa.large_string()),
                             "df": pa.array([], pa.int64())})
        terms, dfs = zip(*c.items())
        return pa.table({"term": pa.array(terms, pa.large_string()),
                         "df": pa.array(dfs, pa.int64())})


def _doc_freqs(ds, *, text_column: str, tokenizer: str,
               batch_size: int) -> dict[str, int]:
    """Global term -> document frequency: batch-local distinct-doc
    combiner -> vocabulary-sized groupby(term).sum -> driver dict (the
    same broadcast-a-vocabulary shape as lm_surprisal's unigram model)."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        _PartialTermDocCounts,
        fn_constructor_kwargs=dict(text_column=text_column,
                                   tokenizer=tokenizer),
        batch_format="pyarrow", batch_size=batch_size, **_act({}))
    vocab = partials.groupby("term").aggregate(
        Sum("df", alias_name="df")).to_pandas()
    return dict(zip(vocab["term"], vocab["df"].astype(int)))


def term_cooccurrence(ds, *, top: int = 20, min_df: int = 2,
                      text_column: str = "text", tokenizer: str = "simple",
                      batch_size: int = 2048):
    """Top-``top`` co-occurring term pairs ranked by lift
    ``n_ab * N / (n_a * n_b)`` — the PMI ranking (PMI = ln(lift), a
    monotone transform, so ranking by the rational lift avoids any
    cross-engine libm-log divergence).  The standard collocation /
    topic-seed signal over a training corpus.

    Returns a pyarrow Table ``(term_a, term_b, n_ab, n_a, n_b, lift_r)``
    with ``term_a < term_b``, ``n_*`` document frequencies, and ``lift_r``
    the lift rounded half-away at 4 dp (the repo's float-oracle
    convention); rows ordered by (lift desc, term_a, term_b).

    Scale shape: document frequencies are the vocabulary-sized broadcast
    from :func:`_doc_freqs`; pair counting explodes each doc's DISTINCT
    eligible terms (df >= min_df prunes the tail, which is what unbounds
    the pair space) through a batch-local Counter combiner, so the one
    ``groupby(term_a, term_b)`` exchange moves distinct-pair partials
    bounded by the eligible vocabulary squared — never corpus rows.  The
    per-doc pair explode is itertools.combinations over at most
    |eligible vocab| terms; corpora whose docs contain thousands of
    distinct eligible terms need a higher ``min_df``."""
    from itertools import combinations

    import ray
    from ray.data.aggregate import Sum

    dfs = _doc_freqs(ds, text_column=text_column, tokenizer=tokenizer,
                     batch_size=batch_size)
    n_docs = int(ds.count())
    eligible = {t: d for t, d in dfs.items() if d >= int(min_df)}
    elig_ref = ray.put(eligible)
    tok = get_tokenizer(tokenizer)

    def pair_partials(batch: pa.Table) -> pa.Table:
        from collections import Counter

        elig = ray.get(elig_ref)
        c: Counter = Counter()
        for t in batch.column(text_column).to_pylist():
            terms = sorted({tk for tk in tok(t or "") if tk in elig})
            c.update(combinations(terms, 2))
        if not c:
            return pa.table({"term_a": pa.array([], pa.large_string()),
                             "term_b": pa.array([], pa.large_string()),
                             "n_ab": pa.array([], pa.int64())})
        pairs_k, cnts = zip(*c.items())
        return pa.table({
            "term_a": pa.array([p[0] for p in pairs_k], pa.large_string()),
            "term_b": pa.array([p[1] for p in pairs_k], pa.large_string()),
            "n_ab": pa.array(cnts, pa.int64()),
        })

    from trinity_ray.rayutil import package_runtime_env

    totals = ds.map_batches(pair_partials, batch_format="pyarrow",
                            batch_size=batch_size,
                            runtime_env=package_runtime_env()) \
        .groupby(["term_a", "term_b"]).aggregate(
            Sum("n_ab", alias_name="n_ab")).to_pandas()
    if len(totals) == 0:
        return pa.table({"term_a": pa.array([], pa.string()),
                         "term_b": pa.array([], pa.string()),
                         "n_ab": pa.array([], pa.int64()),
                         "n_a": pa.array([], pa.int64()),
                         "n_b": pa.array([], pa.int64()),
                         "lift_r": pa.array([], pa.float64())})
    n_a = totals["term_a"].map(eligible).to_numpy(dtype=np.int64)
    n_b = totals["term_b"].map(eligible).to_numpy(dtype=np.int64)
    n_ab = totals["n_ab"].to_numpy(dtype=np.int64)
    # double ops in the same order as the SQL oracle: (n_ab * N) / (n_a*n_b)
    # — every step exactly rounded IEEE, so selection/order match bit-wise
    lift = (n_ab.astype(np.float64) * float(n_docs)) / \
        (n_a * n_b).astype(np.float64)
    out = totals.assign(n_a=n_a, n_b=n_b, lift=lift).sort_values(
        ["lift", "term_a", "term_b"], ascending=[False, True, True],
        kind="stable").head(int(top))
    return pa.table({
        "term_a": pa.array(out["term_a"], pa.string()),
        "term_b": pa.array(out["term_b"], pa.string()),
        "n_ab": pa.array(out["n_ab"].to_numpy(dtype=np.int64), pa.int64()),
        "n_a": pa.array(out["n_a"].to_numpy(dtype=np.int64), pa.int64()),
        "n_b": pa.array(out["n_b"].to_numpy(dtype=np.int64), pa.int64()),
        "lift_r": pa.array(
            np.floor(out["lift"].to_numpy() * 1e4 + 0.5) / 1e4, pa.float64()),
    })


def keywords_tfdf(ds, *, k: int = 3, text_column: str = "text",
                  id_column: str = "doc_id", tokenizer: str = "simple",
                  batch_size: int = 2048):
    """Per-document keyword extraction: the top-``k`` terms by burstiness
    ``tf / df`` (term frequency in the doc over corpus document
    frequency — the tf-idf family with a rational weight, chosen over
    ``tf*ln(N/df)`` because one IEEE division is bit-identical across
    engines while libm logs are not; the ranking intent is the same).
    Ties break by term ascending.  Output rows:
    ``(<id_column>, term, tf, df, kw_r)`` with ``kw_r`` rounded
    half-away at 4 dp.

    Scale shape: document frequencies broadcast once (vocabulary-sized);
    scoring + per-doc top-k run entirely inside a stateless
    ``map_batches`` (a document never splits across batches), so there is
    no shuffle beyond the df aggregate."""
    import ray

    dfs = _doc_freqs(ds, text_column=text_column, tokenizer=tokenizer,
                     batch_size=batch_size)
    dfs_ref = ray.put(dfs)
    tok = get_tokenizer(tokenizer)
    kk = int(k)

    def extract(batch: pa.Table) -> pa.Table:
        from collections import Counter

        dmap = ray.get(dfs_ref)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        out_id, out_t, out_tf, out_df, out_s = [], [], [], [], []
        for i, t in enumerate(batch.column(text_column).to_pylist()):
            tf = Counter(tok(t or ""))
            if not tf:
                continue
            scored = sorted(
                ((-(float(c) / float(dmap[term])), term, c, dmap[term])
                 for term, c in tf.items()))[:kk]
            for neg_s, term, c, d in scored:
                out_id.append(int(ids[i]))
                out_t.append(term)
                out_tf.append(int(c))
                out_df.append(int(d))
                out_s.append(np.floor(-neg_s * 1e4 + 0.5) / 1e4)
        return pa.table({
            id_column: pa.array(out_id, pa.int64()),
            "term": pa.array(out_t, pa.string()),
            "tf": pa.array(out_tf, pa.int64()),
            "df": pa.array(out_df, pa.int64()),
            "kw_r": pa.array(out_s, pa.float64()),
        })

    from trinity_ray.rayutil import package_runtime_env

    return ds.map_batches(extract, batch_format="pyarrow",
                          batch_size=batch_size,
                          runtime_env=package_runtime_env())


def top_terms(ds, k: int = 100, text_column: str = "text",
              tokenizer: str = "simple", batch_size: int = 4096,
              concurrency: int | None = None):
    """Exact corpus-wide heavy hitters: the ``k`` most frequent terms
    (ties broken by term ascending — deterministic and SQL-matchable).

    Shape: batch-local Counter combiner -> groupby(term).sum over
    distinct-term partials (the only shuffle, vocabulary-sized) -> sort
    (cnt desc, term asc) -> limit(k).  The final sort is over the distinct
    vocabulary, orders of magnitude smaller than the corpus; for vocab
    building (BPE training, stopword lists) this is the standard first
    pass."""
    from ray.data.aggregate import Sum

    kwargs = {} if concurrency is None else {"concurrency": actor_pool(concurrency)}
    partials = ds.map_batches(_PartialTermCounts, fn_constructor_kwargs=dict(
        text_column=text_column, tokenizer=tokenizer),
        batch_format="pyarrow", batch_size=batch_size, **_act(kwargs))
    totals = partials.groupby("term").aggregate(Sum("cnt", alias_name="cnt"))
    return totals.sort(key=["cnt", "term"],
                       descending=[True, False]).limit(int(k))


class _RepetitionStats:
    """Gopher-style repetition signals: the fraction of tokens covered by
    the single most frequent token, and the fraction of bigrams covered by
    the most frequent bigram.  Boilerplate / template spam scores high on
    both; used as a drop rule in large-corpus curation."""

    def __init__(self, text_column: str):
        self.col = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        texts = batch.column(self.col).to_pylist()
        n = len(texts)
        top_tok = np.zeros(n, np.float64)
        top_bi = np.zeros(n, np.float64)
        for i, t in enumerate(texts):
            toks = _WORD_RE.findall((t or "").upper())
            if toks:
                c = Counter(toks)
                top_tok[i] = max(c.values()) / len(toks)
            if len(toks) >= 2:
                b = Counter(zip(toks, toks[1:]))
                top_bi[i] = max(b.values()) / (len(toks) - 1)
        # half-away-from-zero at 4 dp (values >= 0) — DuckDB round() parity;
        # np.round's banker's rounding differs on exact .00005 ties
        r4 = lambda x: np.floor(x * 1e4 + 0.5) / 1e4
        return batch.append_column(
            "top_token_frac", pa.array(r4(top_tok), pa.float64())
        ).append_column(
            "top_bigram_frac", pa.array(r4(top_bi), pa.float64()))


def repetition_stats(ds, text_column: str = "text", batch_size: int = 2048,
                     concurrency: int | None = None):
    kwargs = {} if concurrency is None else {"concurrency": actor_pool(concurrency)}
    return ds.map_batches(_RepetitionStats, fn_constructor_kwargs=dict(
        text_column=text_column),
        batch_format="pyarrow", batch_size=batch_size, **_act(kwargs))


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# RE2-syntax patterns (pyarrow.compute and DuckDB both run RE2, so an
# oracle can replay the exact same replacements).  Order matters: emails
# before phones (an email's digits must not be half-eaten as a phone).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\-() ]{7,}\d", "<PHONE>"),
)


def scrub_pii(ds, *, text_column: str = "text",
              patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
              out_column: str | None = None):
    """Mask PII spans (emails, IPv4s, phone-ish digit runs) with typed
    placeholder tokens — the redaction stage of a training-data pipeline.

    Fully vectorized: each pattern is ONE Arrow C++ RE2 pass over the
    batch (pc.count_substring_regex + pc.replace_substring_regex); no
    Python per row.  Appends ``n_pii_<kind>`` count columns (counted
    BEFORE that pattern's replacement, after the previous patterns') and
    replaces/creates the text column.  Patterns apply in order, so
    e.g. an email is masked before the phone pattern could eat its
    digits."""
    out_col = out_column or text_column

    def scrub(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch.column(text_column), pa.large_string())
        counts = []
        for kind, pat, repl in patterns:
            counts.append((kind, pc.count_substring_regex(txt, pat)))
            txt = pc.replace_substring_regex(txt, pat, repl)
        # drop any pre-existing output columns (re-scrubbing an already
        # scrubbed dataset must replace, not duplicate, n_pii_* columns)
        stale = [c for c in ([out_col]
                             + [f"n_pii_{kind}" for kind, _, _ in patterns])
                 if c in batch.column_names]
        if stale:
            batch = batch.drop_columns(stale)
        batch = batch.append_column(out_col, pc.cast(txt, pa.string()))
        for kind, c in counts:
            batch = batch.append_column(f"n_pii_{kind}",
                                        pc.cast(c, pa.int64()))
        return batch

    return ds.map_batches(scrub, batch_format="pyarrow")


def lm_surprisal(ds, *, text_column: str = "text", id_column: str = "doc_id",
                 tokenizer: str = "simple", batch_size: int = 2048):
    """CCNet-style unigram language-model quality signal: per-document
    mean token surprisal ``ln(total) - mean(ln(count(token)))`` under the
    corpus's own unigram distribution — low = fluent/common wording,
    high = rare-token soup; the standard cheap proxy used to rank or
    filter web text before the expensive model-based scorer.  Output:
    ``(<id_column>, n_tokens, surprisal_r)`` with the score rounded to 4
    decimals (the repo's float-oracle convention).  Token-less documents
    emit no row.  Out-of-vocabulary tokens (scoring a corpus the model
    was not trained on) fall back to count 1.

    Scale shape: the unigram model is the vocabulary-sized
    ``groupby(term)`` already used for vocab building, broadcast once via
    ``ray.put``; scoring is a stateless ``map_batches`` over docs (no
    further shuffle).  For vocabularies too large to broadcast, the
    documented alternative is a token→count semi-join, same shape as the
    dedup verify fallback."""
    import ray
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        _PartialTermCounts,
        fn_constructor_kwargs=dict(text_column=text_column,
                                   tokenizer=tokenizer),
        batch_format="pyarrow", batch_size=batch_size, **_act({}))
    vocab = partials.groupby("term").aggregate(
        Sum("cnt", alias_name="cnt")).to_pandas()
    counts = dict(zip(vocab["term"], vocab["cnt"].astype(int)))
    log_total = float(np.log(float(vocab["cnt"].sum())))
    cnt_ref = ray.put(counts)
    tok = get_tokenizer(tokenizer)

    def score(batch: pa.Table) -> pa.Table:
        c = ray.get(cnt_ref)
        get = c.get
        texts = batch.column(text_column).to_pylist()
        out_i, out_n, out_s = [], [], []
        # half-away-from-zero at 4 dp — DuckDB round() parity (same form
        # as _RepetitionStats; Python round() banker's-rounds ties)
        for i, t in enumerate(texts):
            toks = tok(t or "")
            if not toks:
                continue
            logs = np.log(np.fromiter((get(tk, 1) for tk in toks),
                                      dtype=np.float64, count=len(toks)))
            s = log_total - float(np.mean(logs))
            out_i.append(i)
            out_n.append(len(toks))
            out_s.append(np.floor(s * 1e4 + 0.5) / 1e4)
        return pa.table({
            id_column: batch.column(id_column).take(
                pa.array(out_i, pa.int64())),
            "n_tokens": pa.array(out_n, pa.int64()),
            "surprisal_r": pa.array(out_s, pa.float64()),
        })

    from trinity_ray.rayutil import package_runtime_env

    return ds.map_batches(score, batch_format="pyarrow",
                          batch_size=batch_size,
                          runtime_env=package_runtime_env())


def bpe_train(ds, *, n_merges: int = 100, text_column: str = "text",
              tokenizer: str = "simple", min_pair_freq: int = 2):
    """Train a byte-pair-encoding merge table over the corpus.

    Standard BPE training operates on the WORD-FREQUENCY table, not the
    corpus (Sennrich et al. 2015; HuggingFace tokenizers do the same):
    the distributed part is the vocabulary-sized ``groupby(term)`` word
    count this module already uses, and the merge loop then runs locally
    over that table — symbol-pair counts weighted by word frequency,
    highest count merges first (ties: lexicographically smallest pair),
    stopping early when no pair reaches ``min_pair_freq``.

    Returns a pyarrow Table ``(rank, left, right, freq)`` — the merge
    list in application order.  Deterministic for a given corpus.  Not
    SQL-expressible (iterative re-segmentation), so correctness is
    pinned by hand-worked unit tests rather than a DuckDB oracle.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        _PartialTermCounts,
        fn_constructor_kwargs=dict(text_column=text_column,
                                   tokenizer=tokenizer),
        batch_format="pyarrow", batch_size=2048, **_act({}))
    vocab = partials.groupby("term").aggregate(
        Sum("cnt", alias_name="cnt")).to_pandas()

    # word -> (symbol tuple, freq): each word is its own sequence, so
    # merges never cross word boundaries (no Sennrich-style </w> marker —
    # word-final subwords are NOT distinguished from word-internal ones)
    words = [(tuple(term), int(cnt))
             for term, cnt in zip(vocab["term"], vocab["cnt"])
             if len(term) > 0]
    merges = []
    for rank in range(int(n_merges)):
        pairs: Counter = Counter()
        for syms, freq in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        # max count, ties broken by the lexicographically smallest pair
        best, best_freq = min(pairs.items(),
                              key=lambda kv: (-kv[1], kv[0]))
        if best_freq < int(min_pair_freq):
            break
        merges.append((rank, best[0], best[1], best_freq))
        a, b, ab = best[0], best[1], best[0] + best[1]
        out = []
        for syms, freq in words:
            if len(syms) >= 2:
                merged, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        merged.append(ab)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                syms = tuple(merged)
            out.append((syms, freq))
        words = out
    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "freq": pa.array([m[3] for m in merges], pa.int64()),
    })


def bpe_encode(ds, merges, *, text_column: str = "text",
               id_column: str = "doc_id", tokenizer: str = "simple",
               batch_size: int = 2048):
    """Apply a BPE merge table to the corpus: per document, segment each
    word into symbols and greedily apply merges in RANK order (the
    canonical BPE encode).  Output: ``(<id_column>, n_words, n_bpe,
    bpe_ratio_r)`` — subword fertility per doc, the number a tokenizer
    owner actually monitors.  ``merges``: the table from
    :func:`bpe_train` (or any (rank, left, right) rows).

    Scale shape: the merge table is tiny and broadcast once via
    ``ray.put``; encoding is a stateless ``map_batches``; per-word encode
    results are memoized per batch (Zipf makes the hit rate high)."""
    import ray

    if isinstance(merges, pa.Table):
        mlist = sorted(zip(merges.column("rank").to_pylist(),
                           merges.column("left").to_pylist(),
                           merges.column("right").to_pylist()))
    else:
        mlist = sorted(merges)
    ranks = {(l, r): k for k, l, r in mlist}
    rank_ref = ray.put(ranks)
    tok = get_tokenizer(tokenizer)

    def encode_word(word: str, ranks: dict, cache: dict) -> int:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word)
        while len(syms) >= 2:
            # lowest-rank applicable merge anywhere in the word
            best_i, best_rank = -1, None
            for i in range(len(syms) - 1):
                rk = ranks.get((syms[i], syms[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_i, best_rank = i, rk
            if best_rank is None:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = len(syms)
        return len(syms)

    def encode(batch: pa.Table) -> pa.Table:
        ranks = ray.get(rank_ref)
        cache: dict = {}
        texts = batch.column(text_column).to_pylist()
        n_words = np.empty(len(texts), np.int64)
        n_bpe = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            ws = tok(t or "")
            n_words[i] = len(ws)
            n_bpe[i] = sum(encode_word(w, ranks, cache) for w in ws)
        ratio = np.where(n_words > 0, n_bpe / np.maximum(n_words, 1), 0.0)
        ratio = np.floor(ratio * 1e4 + 0.5) / 1e4     # round-4 convention
        return pa.table({
            id_column: batch.column(id_column),
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe": pa.array(n_bpe, pa.int64()),
            "bpe_ratio_r": pa.array(ratio, pa.float64()),
        })

    from trinity_ray.rayutil import package_runtime_env

    return ds.map_batches(encode, batch_format="pyarrow",
                          batch_size=batch_size,
                          runtime_env=package_runtime_env())


def normalize_text(ds, *, text_column: str = "text",
                   id_column: str = "doc_id"):
    """Canonical text normalization — the first cleaning pass of a corpus
    pipeline: Unicode NFC, strip ASCII control characters (keeping
    tab/newline/CR only long enough for the whitespace collapse), collapse
    ASCII whitespace runs to single spaces, trim.  Output:
    ``(<id_column>, text_norm, changed)``.

    ASCII rows (the overwhelming majority of a source-code corpus) stay
    on pure Arrow kernels end to end — ASCII is NFC-invariant, detected
    vectorized with ``string_is_ascii`` — and only the rare non-ASCII
    rows pay a Python ``unicodedata.normalize`` call (pyarrow 16's
    ``utf8_normalize`` does not COMPOSE, so it cannot express NFC parity
    with DuckDB's utf8proc).  The regex engine is RE2 on both sides of
    the oracle, so the transform is exactly SQL-reproducible.  The
    whitespace class is explicit ASCII ``[ \\t\\n\\r\\f\\v]`` — Python's
    ``\\s`` would disagree with RE2 on Unicode spaces."""
    import unicodedata

    ctl = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
    ws = "[ \t\n\r\f\v]+"

    def norm(batch: pa.Table) -> pa.Table:
        raw = pc.fill_null(batch.column(text_column), "")
        if pc.min(pc.string_is_ascii(raw)).as_py() is False:
            t = pa.array([unicodedata.normalize("NFC", v) if v else v
                          for v in raw.to_pylist()], pa.string())
        else:
            t = raw                      # ASCII is NFC-invariant
        t = pc.replace_substring_regex(t, ctl, "")
        t = pc.replace_substring_regex(t, ws, " ")
        t = pc.utf8_trim(t, " ")
        return pa.table({
            id_column: batch.column(id_column),
            "text_norm": t,
            "changed": pc.not_equal(t, raw),
        })

    from trinity_ray.rayutil import package_runtime_env

    return ds.map_batches(norm, batch_format="pyarrow",
                          runtime_env=package_runtime_env())
