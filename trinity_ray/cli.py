"""Command-line entry point — the ``ray job submit`` surface.

    ray job submit -- python -m trinity_ray build  --input corpus/ --index idx/
    ray job submit -- python -m trinity_ray merge  --index idx/ --out merged/
    ray job submit -- python -m trinity_ray search --index idx/ --query 'a AND b'
    ray job submit -- python -m trinity_ray percolate --input corpus/ \
        --query name1='a AND b' --query name2='"x y"' --out matches/
    ray job submit -- python -m trinity_ray ann --embeddings emb.parquet \
        --method ivfpq --query-id 7 -k 10

On a cluster, ``ray job submit`` sets RAY_ADDRESS and the driver connects to
the running cluster; standalone, Ray auto-initialises in local mode.  The
library itself never calls ray.init() — only this CLI owns the session, and
only when one isn't already provided (guarded init per the driver contract).
"""

from __future__ import annotations

import argparse
import os
import json
import sys


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")


def cmd_build(args: argparse.Namespace) -> int:
    from trinity_ray.index.build import build_index
    from trinity_ray.sources import stage_corpus

    _ensure_ray()
    # JSONL/CSV corpora stage once into Parquet (idempotent, DONE-marker
    # committed); Parquet inputs pass through with no staging cost
    corpus = stage_corpus(
        args.input,
        args.staging or os.path.join(args.index, "staging"),
        format=args.format)
    manifest = build_index(
        corpus, args.index,
        content_column=args.content_column,
        id_columns=tuple(args.id_columns or ()),
        tokenizer=args.tokenizer,
        positions=not args.no_positions,
        target_rows_per_partition=args.target_rows,
        concurrency=args.concurrency,
        codec=args.codec,
        payloads=args.payloads,
    )
    st = manifest.total_stats()
    print(json.dumps({"segments": len(manifest.segments),
                      "docs": st.docs_cnt, "hits": st.sum_term_hits}))
    return 0


def cmd_merge(args: argparse.Namespace) -> int:
    from trinity_ray.index.merge import merge_index

    _ensure_ray()
    manifest = merge_index(args.index, args.out, codec=args.codec)
    print(json.dumps({"segments": len(manifest.segments),
                      "docs": manifest.total_stats().docs_cnt}))
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    from trinity_ray.index.merge import compact_segments, plan_compaction

    _ensure_ray()
    plans = plan_compaction(args.index, max_bytes=args.max_bytes,
                            min_run=args.min_run, max_run=args.max_run)
    if args.dry_run:
        print(json.dumps({"plans": plans}))
        return 0
    done = []
    for p_ in plans:
        manifest = compact_segments(args.index, p_)
        done.append({"sources": p_, "segments_now": len(manifest.segments)})
    print(json.dumps({"compacted": done}))
    return 0


def cmd_search(args: argparse.Namespace) -> int:
    _ensure_ray()
    if args.actors > 0:
        from trinity_ray.search import RaySearcher

        searcher = RaySearcher(args.index, num_actors=args.actors)
    else:
        from trinity_ray.search import LocalSearcher

        searcher = LocalSearcher(args.index)
    if args.mode == "rich":
        res, tbl = searcher.search_rich(args.query, k=args.k,
                                        scorer=args.scorer)
        for row in tbl.to_pylist():
            print(json.dumps(row))
        return 0
    if args.mode == "subtrees":
        res = searcher.search_subtrees(args.query, k=args.k,
                                       scorer=args.scorer)
    elif args.mode == "sequence":
        res = searcher.search_sequence(args.query, k=args.k,
                                       scorer=args.scorer)
    else:
        res = searcher.search(args.query, k=args.k, scorer=args.scorer)
    for row in res.to_rows():
        print(json.dumps(row))
    return 0


def cmd_facet(args: argparse.Namespace) -> int:
    _ensure_ray()
    if args.actors > 0:
        from trinity_ray.search import RaySearcher

        searcher = RaySearcher(args.index, num_actors=args.actors)
    else:
        from trinity_ray.search import LocalSearcher

        searcher = LocalSearcher(args.index)
    for value, count in searcher.facet_counts(args.query, args.column):
        print(json.dumps({"value": value, "n_docs": count}))
    return 0


def cmd_suggest(args: argparse.Namespace) -> int:
    _ensure_ray()
    from trinity_ray.search import LocalSearcher

    for term, df in LocalSearcher(args.index).suggest_terms(args.prefix,
                                                            k=args.k):
        print(json.dumps({"term": term, "df": df}))
    return 0


def cmd_curate(args: argparse.Namespace) -> int:
    """clean_corpus (exact dedup -> MinHash near-dup -> quality/lang
    filters) -> hive-partitioned resumable Parquet export — the
    training-data curation job for ``ray job submit``."""
    _ensure_ray()
    import ray.data as rd

    from trinity_ray.pipelines.clean import clean_corpus
    from trinity_ray.pipelines.export import export_curated

    if not args.partition_cols:
        raise SystemExit("curate: --partition-cols needs at least one "
                         "column (export partitioning is what makes the "
                         "write resumable)")
    ds = rd.read_parquet(args.input)
    if args.dedup_span_window:
        # span-level exact-substring pass BEFORE doc-level cleaning:
        # duplicated w-token runs keep only their globally-first site, so
        # boilerplate (license headers) stops inflating near-dup scores
        from trinity_ray.ops.dedup import remove_dup_spans

        stripped = remove_dup_spans(
            ds.select_columns([args.id_column, args.text_column]),
            window=args.dedup_span_window, text_column=args.text_column,
            id_column=args.id_column, hash_method="rolling")
        ds = stripped.drop_columns(["n_kept", "n_dropped"])
    cleaned = clean_corpus(ds, id_column=args.id_column,
                           text_column=args.text_column,
                           jaccard_threshold=args.jaccard_threshold,
                           min_words=args.min_words, lang=args.lang,
                           keep_columns=(args.text_column,))
    manifest = export_curated(cleaned, args.out,
                              partition_cols=tuple(args.partition_cols))
    print(json.dumps(manifest))
    return 0


def cmd_ann(args: argparse.Namespace) -> int:
    """Embedding similarity search over a Parquet table: exact brute
    force, IVF (nprobe clusters), PQ (ADC code scan), or IVF-PQ
    (residual codes).  The query is a row of the table itself
    (--query-id), excluded from its own result."""
    _ensure_ray()
    import numpy as np
    import pyarrow.parquet as pq_mod
    import ray.data as rd

    # fetch ONLY the query row (row-group-pruned filter read): the full
    # table must never land on the driver
    qrow = pq_mod.read_table(
        args.embeddings, columns=[args.vec_column],
        filters=[(args.id_column, "==", args.query_id)])
    if qrow.num_rows == 0:
        print(f"error: {args.id_column}={args.query_id} not found in "
              f"{args.embeddings}", file=sys.stderr)
        return 1
    qvec = np.asarray(qrow.column(args.vec_column)[0].as_py(),
                      dtype=np.float64)
    ds = rd.read_parquet(args.embeddings,
                         columns=[args.id_column, args.vec_column])
    if args.method == "brute":
        from trinity_ray.ops.ann import brute_force_topk

        t = brute_force_topk(ds, qvec[None, :], k=args.k,
                             vec_column=args.vec_column,
                             id_column=args.id_column,
                             exclude_ids=(args.query_id,))
        val_col = "cosine"
    elif args.method == "ivf":
        from trinity_ray.ops.ann import ivf_build, ivf_topk

        cent, assigned = ivf_build(ds, n_clusters=args.n_clusters,
                                   vec_column=args.vec_column,
                                   id_column=args.id_column)
        t = ivf_topk(assigned, cent, qvec[None, :], k=args.k + 1,
                     nprobe=args.nprobe, id_column=args.id_column)
        val_col = "cosine"
    elif args.method == "pq":
        from trinity_ray.ops.ann import (_sample_matrix, pq_encode, pq_topk,
                                         pq_train)

        # codebooks train on a head sample, like ivf/ivfpq — never the
        # whole table on the driver
        cb = pq_train(_sample_matrix(ds, args.vec_column, 4096),
                      m=args.pq_m, n_codes=args.pq_codes)
        t = pq_topk(pq_encode(ds, cb, vec_column=args.vec_column,
                              id_column=args.id_column),
                    cb, qvec[None, :], k=args.k + 1,
                    id_column=args.id_column)
        val_col = "adc"
    else:   # ivfpq
        from trinity_ray.ops.ann import ivfpq_build, ivfpq_topk

        cent, cb, coded = ivfpq_build(ds, n_clusters=args.n_clusters,
                                      m=args.pq_m, n_codes=args.pq_codes,
                                      vec_column=args.vec_column,
                                      id_column=args.id_column)
        t = ivfpq_topk(coded, cent, cb, qvec[None, :], k=args.k + 1,
                       nprobe=args.nprobe, id_column=args.id_column)
        val_col = "adc"
    n_out = 0
    for row in t.to_pylist():
        if row[args.id_column] == args.query_id or n_out >= args.k:
            continue
        n_out += 1
        print(json.dumps({"rank": n_out, args.id_column: row[args.id_column],
                          val_col: row[val_col]}))
    return 0


def cmd_percolate(args: argparse.Namespace) -> int:
    import ray.data as rd

    from trinity_ray.ops.percolate import percolate

    _ensure_ray()
    queries = {}
    for spec in args.query:
        name, _, q = spec.partition("=")
        if not q:
            raise SystemExit(f"--query must be name='query text', got {spec!r}")
        queries[name] = q
    ds = percolate(rd.read_parquet(args.input), queries,
                   tokenizer=args.tokenizer,
                   text_column=args.content_column,
                   id_column=args.id_column)
    if args.out:
        ds.write_parquet(args.out)
        print(json.dumps({"out": args.out}))
    else:
        for row in ds.take(args.limit):
            print(json.dumps({k: (v.item() if hasattr(v, "item") else v)
                              for k, v in row.items()}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="trinity_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index over a Parquet corpus")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--format", default=None,
                   choices=[None, "parquet", "jsonl", "csv"],
                   help="corpus format (default: sniffed from the path); "
                        "jsonl/csv stage once into Parquet")
    b.add_argument("--staging", default=None,
                   help="staging dir for non-Parquet corpora "
                        "(default: <index>/staging)")
    b.add_argument("--content-column", default="content")
    b.add_argument("--id-columns", nargs="*", default=None,
                   help="app-field columns carried into docs metadata "
                        "(DocPredicate filters / facet aggregation)")
    b.add_argument("--tokenizer", default="trinity", choices=["trinity", "simple"])
    b.add_argument("--no-positions", action="store_true")
    # None = build_index's corpus-adaptive default
    b.add_argument("--target-rows", type=int, default=None)
    b.add_argument("--concurrency", type=int, default=None)
    b.add_argument("--codec", default="varint", choices=["varint", "packed"],
                   help="posting-list codec (packed = bit-packed FOR blocks)")
    b.add_argument("--payloads", default=None, choices=[None, "char_offset"],
                   help="per-hit payload channel (char offsets; simple "
                        "tokenizer only)")
    b.set_defaults(fn=cmd_build)

    m = sub.add_parser("merge", help="compact an index (groupby(term) shuffle)")
    m.add_argument("--index", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--codec", default=None, choices=[None, "varint", "packed"],
                   help="output codec (default: keep the source codec); "
                        "also the cross-codec rewrite path")
    m.set_defaults(fn=cmd_merge)

    c = sub.add_parser("compact", help="in-place size-tiered compaction of "
                                       "small contiguous segments")
    c.add_argument("--index", required=True)
    c.add_argument("--max-bytes", type=int, default=64 << 20,
                   help="only segments smaller than this are candidates")
    c.add_argument("--min-run", type=int, default=4)
    c.add_argument("--max-run", type=int, default=64)
    c.add_argument("--dry-run", action="store_true",
                   help="print the candidate plan without merging")
    c.set_defaults(fn=cmd_compact)

    s = sub.add_parser("search", help="boolean/phrase query with top-k scoring")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--mode", default="topk",
                   choices=["topk", "rich", "subtrees", "sequence"],
                   help="topk = (doc, score); rich = per-term tf/positions"
                        "/payloads rows; subtrees = accumulated-score "
                        "OR-of-subtrees; sequence = matched-sequence "
                        "proximity bonus (adjacent query tokens matched "
                        "adjacently outrank bags of the same tokens)")
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--scorer", default="bm25", choices=["bm25", "tfidf", "trivial"])
    s.add_argument("--actors", type=int, default=0,
                   help="RaySearcher actor count (0 = driver-local)")
    s.set_defaults(fn=cmd_search)

    f = sub.add_parser("facet", help="per-value doc counts of a docs-"
                                     "metadata column over a query's "
                                     "match set")
    f.add_argument("--index", required=True)
    f.add_argument("--query", required=True)
    f.add_argument("--column", required=True)
    f.add_argument("--actors", type=int, default=0,
                   help="RaySearcher actor count (0 = driver-local)")
    f.set_defaults(fn=cmd_facet)

    g = sub.add_parser("suggest", help="dictionary prefix suggestions "
                                       "by global df")
    g.add_argument("--index", required=True)
    g.add_argument("--prefix", required=True)
    g.add_argument("-k", type=int, default=10)
    g.set_defaults(fn=cmd_suggest)

    an = sub.add_parser("ann", help="embedding similarity search: brute / "
                                    "IVF / PQ / IVF-PQ top-k for a row of "
                                    "the table")
    an.add_argument("--embeddings", required=True,
                    help="Parquet table with an id + vector column")
    an.add_argument("--method", default="brute",
                    choices=["brute", "ivf", "pq", "ivfpq"])
    an.add_argument("--query-id", type=int, default=0)
    an.add_argument("-k", type=int, default=10)
    an.add_argument("--id-column", default="vec_id")
    an.add_argument("--vec-column", default="embedding")
    an.add_argument("--n-clusters", type=int, default=16)
    an.add_argument("--nprobe", type=int, default=4)
    an.add_argument("--pq-m", type=int, default=16)
    an.add_argument("--pq-codes", type=int, default=256)
    an.set_defaults(fn=cmd_ann)

    pc = sub.add_parser("percolate", help="reverse search: stream docs "
                                          "through standing queries")
    pc.add_argument("--input", required=True)
    pc.add_argument("--query", action="append", required=True,
                    metavar="NAME=QUERY")
    pc.add_argument("--tokenizer", default="trinity", choices=["trinity", "simple"])
    pc.add_argument("--content-column", default="content")
    pc.add_argument("--id-column", default="doc_id")
    pc.add_argument("--out", default=None)
    pc.add_argument("--limit", type=int, default=100)
    pc.set_defaults(fn=cmd_percolate)
    cu = sub.add_parser("curate", help="clean + dedup a corpus and export "
                                       "hive-partitioned curated Parquet")
    cu.add_argument("--input", required=True)
    cu.add_argument("--out", required=True)
    cu.add_argument("--id-column", default="doc_id")
    cu.add_argument("--text-column", default="text")
    cu.add_argument("--jaccard-threshold", type=float, default=0.6)
    cu.add_argument("--min-words", type=int, default=5)
    cu.add_argument("--lang", default="en")
    cu.add_argument("--partition-cols", nargs="*", default=["lang_pred"])
    cu.add_argument("--dedup-span-window", type=int, default=0,
                    help="if > 0, strip cross-doc duplicated token spans "
                         "of this window size before doc-level cleaning "
                         "(ExactSubstr pass; 0 = off)")
    cu.set_defaults(fn=cmd_curate)


    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
