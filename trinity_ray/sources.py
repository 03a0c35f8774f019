"""Corpus source formats beyond Parquet.

The index builder (and every ops pipeline) reads Parquet — the right
storage format at 100 TB (column pruning, row-group predicate pushdown,
footer statistics).  Corpora often ARRIVE as JSONL or CSV, though, so
``stage_corpus`` converts them once into partitioned Parquet with a
DONE-marker commit (idempotent rerun, directory-level resume — the same
contract as ``pipelines.export``), streaming block by block through Ray
Data with no driver materialization.  Parquet inputs pass through
untouched: no staging cost when none is needed.
"""

from __future__ import annotations

import json
import os
import shutil

__all__ = ["stage_corpus", "sniff_format"]

_DONE = "DONE.json"


def sniff_format(path: str) -> str:
    """'parquet' | 'jsonl' | 'csv' from the file (or directory) name."""
    base = path.rstrip("/").lower()
    for ext, fmt in ((".parquet", "parquet"), (".jsonl", "jsonl"),
                     (".ndjson", "jsonl"), (".json", "jsonl"),
                     (".csv", "csv")):
        if base.endswith(ext) or base.endswith(ext + ".gz"):
            return fmt
    if os.path.isdir(path):
        for entry in sorted(os.listdir(path)):
            if not entry.startswith((".", "_")) and entry != _DONE:
                return sniff_format(entry)
    return "parquet"


def stage_corpus(src: str, staging_dir: str, *, format: str | None = None,
                 compression: str = "zstd") -> str:
    """Return a Parquet path for ``src``, converting JSONL/CSV once.

    Parquet sources return ``src`` unchanged.  Other formats stream
    through Ray Data into ``staging_dir`` (many files, written by
    parallel tasks) with a DONE marker committed LAST: a rerun of a
    finished staging is a no-op, an unfinished one starts over, and a
    ``staging_dir`` holding anything that does not look like a prior
    staging attempt raises instead of being deleted."""
    import ray.data as rd

    fmt = format or sniff_format(src)
    if fmt == "parquet":
        return src
    marker = os.path.join(staging_dir, _DONE)
    if os.path.exists(marker):
        return staging_dir
    if os.path.isdir(staging_dir):
        foreign = [e for e in os.listdir(staging_dir)
                   if not (e.endswith((".parquet", ".crc"))
                           or e.startswith(_DONE))]
        if foreign:
            raise RuntimeError(
                f"staging_dir {staging_dir!r} exists and does not look "
                f"like a prior staging attempt (unexpected entries: "
                f"{foreign[:5]}); refusing to delete it")
        shutil.rmtree(staging_dir)
    if fmt == "jsonl":
        ds = rd.read_json(src)
    elif fmt == "csv":
        ds = rd.read_csv(src)
    else:
        raise ValueError(f"unknown corpus format {fmt!r}")
    os.makedirs(staging_dir, exist_ok=True)
    ds.write_parquet(staging_dir, compression=compression)
    # row count from the written footers (metadata only — counting the
    # source dataset would re-execute the whole read)
    import pyarrow.parquet as pq

    n = sum(pq.read_metadata(os.path.join(r, f)).num_rows
            for r, _dirs, files in os.walk(staging_dir)
            for f in files if f.endswith(".parquet"))
    with open(marker + ".tmp", "w") as f:
        json.dump({"rows": n, "source": os.path.abspath(src),
                   "format": fmt}, f)
    os.replace(marker + ".tmp", marker)
    return staging_dir
