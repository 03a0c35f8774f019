"""Partitioned, resumable training-data export.

The last stage of a curation pipeline at 100 TB must not produce one
giant file, and a rerun after a mid-export failure must not redo
finished work.  ``export_curated`` writes the curated corpus as
hive-partitioned Parquet (one directory per stratum, many files inside,
written by parallel Ray tasks) and commits a manifest + DONE marker
LAST — so completion is atomic at the directory level and a rerun of a
finished export is a no-op.  A rerun of an UNFINISHED export starts that
export over (partial partition dirs are removed first): per-file resume
inside one export is intentionally not attempted, because Ray Data's
parallel writers make per-file completion unknowable without a commit
log; directory-level idempotency is the property schedulers retry on.
"""

from __future__ import annotations

import json
import os
import shutil

__all__ = ["export_curated"]

_DONE = "DONE.json"


def export_curated(ds, out_dir: str, *, partition_cols=("lang",),
                   compression: str = "zstd") -> dict:
    """Write ``ds`` hive-partitioned under ``out_dir``; returns the commit
    manifest {"rows": N, "partitions": {value: rows}}.  Idempotent: if
    ``out_dir/DONE.json`` exists the write is skipped and the recorded
    manifest is returned."""
    marker = os.path.join(out_dir, _DONE)
    if os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)
    if os.path.isdir(out_dir):            # unfinished earlier attempt
        shutil.rmtree(out_dir)
    cols = list(partition_cols)
    ds = ds.materialize()                 # consumed twice (write + counts)
    # Ray's write_parquet skips creating out_dir for empty output (same
    # behavior merge.py works around for docs dirs) — the DONE marker must
    # still commit an empty manifest there
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir, partition_cols=cols, compression=compression)
    counts = {}
    for row in ds.groupby(cols[0]).count().take_all():
        counts[str(row[cols[0]])] = int(row["count()"])
    manifest = {"rows": sum(counts.values()), "partitions": counts,
                "partition_cols": cols}
    tmp = marker + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, marker)               # the commit point
    return manifest
