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

__all__ = ["export_curated", "export_packed"]

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
        # only delete what LOOKS like a prior export attempt: empty, or
        # containing only hive partition dirs / parquet files / a stale
        # marker tmp.  A misconfigured out_dir pointing at unrelated data
        # must raise, not be destroyed.
        foreign = [e for e in os.listdir(out_dir)
                   if not (("=" in e and os.path.isdir(
                                os.path.join(out_dir, e)))
                           or e.endswith(".parquet")
                           or e.startswith(_DONE))]
        if foreign:
            raise RuntimeError(
                f"out_dir {out_dir!r} exists and does not look like a "
                f"prior export attempt (unexpected entries: "
                f"{foreign[:5]}); refusing to delete it")
        shutil.rmtree(out_dir)
    cols = list(partition_cols)
    # Ray's write_parquet skips creating out_dir for empty output (same
    # behavior merge.py works around for docs dirs) — the DONE marker must
    # still commit an empty manifest there
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir, partition_cols=cols, compression=compression)
    # per-partition row counts from the written Parquet FOOTERS (metadata
    # only, no second pass over the data and no materialize of ds)
    import pyarrow.parquet as pq

    from urllib.parse import unquote

    counts: dict[str, int] = {}
    prefix = cols[0] + "="
    for entry in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, entry)
        if not (entry.startswith(prefix) and os.path.isdir(pdir)):
            continue
        # hive directory names URL-escape special characters and spell
        # nulls __HIVE_DEFAULT_PARTITION__; manifest keys are the COLUMN
        # VALUES (null -> "None", matching str() of the value)
        value = unquote(entry[len(prefix):])
        if value == "__HIVE_DEFAULT_PARTITION__":
            value = "None"
        counts[value] = sum(
            pq.read_metadata(os.path.join(r, f)).num_rows
            for r, _dirs, files in os.walk(pdir)
            for f in files if f.endswith(".parquet"))
    manifest = {"rows": sum(counts.values()), "partitions": counts,
                "partition_cols": cols}
    tmp = marker + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, marker)               # the commit point
    return manifest


def export_packed(docs_ds, out_dir: str, *, seq_len: int = 256,
                  seqs_per_partition: int = 1024,
                  compression: str = "zstd", **pack_kwargs) -> dict:
    """Terminal of the training-data pipeline: pack documents into
    fixed-``seq_len`` sequences (:func:`trinity_ray.ops.pack.pack_sequences`)
    and write them as resumable hive-partitioned Parquet, one directory
    per ``seqs_per_partition`` consecutive sequence ids — a training
    loader reads partitions in order and a failed export reruns
    idempotently (directory-level commit via :func:`export_curated`'s
    DONE manifest)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from trinity_ray.ops.pack import pack_sequences

    if seqs_per_partition <= 0:
        raise ValueError("seqs_per_partition must be positive")
    seqs = pack_sequences(docs_ds, seq_len=seq_len, **pack_kwargs)

    def bucket(batch: pa.Table) -> pa.Table:
        b = pc.divide(batch.column("seq_id"),
                      pa.scalar(seqs_per_partition, pa.int64()))
        return batch.append_column("seq_bucket", pc.cast(b, pa.int64()))

    return export_curated(seqs.map_batches(bucket, batch_format="pyarrow"),
                          out_dir, partition_cols=("seq_bucket",),
                          compression=compression)
