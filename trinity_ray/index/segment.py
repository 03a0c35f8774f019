"""Segment + index manifest layout.

The reference's segment is a generation-named directory of mmap'd binary
files (index / terms.data / terms.idx / updated_documents.ids / id — see
/root/reference/codecs.h:93-95, indexer.cpp:241-299, terms.cpp:126-172).
Ours is a directory of Parquet files plus a JSON stats sidecar:

    <index_dir>/
      manifest.json                # versioned index snapshot (IndexSourcesCollection
                                   # analogue, /root/reference/index_source.h:191-238)
      segments/<segment_name>/
        terms.parquet              # the term DICTIONARY, sorted by term:
                                   # term, df:uint32, max_tf:uint32,
                                   # sum_hits:uint64, off:uint64, len:uint32
                                   # — the analogue of terms.data/terms.idx +
                                   # term_index_ctx{documents, indexChunk}
                                   # (/root/reference/terms.cpp:126-172,
                                   #  codecs.h:17-55): a probe answers df and
                                   # the WAND bound with NO postings IO
        postings.bin               # concatenated trinity_ray.codec blobs; a
                                   # term's postings are read as ONE exact
                                   # byte range (the reference's `index`
                                   # file, indexer.cpp:241-299)
        (merged segments use postings/<shard>.terms.parquet + <shard>.bin
         pairs — one term-range pair per shuffle block)
        docs.parquet               # doc_id:uint64 + id/meta columns + content_sha256
        deletes.parquet (optional) # doc_id:uint64 sorted — docs this generation
                                   # deletes/replaces in OLDER generations
                                   # (updated_documents.ids analogue,
                                   #  /root/reference/docidupdates.cpp:8-73)
        stats.json                 # field_statistics analogue + format tag
                                   # (/root/reference/index_source.h:44-53)

Segment writes are atomic: write into ``<dir>.tmp-<pid>`` then ``rename``
(the reference's tmp+rename pattern, indexer.cpp:284-299).  A segment is
complete iff ``stats.json`` exists inside the final directory — that is the
checkpoint/resume marker.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict, dataclass, field

POSTINGS_FILE = "postings.parquet"  # format-1 legacy name (readers reject)
TERMS_FILE = "terms.parquet"
BIN_FILE = "postings.bin"
# 4: 32-byte blob header (codec id, payloads, n_hits)
# 5: positions+payloads split into a sibling .hits file (docs-only/BM25
#    reads fetch zero position bytes); terms.parquet gains hoff/hlen
SEGMENT_FORMAT = 5


def hits_path(bin_path: str) -> str:
    """The sibling hits file of a postings bin: positions + payloads byte
    ranges (hoff/hlen in the dictionary), the reference's separate
    hits.data (lucene_codec.cpp:107-137)."""
    assert bin_path.endswith(".bin"), bin_path
    return bin_path[:-len(".bin")] + ".hits"
DOCS_FILE = "docs.parquet"
DELETES_FILE = "deletes.parquet"
STATS_FILE = "stats.json"
MANIFEST_FILE = "manifest.json"
# terms per postings.parquet row group: the unit of dictionary-lookup pruning
# (the reference packs a skiplist entry every 64 terms, terms.cpp:127; row-group
# min/max statistics play that role here — 2048 keeps per-group overhead low
# while still pruning >99% of a large dictionary for few-term queries)
TERMS_ROW_GROUP = 2048


@dataclass
class FieldStatistics:
    """Collection statistics (reference field_statistics, index_source.h:44-53)."""

    docs_cnt: int = 0          # documents in segment
    sum_term_hits: int = 0     # total (term,pos) hits
    total_terms: int = 0       # distinct terms
    sum_terms_docs: int = 0    # sum of df over terms

    def merged(self, other: "FieldStatistics") -> "FieldStatistics":
        # summed across sources at query time (similarity.h:238-250);
        # total_terms is NOT additive across segments — recomputed on merge
        return FieldStatistics(
            docs_cnt=self.docs_cnt + other.docs_cnt,
            sum_term_hits=self.sum_term_hits + other.sum_term_hits,
            total_terms=self.total_terms + other.total_terms,
            sum_terms_docs=self.sum_terms_docs + other.sum_terms_docs,
        )


@dataclass
class SegmentMeta:
    name: str               # directory name under segments/
    generation: int         # newer generations mask older ones (codecs.h:93-95)
    part_id: int            # builder partition
    doc_base: int           # first docID owned by this segment
    doc_count: int
    stats: FieldStatistics = field(default_factory=FieldStatistics)
    has_deletes: bool = False
    # consider_tracked_sources evidence, keyed by MANIFEST VERSION (not
    # generation — generations are caller-chosen and may be re-used after
    # a delete segment is GC'd, so a generation watermark could mark a
    # LATER delete list as already-applied and resurrect its docs):
    #   created_version — manifest version at which this segment's delete
    #     list was (last) written (delete segments; bumped on same-
    #     generation unions, which add new ids)
    #   masks_version — compaction applied every delete list present in
    #     the manifest at this version to this segment's contents
    created_version: int = 0
    masks_version: int = -1

    @property
    def doc_end(self) -> int:
        return self.doc_base + self.doc_count


@dataclass
class IndexManifest:
    version: int
    tokenizer: str
    positions: bool
    segments: list[SegmentMeta]
    content_column: str = "content"
    id_columns: tuple[str, ...] = ()

    def total_stats(self) -> FieldStatistics:
        out = FieldStatistics()
        for s in self.segments:
            out = out.merged(s.stats)
        return out


def segment_dir(index_dir: str, name: str) -> str:
    return os.path.join(index_dir, "segments", name)


def segment_postings_files(seg_path: str) -> list[tuple[str, str]]:
    """(terms.parquet, postings.bin) pairs of a segment: either the single
    root pair (built segments) or one pair per term-range shard under
    ``postings/`` (merged segments)."""
    root_terms = os.path.join(seg_path, TERMS_FILE)
    if os.path.exists(root_terms):
        return [(root_terms, os.path.join(seg_path, BIN_FILE))]
    shard_dir = os.path.join(seg_path, "postings")
    out = []
    if os.path.isdir(shard_dir):
        for f in sorted(os.listdir(shard_dir)):
            if f.endswith(".terms.parquet"):
                out.append((os.path.join(shard_dir, f),
                            os.path.join(shard_dir, f[:-len(".terms.parquet")] + ".bin")))
    return out


def segment_is_complete(index_dir: str, name: str) -> bool:
    """Checkpoint marker: stats.json present AND written by the current
    segment format (older-format checkpoints are rebuilt, not resumed)."""
    p = os.path.join(segment_dir(index_dir, name), STATS_FILE)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            return json.load(f).get("format") == SEGMENT_FORMAT
    except (ValueError, OSError):
        return False


def require_segment_format(seg_dir: str, who: str = "reader") -> None:
    """Refuse a postings-bearing segment whose ``stats.json`` format is not
    the current ``SEGMENT_FORMAT``.

    Stale on-disk formats mis-parse SILENTLY under the current layout
    (format-2's 24-byte blob header, format-4's fused index+hits blob) —
    fail at open/plan time with one clear message instead of a wrong
    answer or an opaque missing-column error deep inside a Ray task.
    Single definition; SegmentReader and merge both call this."""
    p = os.path.join(seg_dir, STATS_FILE)
    try:
        with open(p) as f:
            fmt = json.load(f).get("format")
    except (OSError, ValueError):
        fmt = None
    if fmt != SEGMENT_FORMAT:
        raise ValueError(
            f"segment {seg_dir} has format {fmt}, {who} expects "
            f"{SEGMENT_FORMAT}; rebuild the index")


def write_segment_atomic(final_dir: str, writer_fn) -> None:
    """Write a segment dir atomically: build in tmp, rename into place."""
    tmp = f"{final_dir}.tmp-{os.getpid()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    writer_fn(tmp)
    if os.path.exists(final_dir):  # lost a race / rerun: existing one wins
        shutil.rmtree(tmp)
        return
    os.replace(tmp, final_dir)


def read_segment_stats(index_dir: str, name: str) -> dict:
    with open(os.path.join(segment_dir(index_dir, name), STATS_FILE)) as f:
        return json.load(f)


def write_manifest(index_dir: str, manifest: IndexManifest) -> None:
    payload = {
        "version": manifest.version,
        "tokenizer": manifest.tokenizer,
        "positions": manifest.positions,
        "content_column": manifest.content_column,
        "id_columns": list(manifest.id_columns),
        "segments": [
            {**asdict(s), "stats": asdict(s.stats)} for s in manifest.segments
        ],
    }
    tmp = os.path.join(index_dir, MANIFEST_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, MANIFEST_FILE))


def read_manifest(index_dir: str) -> IndexManifest:
    with open(os.path.join(index_dir, MANIFEST_FILE)) as f:
        raw = json.load(f)
    segments = [
        SegmentMeta(
            name=s["name"],
            generation=s["generation"],
            part_id=s["part_id"],
            doc_base=s["doc_base"],
            doc_count=s["doc_count"],
            stats=FieldStatistics(**s["stats"]),
            has_deletes=s.get("has_deletes", False),
            created_version=s.get("created_version", 0),
            masks_version=s.get("masks_version", -1),
        )
        for s in raw["segments"]
    ]
    return IndexManifest(
        version=raw["version"],
        tokenizer=raw["tokenizer"],
        positions=raw["positions"],
        segments=segments,
        content_column=raw.get("content_column", "content"),
        id_columns=tuple(raw.get("id_columns", ())),
    )
