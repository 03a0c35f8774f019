"""Semi-structured (JSON) column extraction, Arrow-native.

A training-data pipeline constantly hoists typed fields out of JSON
metadata columns (the ``events.props`` shape).  Per-row ``json.loads``
is the obvious implementation and the classic per-row-Python scale trap;
instead each batch's strings are newline-joined into ONE buffer with a
vectorized numpy scatter (no Python loop touches row data) and handed to
Arrow's C++ JSON parser (``pyarrow.json.read_json``), which returns the
typed columns directly — the same zero-copy batch discipline as every
other stage.  An EXPLICIT schema pins the field types so block-level
type inference can never drift across batches (one batch of all-int
floats would otherwise flip the column type).

Alignment: Arrow's reader consumes an object STREAM (newlines between
tokens are ordinary whitespace), so each input string must hold exactly
ONE top-level JSON value; a cell smuggling several objects would shift
every later row, which the parsed-vs-input row-count guard turns into an
error instead of silent misalignment.
"""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from trinity_ray.rayutil import package_runtime_env

__all__ = ["extract_json", "joined_buffer"]


def joined_buffer(col: pa.Array) -> bytes:
    """Newline-join a string array's values into one bytes buffer with a
    vectorized scatter over the Arrow offsets — no per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    wide = pa.types.is_large_string(col.type)
    off_dtype = np.int64 if wide else np.int32
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], dtype=off_dtype)[
        col.offset:col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    n = len(col)
    lens = off[1:] - off[:-1]
    total = int(lens.sum())
    out = np.empty(total + n, dtype=np.uint8)
    # each byte lands shifted by one per preceding newline; source
    # positions are gathered explicitly (rows need not be contiguous in
    # the buffer for a sliced array)
    row_of_byte = np.repeat(np.arange(n, dtype=np.int64), lens)
    src = np.repeat(off[:-1], lens) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(lens) - lens, lens))
    dst = np.arange(total, dtype=np.int64) + row_of_byte
    out[dst] = data[src]
    out[np.cumsum(lens + 1) - 1] = ord("\n")
    return out.tobytes()


def extract_json(ds, column: str, fields: dict[str, pa.DataType], *,
                 keep: tuple[str, ...] = ()):
    """Append typed top-level ``fields`` extracted from the JSON strings
    in ``column``; nulls/empty strings extract as all-null rows; keys
    absent from a value extract as null.  ``keep`` limits the carried
    input columns (column pruning)."""
    schema = pa.schema(fields)
    carried = set(keep) if keep else set(ds.schema().names)
    clash = set(schema.names) & carried
    if clash or column in schema.names:
        bad = sorted(clash | ({column} & set(schema.names)))
        raise ValueError(
            f"extract_json: field names collide with carried columns "
            f"{bad} — a dict-keyed output would silently overwrite them")

    def parse(batch: pa.Table) -> pa.Table:
        from pyarrow import json as pj

        col = batch.column(column).combine_chunks()
        if pa.types.is_null(col.type):
            # an all-null block carries no string buffers at all
            col = col.cast(pa.string())
        col = pc.fill_null(col, "{}")
        # blank INCLUDING whitespace-only: a whitespace cell parses to
        # zero objects, which would mask a neighboring multi-object cell
        # from the row-count guard and shift rows silently
        blank = pc.equal(pc.utf8_trim_whitespace(col), "")
        col = pc.if_else(blank, pa.scalar("{}"), col)
        parsed = pj.read_json(
            io.BytesIO(joined_buffer(col)),
            # ignore fields outside the explicit schema: inferring them
            # fails the whole batch when an UNREQUESTED field's type
            # varies across rows (mixed-type optional metadata is
            # routine), and inference work on them is wasted anyway
            parse_options=pj.ParseOptions(
                explicit_schema=schema,
                unexpected_field_behavior="ignore"),
        )
        if parsed.num_rows != batch.num_rows:
            raise ValueError(
                f"JSON parse produced {parsed.num_rows} rows for "
                f"{batch.num_rows} inputs — a cell holding more than "
                f"one JSON value would misalign every later row")
        cols = {k: batch.column(k) for k in (keep or batch.column_names)}
        for f in schema.names:
            cols[f] = parsed.column(f)
        return pa.table(cols)

    return ds.map_batches(parse, batch_format="pyarrow",
                          runtime_env=package_runtime_env())
