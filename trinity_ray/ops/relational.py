"""Relational helpers used by the demo pipelines: broadcast join + grouped
aggregate over the TPC-H-ish tables.

The pattern under test is the scale-critical one: the SMALL side (``part``)
ships to the object store ONCE via ``ray.put`` and every map task reads it
zero-copy, annotating the big side (``lineitem``) without any all-to-all
shuffle; the only wide op is the final tiny aggregate over (group-key,
partials).  At 100 TB the small side is a dimension table; re-shipping it
per batch — or hash-joining 10^12 rows — would be the mistake."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from trinity_ray.rayutil import package_runtime_env


def broadcast_join_agg(big_ds, small_table: pa.Table, *,
                       big_key: str, small_key: str, label_column: str,
                       cents_column: str):
    """Annotate ``big_ds`` rows with ``label_column`` from the broadcast
    small side, then (label, n_rows, sum_cents) — exact integer sums."""
    import ray
    from ray.data.aggregate import Count, Sum

    keys = small_table.column(small_key).to_numpy()
    order = np.argsort(keys)
    labels_arr = small_table.column(label_column).take(
        pa.array(order)).combine_chunks()
    lookup_ref = ray.put((keys[order], labels_arr))

    def annotate(batch: pa.Table) -> pa.Table:
        skeys, labels = ray.get(lookup_ref)
        bk = batch.column(big_key).to_numpy()
        idx = np.minimum(np.searchsorted(skeys, bk), skeys.size - 1)
        hit = skeys[idx] == bk
        # vectorized label gather: Arrow take on the broadcast label array
        lab = labels.take(pa.array(idx))
        cents = pc.cast(pc.round(pc.multiply(
            batch.column(cents_column), 100.0),
            round_mode="half_towards_infinity"), pa.int64())  # == DuckDB round()
        return pa.table({
            label_column: lab,
            "cents": cents,
        }).filter(pa.array(hit))

    return big_ds.map_batches(annotate, batch_format="pyarrow",
                              runtime_env=package_runtime_env()) \
                 .groupby(label_column).aggregate(
                     Count(alias_name="n_rows"),
                     Sum("cents", alias_name="sum_cents"))
