"""Streaming per-series iteration over SORTED co-located Arrow batch streams.

The first colocated dispatches (round 6) materialized each whole partition
(``pa.Table.from_batches(...).combine_chunks()``) and sorted it in Python —
a full extra copy of every partition through Arrow memory plus an
O(n log n) pyarrow sort + per-column ``take`` copies. That is bus-bound
serde work the kernels never needed: the scaling estimator's per-rep table
blamed exactly this share for the N→4N gap (BENCH.md round-6 conclusion).

This module moves the sort to the JVM (``df.sortWithinPartitions`` — a
LOCAL Tungsten sort, no exchange, overlapped with the scan) and walks the
already-sorted batch stream, assembling ONE SERIES AT A TIME:

  - each batch column is read as a numpy view (zero-copy for the numeric
    columns), sliced at series boundaries found via a per-batch
    dictionary-encode of the key;
  - a series spanning batches is stitched with one ``np.concatenate`` of
    its views — the only copy, and the copy the kernel needs anyway;
  - peak Python-side extra memory drops from O(partition) × 3 copies to
    O(one series) plus whatever the caller buffers deliberately.

Used by ``operators.cpd.detect_lockstep_colocated`` and
``operators.segments.encode_segments_colocated``; parity with the salted /
adaptive dispatches is asserted by tests/test_lockstep.py and
tests/test_gorilla.py (byte-identical rows, zero added exchanges).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _cat(parts: "list[np.ndarray]") -> np.ndarray:
    return parts[0] if len(parts) == 1 else np.concatenate(parts)


def iter_sorted_series(
    batches: "Iterable[object]",
    numeric_cols: "tuple[str, ...]",
    key: str = "series_id",
) -> "Iterator[tuple[str, dict[str, np.ndarray]]]":
    """Yield ``(series_id, {col: contiguous numpy array})`` per COMPLETE
    series from a pyarrow RecordBatch stream sorted by ``(key, t)``.

    Contract: the stream is partition-local and ALREADY SORTED by the key
    (``sortWithinPartitions`` upstream), so each series is one contiguous
    run across the batch sequence. Null numeric values are filled with 0
    (only the optional marker column ``_cp`` is ever nullable here).

    Key column may be a string OR an integer (the compacted dense-code path,
    operators/keycompact.py): integer keys skip the per-batch dictionary
    hash — boundaries come straight from ``np.diff`` on the zero-copy numpy
    view, and the yielded series id is the python int.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    pending_sid: "object | None" = None
    pending: "dict[str, list[np.ndarray]]" = {}
    for batch in batches:
        if batch.num_rows == 0:  # zero-row batches still carry schema
            continue
        schema = batch.schema
        sid_arr = batch.column(schema.get_field_index(key))
        if pa.types.is_integer(sid_arr.type):
            keys_np = sid_arr.to_numpy()
            codes = keys_np  # diff on the raw keys finds the same bounds
            vocab = None
        else:
            enc = pc.dictionary_encode(sid_arr)
            codes = enc.indices.to_numpy()
            vocab = enc.dictionary.to_pylist()
        cols_np: "dict[str, np.ndarray]" = {}
        for c in numeric_cols:
            arr = batch.column(schema.get_field_index(c))
            if arr.null_count:
                arr = pc.fill_null(arr, 0)
            cols_np[c] = arr.to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [codes.shape[0]]))
        for s, e in zip(starts, ends):
            name = int(codes[s]) if vocab is None else vocab[codes[s]]
            if name != pending_sid:
                if pending_sid is not None:
                    yield pending_sid, {c: _cat(v) for c, v in pending.items()}
                pending_sid = name
                pending = {c: [] for c in numeric_cols}
            for c in numeric_cols:
                pending[c].append(cols_np[c][s:e])
    if pending_sid is not None:
        yield pending_sid, {c: _cat(v) for c, v in pending.items()}


def assert_colocated(series_df: DataFrame, key: str = "series_id") -> None:
    """DEBUG guard for the co-location contract: raise if any series spans
    more than one partition (the silent-wrong-results hazard of the
    zero-exchange dispatches). Costs one Spark job with a shuffle over the
    distinct ``(key, partition_id)`` pairs — cheap next to a corrupted
    result, expensive next to the zero-exchange detection itself, so it is
    opt-in (``validate=True``) rather than always-on."""
    bad = (
        series_df.select(key)
        .withColumn("_pid", F.spark_partition_id())
        .groupBy(key)
        .agg(F.countDistinct("_pid").alias("n_parts"))
        .filter(F.col("n_parts") > 1)
    )
    row = bad.first()
    if row is not None:
        raise ValueError(
            f"co-location contract violated: {key}={row[0]!r} spans "
            f"{row[1]} partitions — repartition(n, {key!r}) the input or "
            "use the salted dispatch (detect_*_lockstep / "
            "encode_segments_adaptive)"
        )
