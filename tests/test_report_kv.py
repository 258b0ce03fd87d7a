"""Text report sink + typed KV stage storage."""

import numpy as np

from pysatl_cpd_spark.operators.report import (
    change_point_report,
    write_change_point_report,
)
from pysatl_cpd_spark.plans.kv_store import KvStore


def test_change_point_report(spark, tmp_path):
    cps = spark.createDataFrame(
        [("b", 30), ("a", 5), ("a", 1)], "series_id string, change_point long"
    )
    text = change_point_report(cps)
    assert text == "a: change_points=[1, 5]\nb: change_points=[30]\n"
    path = str(tmp_path / "reports" / "cps.txt")
    write_change_point_report(cps, path)
    assert open(path).read() == text


def test_kv_store_roundtrip(tmp_path):
    kv = KvStore(str(tmp_path / "kv"))
    cases = {
        "scalar_int": 42,
        "scalar_float": 3.5,
        "scalar_str": "hello",
        "a_list": [1, 2.5, "x"],
        "a_tuple": (1, 2, 3),
        "an_array": np.arange(5, dtype=np.float64),
        "a_dict": {"nested": {"cps": [1, 2], "score": 0.9}},
        "np_scalar": np.int64(7),
    }
    for k, v in cases.items():
        kv.save(k, v)
    assert kv.keys() == sorted(cases)
    assert kv.load("scalar_int") == 42
    assert kv.load("a_tuple") == (1, 2, 3)
    assert np.array_equal(kv.load("an_array"), cases["an_array"])
    assert kv.load("a_dict") == {"nested": {"cps": [1, 2], "score": 0.9}}
    assert kv.load("np_scalar") == 7


def test_visualize_svg(tmp_path):
    """E5 (reference icpd_solver.py:114-173): series + detected (solid) +
    expected (dashed) change-point verticals, rendered without matplotlib."""
    import numpy as np

    from pysatl_cpd_spark.operators.visualize import render_series_svg, visualize

    vals = np.concatenate([np.zeros(50), np.ones(50) * 4.0])
    path = visualize(vals, str(tmp_path), "run1", detected=[50, 80], expected=[50])
    svg = open(path).read()
    assert svg.startswith("<svg") and "polyline" in svg
    assert svg.count('class="detected-cp"') == 2
    assert svg.count('class="expected-cp"') == 1
    assert "run1" in svg
    # out-of-range change points are clipped, empty series still renders
    empty = render_series_svg([], detected=[3])
    assert empty.startswith("<svg") and "polyline" not in empty


def test_localization_report_golden():
    """Byte-exact goldens from reference tests/test_solver.py:113-134."""
    from pysatl_cpd_spark.operators.report import localization_report

    assert (
        localization_report([1, 2, 3], [2, 3, 4], 10)
        == """Located change points: (1;2;3)
Expected change point: (2;3;4)
Difference: (1;4)
Computation time (sec): 10"""
    )
    assert (
        localization_report([1, 2, 3, 6, 8], [2, 3, 4, 6], 20)
        == """Located change points: (1;2;3;6;8)
Expected change point: (2;3;4;6)
Difference: (1;4;8)
Computation time (sec): 20"""
    )
    assert (
        localization_report([1, 2, 3], None, 5)
        == """Located change points: (1;2;3)
Computation time (sec): 5"""
    )
