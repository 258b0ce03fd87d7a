"""Synthesis sources: transcripts determinism + invariants, generator laws,
YAML config parsing (reference tests/test_generator analogues)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pysatl_cpd_spark.sources.generator import (
    expected_cps_df,
    generate_sample,
    make_dist,
    parse_config,
    poisson_segments,
    synthesize_series_df,
)
from pysatl_cpd_spark.sources.transcripts import (
    expected_change_points,
    synthesize_transcripts,
)

CONFIG_YAML = """
- name: gauss_shift
  distributions:
    - type: normal
      length: 250
      parameters: {mean: 0, variance: 1}
    - type: normal
      length: 250
      parameters: {mean: 5, variance: 4}
- name: exp_only
  distributions:
    - type: exponential
      length: 100
      parameters: {rate: 2.0}
"""


class TestGenerator:
    def test_sample_lengths_and_cps(self):
        cfgs = parse_config(CONFIG_YAML)
        values, cps = generate_sample(cfgs[0]["segments"], seed=42)
        assert values.shape[0] == 500
        assert cps == [250] == cfgs[0]["change_points"]

    def test_dist_validation_errors(self):
        with pytest.raises(ValueError):
            make_dist("normal", {"mean": 0})
        with pytest.raises(ValueError):
            make_dist("exponential", {"rate": -1})
        with pytest.raises(ValueError):
            make_dist("uniform", {"min": 2, "max": 1})
        with pytest.raises(ValueError):
            make_dist("nope", {})

    def test_all_distributions_sample(self):
        rng = np.random.default_rng(0)
        cases = [
            ("normal", {"mean": 0, "variance": 1}),
            ("exponential", {"rate": 2.0}),
            ("weibull", {"shape": 1.5, "scale": 2.0}),
            ("uniform", {"min": 0.0, "max": 1.0}),
            ("beta", {"alpha": 2.0, "beta": 3.0}),
            ("gamma", {"alpha": 2.0, "beta": 3.0}),
            ("t", {"n": 5}),
            ("lognorm", {"mu": 0.0, "sigma": 1.0}),
        ]
        for name, params in cases:
            assert make_dist(name, params).sample(rng, 10).shape == (10,)
        mvn = make_dist("multivariate_normal", {"mean": [0.0, 1.0, 2.0]})
        assert mvn.sample(rng, 10).shape == (10, 3)

    def test_poisson_process_deterministic(self):
        mean_sampler = make_dist("normal", {"mean": 0, "variance": 100})
        factory = lambda m: make_dist("normal", {"mean": m, "variance": 1})  # noqa: E731
        a = poisson_segments(1000, 0.01, mean_sampler, factory, random_state=42)
        b = poisson_segments(1000, 0.01, mean_sampler, factory, random_state=42)
        assert [x[1] for x in a] == [x[1] for x in b]
        assert sum(x[1] for x in a) == 1000

    def test_spark_synthesis_matches_local(self, spark):
        cfgs = parse_config(CONFIG_YAML)
        df = synthesize_series_df(spark, cfgs, seed=42)
        got = (
            df.filter(F.col("series_id") == "gauss_shift")
            .orderBy("t")
            .toPandas()["value"]
            .to_numpy()
        )
        exp, _ = generate_sample(cfgs[0]["segments"], seed=42)
        assert np.array_equal(got, exp)
        cps = expected_cps_df(spark, cfgs).collect()
        assert {(r["series_id"], r["change_point"]) for r in cps} == {
            ("gauss_shift", 250)
        }


class TestTranscripts:
    def test_deterministic_and_schema(self, spark):
        a = synthesize_transcripts(spark, n_conversations=5, avg_turns=100, seed=42)
        b = synthesize_transcripts(spark, n_conversations=5, avg_turns=100, seed=42)
        pa = a.orderBy("conv_id", "turn_idx").toPandas()
        pb = b.orderBy("conv_id", "turn_idx").toPandas()
        assert pa.equals(pb)
        assert list(pa.columns) == [
            "conv_id",
            "turn_idx",
            "role",
            "text",
            "tool",
            "ts",
            "is_cp",
        ]

    def test_per_turn_text_invariant(self, spark):
        """input_hint invariant: text carries (conv_id, turn_idx) and is
        reproducible under stable ordering."""
        df = synthesize_transcripts(spark, n_conversations=3, avg_turns=50, seed=7)
        pdf = df.orderBy("conv_id", "turn_idx").toPandas()
        for _, row in pdf.iterrows():
            assert row["text"].startswith(f"{row['conv_id']}:{row['turn_idx']}:")
        # turn_idx contiguous per conv
        for _, grp in pdf.groupby("conv_id"):
            assert grp["turn_idx"].tolist() == list(range(len(grp)))
        # ts strictly increasing per conv
        for _, grp in pdf.groupby("conv_id"):
            assert grp["ts"].is_monotonic_increasing

    def test_expected_cps_extracted(self, spark):
        df = synthesize_transcripts(spark, n_conversations=4, avg_turns=200, seed=42)
        cps = expected_change_points(df)
        assert cps.count() > 0
        assert cps.columns == ["series_id", "change_point"]

    def test_skew_fixture(self, spark):
        df = synthesize_transcripts(
            spark, n_conversations=3, avg_turns=50, seed=1, hot_conversations=1, hot_turns=5000
        )
        sizes = {
            r["conv_id"]: r["n"]
            for r in df.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
        }
        assert sizes["conv00000000"] == 5000
        assert all(v < 200 for k, v in sizes.items() if k != "conv00000000")


def test_reference_yaml_configs_parse_verbatim():
    """The reference repo's own test YAMLs (tests/test_configs/*.yml) parse
    and sample without modification — including the stringified multivariate
    mean form ('["0.0", "1.0"]')."""
    for fname in ("test_config_1.yml", "test_config_exp.yml"):
        txt = open(f"/root/reference/tests/test_configs/{fname}").read()
        cfgs = parse_config(txt)
        assert cfgs
        for cfg in cfgs:
            values, cps = generate_sample(cfg["segments"], seed=1)
            total = sum(length for _, length in cfg["segments"])
            assert values.shape[0] == total
            assert cps == cfg["change_points"]


def test_with_text_false_preserves_all_other_columns(spark):
    """with_text=False must not perturb the rng stream: every non-text column
    is bit-identical to the full synthesis."""
    full = synthesize_transcripts(spark, n_conversations=6, avg_turns=80, seed=9)
    slim = synthesize_transcripts(
        spark, n_conversations=6, avg_turns=80, seed=9, with_text=False
    )
    cols = ["conv_id", "turn_idx", "role", "tool", "ts", "is_cp"]
    a = full.select(cols).orderBy("conv_id", "turn_idx").toPandas()
    b = slim.select(cols).orderBy("conv_id", "turn_idx").toPandas()
    assert a.equals(b)
    assert slim.filter(F.col("text") != "").count() == 0


@pytest.mark.parametrize(
    "name,params",
    [
        # port of the reference validation matrix
        # (tests/test_generator/test_distributions.py:7-79); this engine
        # collapses the reference's KeyError-vs-ValueError split into
        # ValueError (set-equality parameter checks)
        ("normal", {"mean": "0"}),
        ("normal", {"mean": "0", "var": "1"}),
        ("normal", {"mean": "0", "variance": "1", "x": "5"}),
        ("normal", {"mean": "0", "variance": "-1"}),
        ("exponential", {}),
        ("exponential", {"rt": "1"}),
        ("exponential", {"rate": "1", "x": "5"}),
        ("exponential", {"rate": "-1"}),
        ("weibull", {"shape": "0"}),
        ("weibull", {"shape": "0", "var": "1"}),
        ("weibull", {"shape": "1", "scale": "1", "x": "5"}),
        ("weibull", {"shape": "-1", "scale": "1"}),
        ("weibull", {"shape": "1", "scale": "-1"}),
        ("uniform", {"min": "0"}),
        ("uniform", {"min": "-1", "MAX": "1"}),
        ("uniform", {"min": "-1", "max": "1", "x": "5"}),
        ("uniform", {"min": "1", "max": "-1"}),
        ("beta", {"alpha": "1"}),
        ("beta", {"alpha": "1", "x": "1"}),
        ("beta", {"alpha": "1", "beta": "1", "x": "5"}),
        ("beta", {"alpha": "-1", "beta": "1"}),
        ("beta", {"alpha": "1", "beta": "-1"}),
        ("gamma", {"alpha": "1"}),
        ("gamma", {"alpha": "1", "x": "1"}),
        ("gamma", {"alpha": "1", "beta": "1", "x": "5"}),
        ("gamma", {"alpha": "-1", "beta": "1"}),
        ("gamma", {"alpha": "1", "beta": "-1"}),
        ("t", {}),
        ("t", {"N": "1"}),
        ("t", {"n": "1", "x": "5"}),
        ("t", {"n": "-1"}),
        ("lognorm", {}),
        ("lognorm", {"mu": "1"}),
        ("lognorm", {"mu": "0", "Sigma": "1"}),
        ("lognorm", {"mu": "0", "sigma": "1", "x": "5"}),
        ("lognorm", {"mu": "0", "sigma": "-1"}),
        ("multivariate_normal", {}),
        ("multivariate_normal", {"Mean": "[0.0, 0.0]"}),
        ("multivariate_normal", {"mean": "[0.0, 0.0]", "x": "5"}),
        ("multivariate_normal", {"mean": "[]"}),
    ],
)
def test_reference_validation_matrix(name, params):
    with pytest.raises(ValueError):
        make_dist(name, params)
