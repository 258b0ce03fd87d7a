"""Deterministic dataset synthesis (parity: reference generator/ package).

The reference synthesizes labeled CPD samples by concatenating scipy-sampled
segments (generator.py:54-90), with nine parameterized distributions
(distributions.py:82-464), a Poisson change-point process
(changepoint_process.py:46-109) and a YAML config schema (config_parser.py).
This module reimplements the same laws on numpy Generators (scipy-free) and
adds the Spark side: synthesis of a long-format (series_id, t, value) frame
distributed via mapInPandas with per-series seeded RNGs — a pure function of
(seed, series index), which is what makes resume-from-checkpoint exact.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator

import numpy as np
import pandas as pd

# -- distribution catalog ----------------------------------------------------


@dataclass(frozen=True)
class Dist:
    """A named, validated sampling law backed by numpy Generator methods."""

    name: str
    params: dict[str, float | list[float]]

    def sample(self, rng: np.random.Generator, size: int) -> np.ndarray:
        p = self.params
        if self.name == "normal":
            return rng.normal(p["mean"], np.sqrt(p["variance"]), size)
        if self.name == "exponential":
            return rng.exponential(1.0 / p["rate"], size)
        if self.name == "weibull":
            return p["scale"] * rng.weibull(p["shape"], size)
        if self.name == "uniform":
            return rng.uniform(p["min"], p["max"], size)
        if self.name == "beta":
            return rng.beta(p["alpha"], p["beta"], size)
        if self.name == "gamma":
            return rng.gamma(p["alpha"], 1.0 / p["beta"], size)
        if self.name == "t":
            return rng.standard_t(p["n"], size)
        if self.name == "lognorm":
            return rng.lognormal(p["mu"], p["sigma"], size)
        if self.name == "multivariate_normal":
            mean = np.asarray(p["mean"], dtype=np.float64)
            return rng.multivariate_normal(mean, np.eye(mean.shape[0]), size)
        raise ValueError(f"unknown distribution {self.name}")


_VALIDATORS: dict[str, Callable[[dict], None]] = {}


def _check(name: str, cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(f"{name}: {msg}")


def make_dist(name: str, params: dict) -> Dist:
    """Validated constructor mirroring the reference's from_params checks."""
    # the reference YAML encodes vector parameters as stringified lists
    # ('["0.0", "1.0"]', tests/test_configs/test_config_1.yml) — decode first
    decoded = {}
    for k, v in params.items():
        if isinstance(v, str) and v.lstrip().startswith("["):
            import ast

            v = [float(x) for x in ast.literal_eval(v)]
        decoded[k] = v
    p = {k: (v if isinstance(v, list) else float(v)) for k, v in decoded.items()}
    if name == "normal":
        _check(name, set(p) == {"mean", "variance"}, "needs mean, variance")
        _check(name, p["variance"] >= 0, "variance cannot be negative")
    elif name == "exponential":
        _check(name, set(p) == {"rate"}, "needs rate")
        _check(name, p["rate"] > 0, "rate must be positive")
    elif name == "weibull":
        _check(name, set(p) == {"shape", "scale"}, "needs shape, scale")
        _check(name, p["shape"] > 0 and p["scale"] > 0, "shape/scale must be positive")
    elif name == "uniform":
        _check(name, set(p) == {"min", "max"}, "needs min, max")
        _check(name, p["max"] > p["min"], "max must exceed min")
    elif name in ("beta", "gamma"):
        _check(name, set(p) == {"alpha", "beta"}, "needs alpha, beta")
        _check(name, p["alpha"] > 0 and p["beta"] > 0, "alpha/beta must be positive")
    elif name == "t":
        _check(name, set(p) == {"n"}, "needs n")
        _check(name, p["n"] > 0 and float(p["n"]).is_integer(), "n must be positive int")
    elif name == "lognorm":
        _check(name, set(p) == {"mu", "sigma"}, "needs mu, sigma")
        _check(name, p["sigma"] > 0, "sigma must be positive")
    elif name == "multivariate_normal":
        _check(name, set(p) == {"mean"}, "needs mean vector")
        _check(name, len(p["mean"]) >= 1, "mean needs dimension >= 1")
    else:
        raise ValueError(f"unknown distribution {name}")
    return Dist(name, p)


# -- sample generation (concatenated segments) -------------------------------


def generate_sample(
    segments: list[tuple[Dist, int]], seed: int
) -> tuple[np.ndarray, list[int]]:
    """Concatenate per-segment samples; change points = cumulative lengths
    minus the final boundary (reference generator.py:70-76)."""
    rng = np.random.default_rng(seed)
    parts = [d.sample(rng, length) for d, length in segments]
    lengths = [length for _, length in segments]
    cps = list(np.cumsum(lengths)[:-1])
    return np.concatenate(parts), [int(c) for c in cps]


def poisson_segments(
    total_length: int,
    cp_intensity_per_point: float,
    mean_sampler: Dist,
    dist_factory: Callable[[float], Dist],
    random_state: int = 42,
) -> list[tuple[Dist, int]]:
    """Poisson change-point process: segment lengths ~ Exp(1/intensity)
    (rounded, >=1, truncated at the end), per-segment distribution built from
    a sampled mean (reference changepoint_process.py:90-109)."""
    if total_length <= 0 or cp_intensity_per_point <= 0:
        raise ValueError("length and intensity must be positive")
    rng = np.random.default_rng(random_state)
    avg = 1.0 / cp_intensity_per_point
    out: list[tuple[Dist, int]] = []
    current = 0
    while current < total_length:
        proposed = max(1, round(float(rng.exponential(avg))))
        seg_len = min(proposed, total_length - current)
        mean = float(mean_sampler.sample(rng, 1)[0])
        out.append((dist_factory(mean), seg_len))
        current += seg_len
    return out


# -- YAML config (reference config_parser.py / docs Guide CPD Benchmark) -----


def parse_config(yaml_text: str) -> list[dict]:
    """[{name, segments: [(Dist, length)...], change_points: [...]}] from the
    reference YAML schema: list of {name, distributions: [{type, length,
    parameters}]}."""
    import yaml

    raw = yaml.safe_load(yaml_text)
    if not isinstance(raw, list):
        raise ValueError("config must be a list of datasets")
    datasets = []
    for entry in raw:
        name = entry["name"]
        segs = []
        for d in entry["distributions"]:
            length = int(d["length"])
            if length <= 0:
                raise ValueError(f"{name}: segment length must be positive")
            segs.append((make_dist(d["type"], d.get("parameters", {})), length))
        cps = list(np.cumsum([length for _, length in segs])[:-1])
        datasets.append(
            {"name": name, "segments": segs, "change_points": [int(c) for c in cps]}
        )
    return datasets


# -- Spark-side distributed synthesis ---------------------------------------


def synthesize_series_df(
    spark,
    configs: list[dict],
    seed: int = 42,
):
    """Materialize configured datasets as a long (series_id, t, value) frame.
    Each dataset synthesizes independently inside mapInPandas with rng seeded
    by (seed, dataset index) — deterministic, partition-order independent."""
    from pyspark.sql import functions as F

    payload = [
        (
            i,
            c["name"],
            [[d.name, d.params, length] for d, length in c["segments"]],
        )
        for i, c in enumerate(configs)
    ]
    # ship configs through the plan as an indexed table; regenerate per row
    index_df = spark.createDataFrame(
        [(i, name) for i, name, _ in payload], "idx long, series_id string"
    )
    seg_lookup = {i: segs for i, _, segs in payload}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                segs = [
                    (Dist(name, params), int(length))
                    for name, params, length in seg_lookup[int(row["idx"])]
                ]
                values, _ = generate_sample(segs, seed=seed + int(row["idx"]))
                yield pd.DataFrame(
                    {
                        "series_id": row["series_id"],
                        "t": np.arange(values.shape[0], dtype=np.int64),
                        "value": values.astype(np.float64),
                    }
                )

    return (
        index_df.repartition(min(len(payload), 64), "idx")
        .mapInPandas(gen, "series_id string, t long, value double")
    )


def expected_cps_df(spark, configs: list[dict]):
    rows = [
        (c["name"], int(cp)) for c in configs for cp in c["change_points"]
    ]
    return spark.createDataFrame(rows or [], "series_id string, change_point long")
