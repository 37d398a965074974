"""Deterministic hash-based dataset splitting and sampling.

At 100 TB you cannot afford a shuffle — or a random() that changes
between runs / executors — to carve train/val/test splits or draw a
reproducible sample. The standard public recipe: hash a stable id,
map the hash to [0, 1), and compare against cumulative weight
thresholds. Everything here is a pure map-side JVM expression, so it
runs at scan speed, is stable across runs, engines, cluster sizes,
and partitionings, and composes with predicate pushdown.

Cross-engine detail: instead of converting the md5 hex digest to an
integer (Spark ``conv`` has no DuckDB counterpart), the digest STRING
is compared against precomputed 32-hex-char thresholds — lowercase
hex compares identically under Spark's UTF8_BINARY and DuckDB's
binary varchar collation, so the same row lands in the same split in
both engines (oracle-checkable bit-exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 1 << 128  # md5 digest space


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """Normalize ``weights`` and return [(split_name, upper_bound_hex)]
    in insertion order; the last split's bound is 'f' * 32 (inclusive
    end of the digest space). Bounds are 32-char lowercase hex strings
    directly comparable against an md5 hex digest."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        # a negative weight would format as a '-'-prefixed hex bound,
        # which sorts below every digest and silently empties a split
        raise ValueError("weights must be non-negative")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    out: list[tuple[str, str]] = []
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        bound = min(int(cum * _HEX_SPACE), _HEX_SPACE - 1)
        out.append((name, format(bound, "032x")))
    out.append((names[-1], "f" * 32))
    return out


def _digest(id_col: Column, salt: str) -> Column:
    return F.md5(F.concat(id_col.cast("string"), F.lit(salt)))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
    hash_col: str | None = None,
) -> DataFrame:
    """Assign every row a deterministic split label from ``weights``
    (e.g. ``{"train": 0.9, "val": 0.05, "test": 0.05}``) keyed on
    ``md5(id || salt)``. Change ``salt`` to draw an independent
    split. Pass ``hash_col`` to also keep the digest column."""
    thresholds = split_thresholds(weights)
    h = _digest(F.col(id_col), salt)
    expr = None
    for name, bound in thresholds[:-1]:
        cond = h < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(thresholds[-1][0])
    split = last if expr is None else expr.otherwise(last)
    out = df.withColumn(split_col, split)
    if hash_col:
        out = out.withColumn(hash_col, h)
    return out


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose digest
    falls below the fraction threshold. Nested samples with the same
    salt: ``hash_sample(df, 0.1)`` is a subset of
    ``hash_sample(df, 0.5)`` — useful for scaling-law subset chains."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if fraction >= 1.0:
        return df
    bound = format(min(int(fraction * _HEX_SPACE), _HEX_SPACE - 1), "032x")
    return df.filter(_digest(F.col(id_col), salt) < F.lit(bound))
