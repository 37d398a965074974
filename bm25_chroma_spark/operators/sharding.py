"""Training-data output sharding: deterministic shard assignment and
a one-shuffle sorted shard writer with a counted manifest.

The last stage of a 100 TB pipeline writes the cleaned/mixed/packed
corpus as N fixed shards that trainers can stream and resume from.
Requirements that shape this design:

- **Deterministic placement** — shard membership must not depend on
  cluster size, partitioning, or run order, so reruns and incremental
  audits agree: shard = (first 8 hex chars of md5(id || salt) as an
  integer) mod n_shards. Like functions/splits.py, the digest is also
  reproducible in ANSI SQL, so the assignment is oracle-checkable
  bit-exactly (DuckDB rebuilds the integer with a strpos polynomial —
  Spark's conv() has no DuckDB twin, 32 bits of digest do).
  Bias note: 2^32 mod n_shards leaves a <= n_shards/2^32 relative
  imbalance — immaterial for any real shard count.
- **One shuffle total** — repartition(n_shards, shard) puts each
  shard's rows in exactly one task; sortWithinPartitions makes every
  shard file's row order (and hence bytes) a pure function of its
  row set; partitionBy(shard) writes one directory per shard. No
  second pass, no driver residency.
- **A manifest the trainer can trust** — per-shard row counts and
  payload sums from one partial-aggregable groupBy over the SAME
  assignment expression, committed via write-tmp-then-rename after
  the data lands (crash leaves no manifest -> readers treat the
  output as absent, matching the index writer's atomicity contract,
  index/shards.py).

No reference-repo counterpart (/root/reference stops at retrieval);
this is the beyond-reference pipeline-output family.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_HEXDIGITS = "0123456789abcdef"


def shard_expr(id_col: str, n_shards: int, salt: str = "") -> F.Column:
    """Deterministic shard id in [0, n_shards): int(md5[:8], 16) mod
    n_shards, as a pure JVM expression (map-side, scan-speed)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")


def shard_sql_expr(id_sql: str, n_shards: int, salt: str = "") -> str:
    """ANSI-SQL twin of :func:`shard_expr` for oracle checks: DuckDB
    has no base-16 conv(), so the 8-char digest prefix becomes an
    integer via a strpos polynomial (16^7 .. 16^0)."""
    h = f"md5(CAST({id_sql} AS VARCHAR) || '{salt}')"
    terms = " + ".join(
        f"(strpos('{_HEXDIGITS}', substr({h}, {j + 1}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"(({terms})::BIGINT % {n_shards})::INT"


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Attach the deterministic shard id (zero shuffle)."""
    return df.withColumn(shard_col, shard_expr(id_col, n_shards, salt))


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
    sum_cols: tuple[str, ...] = (),
    shard_col: str = "shard_id",
    order: str = "id",
) -> dict:
    """Write ``df`` as ``n_shards`` sorted parquet shards under
    ``path`` (one directory and one file per shard) plus an
    atomically-committed ``_manifest.json`` (underscore-prefixed so
    Spark/Hadoop readers of the shard store skip it, like _SUCCESS)
    carrying per-shard row counts and ``sum_cols`` payload sums
    (e.g. a token count column — lets the trainer budget steps
    without a scan). Returns the manifest dict. Manifest IO is plain
    local-FS file ops here; an object-store deployment would route
    them through the Hadoop FS API like scripts/prep_corpus.py does
    for its staged parquet.

    ``order`` picks the in-file row order — either way a pure
    function of the row set, so reruns are byte-identical:

    - ``"id"`` (default): sorted by ``id_col`` — resumable range
      reads, friendliest parquet encoding.
    - ``"shuffled"``: sorted by ``md5(id || salt || '#order')`` — a
      seeded GLOBAL example shuffle (the T5/C4 pre-training step):
      trainers stream pre-mixed data without a runtime shuffle
      buffer, and because the order key reuses the id digest family
      it decorrelates from any id/source/time ordering. The id
      breaks digest-collision ties.

    The write itself is ONE shuffle (repartition on the shard id);
    the manifest agg shares the map-side assignment and partial-
    aggregates, so the whole sink is two jobs over one scan each."""
    if order == "id":
        sort_keys = [F.col(shard_col), F.col(id_col)]
    elif order == "shuffled":
        sort_keys = [
            F.col(shard_col),
            F.md5(F.concat(
                F.col(id_col).cast("string"), F.lit(salt + "#order")
            )),
            F.col(id_col),
        ]
    else:
        raise ValueError("order must be 'id' or 'shuffled'")
    assigned = assign_shards(df, n_shards, id_col, salt, shard_col)
    (
        assigned.repartition(n_shards, F.col(shard_col))
        .sortWithinPartitions(*sort_keys)
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(path)
    )
    aggs = [F.count(F.lit(1)).alias("n_rows"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id")]
    aggs += [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    stats = assigned.groupBy(shard_col).agg(*aggs).collect()
    shards = {
        int(r[shard_col]): {k: r[k] for k in r.asDict() if k != shard_col}
        for r in stats
    }
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "salt": salt,
        "order": order,
        "total_rows": int(sum(s["n_rows"] for s in shards.values())),
        "shards": {str(k): shards[k] for k in sorted(shards)},
    }
    tmp = os.path.join(path, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    os.replace(tmp, os.path.join(path, "_manifest.json"))
    return manifest


def read_shard_manifest(path: str) -> dict:
    with open(os.path.join(path, "_manifest.json")) as f:
        return json.load(f)


def validate_shards(spark: SparkSession, path: str) -> dict:
    """Recount the written shards and compare against the manifest.
    Returns {"ok": bool, "mismatches": [...]} — an audit pass a 100 TB
    pipeline runs before handing the output to a trainer (one
    partial-aggregable groupBy over the shard store; partition
    pruning applies if the reader filters shards)."""
    manifest = read_shard_manifest(path)
    got = {
        int(r["shard_id"]): int(r["count"])
        for r in spark.read.parquet(path).groupBy("shard_id").count().collect()
    }
    mismatches = []
    for k, meta in manifest["shards"].items():
        if got.get(int(k), 0) != int(meta["n_rows"]):
            mismatches.append(
                {"shard": int(k), "manifest": int(meta["n_rows"]),
                 "found": got.get(int(k), 0)}
            )
    for k in got:
        if str(k) not in manifest["shards"]:
            mismatches.append(
                {"shard": k, "manifest": 0, "found": got[k]}
            )
    return {"ok": not mismatches, "mismatches": mismatches}
