"""Table IO: Iceberg-first with parquet fallback.

The production target (BASELINE.json input_hint) is an Iceberg table
of source-code repositories. This environment has no Iceberg runtime
jar, so the helpers probe for the format and degrade to parquet
transparently — the engine code is identical either way (both are
DataFrame scans with pushdown/pruning; Iceberg additionally brings
snapshot ids for build lineage and MERGE INTO for corpus upserts).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_corpus(
    spark: SparkSession,
    location: str,
    fmt: Optional[str] = None,
) -> DataFrame:
    """Read the corpus table.

    location: an Iceberg table identifier (catalog.db.tbl) or a
    filesystem path. fmt forces 'iceberg' or 'parquet'; default
    auto-detects (identifier + iceberg jar -> iceberg, else parquet).
    """
    if fmt == "iceberg" or (
        fmt is None and "/" not in location and iceberg_available(spark)
    ):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_corpus(
    df: DataFrame,
    location: str,
    fmt: Optional[str] = None,
    mode: str = "append",
) -> None:
    if fmt == "iceberg" or (
        fmt is None
        and "/" not in location
        and iceberg_available(df.sparkSession)
    ):
        df.writeTo(location).append() if mode == "append" else (
            df.writeTo(location).createOrReplace()
        )
        return
    df.write.mode(mode).parquet(location)


def snapshot_id(spark: SparkSession, location: str) -> Optional[str]:
    """Iceberg snapshot id for build-manifest lineage; None on
    plain parquet (lineage falls back to row counts)."""
    if iceberg_available(spark) and "/" not in location:
        try:
            row = (
                spark.sql(
                    f"SELECT snapshot_id FROM {location}.snapshots "
                    "ORDER BY committed_at DESC LIMIT 1"
                ).collect()
            )
            return str(row[0][0]) if row else None
        except Exception:
            return None
    return None
