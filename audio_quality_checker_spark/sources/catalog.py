"""Table access layer: Iceberg when available, parquet otherwise.

The north rule targets Iceberg tables; this container ships no Iceberg
runtime jars, so every reader/writer here degrades to partitioned parquet
with the SAME partition layout and write semantics.  The mapping is
mechanical:

    spark.read.format("iceberg").load("db.pages")
        <-> spark.read.parquet(f"{root}/pages")
    df.writeTo("db.results").overwritePartitions()
        <-> partitionOverwriteMode=dynamic + write.mode("overwrite")
            .partitionBy(key).parquet(path)

When the jars are present (`--packages org.apache.iceberg:...`), set
ICEBERG_CATALOG and pass table identifiers instead of paths — the plan
shapes (partition pruning on p_day, column pruning of payloads) are
identical because both sources implement the same DataSource V2 pushdown
interfaces.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Schema  # type: ignore[attr-defined]
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """ref = an Iceberg identifier (catalog.db.table) when the runtime is
    present and ref contains no path separator; else a parquet path."""
    if "/" not in ref and iceberg_available(spark):
        return spark.read.format("iceberg").load(ref)
    return spark.read.parquet(ref)


def write_partitioned(df: DataFrame, ref: str, partition_col: str,
                      mode: str = "overwrite") -> None:
    """Idempotent partition-level write (Iceberg overwritePartitions
    semantics on the parquet fallback via dynamic partition overwrite)."""
    spark = df.sparkSession
    if "/" not in ref and iceberg_available(spark):
        w = df.writeTo(ref)
        if mode == "overwrite":
            w.overwritePartitions()
        else:
            w.append()
        return
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode(mode).partitionBy(partition_col).parquet(ref)


def default_warehouse() -> str:
    return os.environ.get("AQCS_WAREHOUSE", "/tmp/aqcs_warehouse")
