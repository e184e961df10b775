"""Format readers/writers with explicit schemas.

Scale notes: csv/json are splittable when uncompressed (or with
splittable codecs), so scans parallelize by
``spark.sql.files.maxPartitionBytes``; orc/parquet carry column stats
for pushdown. Writers default to snappy parquet-like behavior per
format; ``partition_by`` produces hive-style directory partitioning —
the layout that makes partition pruning work at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(spark: SparkSession, path: str, schema: str, header: bool = True, sep: str = ",") -> DataFrame:
    return spark.read.schema(schema).option("header", header).option("sep", sep).csv(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", header).csv(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_xml(spark: SparkSession, path: str, schema: str, row_tag: str = "row") -> DataFrame:
    """Built-in XML source (Spark 4): splittable by rowTag framing.
    Explicit schema, same contract as read_csv/read_json — inference
    would need an extra full scan at 100 TB."""
    return spark.read.format("xml").schema(schema).option("rowTag", row_tag).load(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite") -> None:
    df.write.format("xml").option("rowTag", row_tag).mode(mode).save(path)


def try_delta(spark: SparkSession):
    """Delta Lake connector, gated: the jar is not in this image.
    Returns the delta module or None (callers degrade to parquet)."""
    try:
        import delta  # type: ignore

        return delta
    except ImportError:
        return None


def has_avro(spark: SparkSession) -> bool:
    """Avro source availability, gated: Spark's avro DATA SOURCE is an
    external module (spark-avro jar) even though the avro core libs
    ship in jars/ — this image has the libs but not the source module.
    Probe once; callers degrade to parquet when False."""
    try:
        spark.read.format("avro").load("/nonexistent-avro-probe")
        return True  # pragma: no cover - only on images with spark-avro
    except Exception as e:
        # missing module raises AnalysisException FAILED_TO_FIND_DATA_SOURCE
        # before any path access; a path error means the source EXISTS
        return "Failed to find data source" not in str(e)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.format("avro").mode(mode).save(path)
