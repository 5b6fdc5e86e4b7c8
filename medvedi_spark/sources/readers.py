"""File sources & sinks (SURVEY §2.1 S7).

The reference has NO file formats — Arrow tables and a custom binary blob
are its only I/O (`medvedi/io.pyx`; absence of any reader elsewhere).
Spark supplies csv/json/parquet/orc/text for free; these wrappers expose
them as MDF constructors/sinks so a reference user's load-compute-store
loop maps 1:1. Schema-on-write discipline (§1.2): every reader takes an
optional explicit schema and never silently infers twice.

Scale notes: parquet is the cache/serialize replacement (columnar,
predicate-pushdown-able, splittable). CSV/JSON readers run distributed
and splittable (multiLine=False) — a 100 TB text corpus reads in
parallel without driver involvement.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from medvedi_spark.frame import MDF, ROW_ID


def _spark(spark: SparkSession | None) -> SparkSession:
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("no active SparkSession; pass spark=")
    return s


def read_parquet(path: str, *, spark: SparkSession | None = None, index=()) -> MDF:
    return MDF.read_parquet(path, spark=_spark(spark), index=index)


def read_csv(
    path: str,
    *,
    header: bool = True,
    schema: str | None = None,
    sep: str = ",",
    spark: SparkSession | None = None,
    index=(),
) -> MDF:
    reader = _spark(spark).read.option("header", header).option("sep", sep)
    reader = reader.schema(schema) if schema else reader.option("inferSchema", True)
    return MDF.from_spark(reader.csv(path), index=index)


def read_json(
    path: str,
    *,
    schema: str | None = None,
    multiline: bool = False,
    spark: SparkSession | None = None,
    index=(),
) -> MDF:
    reader = _spark(spark).read.option("multiLine", multiline)
    if schema:
        reader = reader.schema(schema)
    return MDF.from_spark(reader.json(path), index=index)


def read_arrow(table, *, spark: SparkSession | None = None, index=()) -> MDF:
    """S3 `from_arrow` (`medvedi/dataframe.py:1059-1066`)."""
    return MDF.from_arrow(table, spark=_spark(spark), index=index)


def write_parquet(df: MDF, path: str, *, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.df.drop(ROW_ID).write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: MDF, path: str, *, mode: str = "overwrite", header: bool = True) -> None:
    df.df.drop(ROW_ID).write.mode(mode).option("header", header).csv(path)


def write_json(df: MDF, path: str, *, mode: str = "overwrite") -> None:
    df.df.drop(ROW_ID).write.mode(mode).json(path)


def write_bucketed(
    df: MDF,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed table: rows hash-partition into ``n_buckets`` files by
    ``bucket_cols`` at WRITE time, so every later join or aggregation on
    those keys reads co-located data and skips its shuffle entirely
    (verified by tests/test_scale_utils.py). This is the 100 TB answer
    for a fact table joined repeatedly on one key: pay the shuffle once
    at ingest, never again. ``path`` makes the table EXTERNAL at that
    location (otherwise data lands under the session's warehouse dir,
    which defaults to the process cwd — pass a path when the caller
    can't control the cwd)."""
    w = df.df.drop(ROW_ID).write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(table: str, *, spark: SparkSession | None = None, index=()) -> MDF:
    return MDF.from_spark(_spark(spark).table(table), index=index)


def read_orc(path: str, *, spark: SparkSession | None = None, index=()) -> MDF:
    """ORC: the other columnar format with native predicate pushdown and
    column pruning in Spark's DataSource V2 — same scale properties as
    parquet (splittable stripes, footer statistics)."""
    return MDF.from_spark(_spark(spark).read.orc(path), index=index)


def write_orc(df: MDF, path: str, *, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.df.drop(ROW_ID).write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_text(
    path: str,
    *,
    whole_text: bool = False,
    line_sep: str | None = None,
    spark: SparkSession | None = None,
    index=(),
) -> MDF:
    """Raw text corpus reader: one row per line (splittable — a 100 TB
    text dump reads in parallel), or one row per FILE with
    ``whole_text=True`` (document-per-file corpora; not splittable, so
    parallelism = file count). Column name: ``value`` (Spark contract).
    """
    reader = _spark(spark).read
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    # NB: must go through the kwarg — .option("wholetext", True) stringifies
    # to "True", which the text source silently fails to parse as a boolean.
    return MDF.from_spark(reader.text(path, wholetext=whole_text), index=index)


def write_text(df: MDF, path: str, *, mode: str = "overwrite", column: str = "value") -> None:
    """Single-string-column sink (one line per row)."""
    df.df.drop(ROW_ID).select(column).write.mode(mode).text(path)
