"""CSV / JSON readers with explicit schemas (SURVEY.md §2.B).

Explicit schemas are mandatory at scale: schema inference is a full
extra pass over the data. permissive/columnNameOfCorruptRecord capture
bad rows instead of failing the whole 100 TB job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StringType, StructType


def _with_corrupt_column(schema: StructType) -> StructType:
    if "_corrupt_record" in schema.fieldNames():
        return schema
    return StructType(list(schema.fields)
                      + [StructField("_corrupt_record", StringType())])


def read_csv(spark: SparkSession, path: str, schema: StructType,
             header: bool = True, delimiter: str = ",") -> DataFrame:
    return (spark.read
            .schema(_with_corrupt_column(schema))
            .option("header", header)
            .option("delimiter", delimiter)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .csv(path))


def read_json(spark: SparkSession, path: str,
              schema: StructType) -> DataFrame:
    return (spark.read
            .schema(_with_corrupt_column(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path))


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader (columnar twin of the parquet path: predicate
    pushdown and column pruning work the same way through the ORC
    datasource)."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str,
              whole: bool = False) -> DataFrame:
    """Line-oriented (or whole-file) text reader — the raw-corpus
    ingestion path; one `value` column, splits parallelize per file
    block like any file source."""
    return spark.read.option("wholetext", whole).text(path)


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None) -> DataFrame:
    """Opaque-payload ingestion via Spark's binaryFile source: one row
    per file with (path, modificationTime, length, content:binary) —
    the lane that loads image/audio/video blobs into the multimodal
    binary-column operators (operators/multimodal.py) without any
    decode on the scan. Column pruning applies: a metadata-only query
    (count by extension, byte totals) never reads `content`, so
    planning stats over a 100 TB blob store touches only footers."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


# Safe physical→target widenings for evolved reads. Anything outside
# this table is a narrowing (or a semantic change) and must fail
# loudly at load — the timestamp-layout lesson generalized to the
# whole schema.
_SAFE_WIDENINGS = {
    ("int", "bigint"), ("smallint", "int"), ("smallint", "bigint"),
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("float", "double"),
    ("int", "double"), ("bigint", "double"),
    ("timestamp_ntz", "timestamp"),
    ("date", "timestamp"),
}


def read_evolved(spark: SparkSession, paths: str | list[str],
                 target: StructType) -> DataFrame:
    """Schema-evolution-tolerant parquet read: batches written under
    older schema versions (missing columns, narrower numeric types,
    tz-less timestamps) surface under ONE target schema.

    Spark's own mergeSchema only merges ADDITIVE changes — a batch
    whose column widened int→bigint fails the footer merge outright —
    so each schema-version path is read with its own physical schema
    and aligned to the target independently:
    - columns a batch lacks come back as typed NULLs (the
      late-added-column case);
    - physical types are cast to the target ONLY along the safe
      widening table above — a narrowing or type swap raises a
      TypeError naming column/got/want instead of silently truncating
      values the way a blind cast would;
    - aligned batches union by name (plan-level: no data moves until
      an action).

    Column pruning and predicate pushdown still reach each scan: the
    alignment is a pure per-batch projection."""
    from functools import reduce

    from pyspark.sql import functions as F
    if isinstance(paths, str):
        paths = [paths]

    def align(df: DataFrame, path: str) -> DataFrame:
        have = dict(df.dtypes)
        cols = []
        for f in target.fields:
            want = f.dataType.simpleString()
            got = have.get(f.name)
            if got is None:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            elif got == want or (got, want) in _SAFE_WIDENINGS:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                raise TypeError(
                    f"column {f.name!r} at {path}: cannot evolve "
                    f"physical type {got!r} to target {want!r} — not "
                    "a safe widening")
        return df.select(*cols)

    parts = [align(spark.read.parquet(p), p) for p in paths]
    return reduce(DataFrame.unionByName, parts)


def split_malformed(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, quarantined): rows whose
    `_corrupt_record` is set failed the schema and carry the raw line
    for forensics; clean rows drop the audit column. Both branches
    are filters over the same scan — no extra read."""
    bad = df.where(F.col("_corrupt_record").isNotNull())
    clean = (df.where(F.col("_corrupt_record").isNull())
             .drop("_corrupt_record"))
    return clean, bad


def ingest_csv_with_quarantine(spark: SparkSession, path: str,
                               schema: StructType,
                               quarantine_path: str,
                               header: bool = True,
                               delimiter: str = ",") -> DataFrame:
    """Production CSV ingestion: PERMISSIVE parse, malformed rows
    written to a quarantine parquet (raw line + nulled columns, so
    the bad input is never silently dropped OR silently poured into
    the table), clean rows returned for the pipeline. The quarantine
    write is the only action here; the clean frame stays lazy for
    the caller's plan."""
    raw = read_csv(spark, path, schema, header=header,
                   delimiter=delimiter)
    clean, bad = split_malformed(raw)
    (bad.write.mode("append").parquet(quarantine_path))
    return clean
