"""CSV / JSON readers with explicit schemas (SURVEY.md §2.B).

Explicit schemas are mandatory at scale: schema inference is a full
extra pass over the data. permissive/columnNameOfCorruptRecord capture
bad rows instead of failing the whole 100 TB job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
