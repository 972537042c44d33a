"""Text-format corpus sources: JSONL and CSV, batch and streaming.

A 100 TB crawl rarely lands as parquet — raw drops are JSONL (one
document per line) or CSV exports. Policy, matching the engine's
parquet loaders (sources/tables.py):

- **Declared schemas, never inferred.** Schema inference is a full
  extra pass over the input (at 100 TB, its own job) and can silently
  change types between drops. The reference inferred its stream schema
  from a sample file (StructuredStreaming.scala:71-76, "brute force"
  per its own comment); here every reader takes the canonical
  ``DOCUMENTS_SCHEMA``.
- **Corrupt lines are data, not exceptions.** PERMISSIVE mode with an
  explicit ``_corrupt_record`` column: a malformed line becomes a row
  whose corrupt column holds the raw text, routed to a reject side by
  ``split_corrupt`` and counted — FAILFAST would kill a 1000-executor
  job on one bad crawl line, DROPMALFORMED would hide data loss.
- **Narrow, scan-fused.** Both readers produce the same columns as the
  parquet ``documents`` table, so every downstream operator (dedup,
  quality, packing, decontamination) runs unchanged on any format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from msstreamingstack_spark.schemas import DOCUMENTS_SCHEMA
from msstreamingstack_spark.session import apply_runtime_confs

CORRUPT_COL = "_corrupt_record"

# documents schema + the corrupt-capture column (PERMISSIVE contract:
# the capture column must be declared in the read schema)
DOCUMENTS_PERMISSIVE_SCHEMA = T.StructType(
    list(DOCUMENTS_SCHEMA.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
)

_DOC_COLS = [f.name for f in DOCUMENTS_SCHEMA.fields]


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Batch JSONL corpus reader (one JSON document per line)."""
    apply_runtime_confs(spark)
    return (
        spark.read.schema(DOCUMENTS_PERMISSIVE_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def stream_documents_jsonl(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming JSONL corpus source (file drops), same contract."""
    apply_runtime_confs(spark)
    return (
        spark.readStream.schema(DOCUMENTS_PERMISSIVE_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """Batch CSV corpus reader. ``multiLine`` handles quoted newlines in
    document text; escaped quotes follow the csv module's doubling
    convention (``escape='"'``)."""
    apply_runtime_confs(spark)
    return (
        spark.read.schema(DOCUMENTS_PERMISSIVE_SCHEMA)
        .option("header", "true")
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def split_corrupt(
    df: DataFrame, cache: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(clean, rejected): clean rows carry exactly the canonical
    documents columns; rejected rows carry the raw offending line.

    Spark refuses a query that references ONLY the corrupt column over
    raw JSON/CSV (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the documented
    shape is to cache the parsed frame first, which also means the
    file is parsed once for both branches. The cached relation lives
    until the session drops it: a long-lived driver splitting many
    files should ``clean.unpersist()``-via-the-parent (or
    ``spark.catalog.clearCache()``) after consuming both branches, or
    pass ``cache=False`` and consume only the clean branch. Streaming
    frames never cache; there the rejected branch also references data
    columns at sink time, which is allowed.
    """
    if cache and not df.isStreaming:
        df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).select(*_DOC_COLS)
    rejected = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, rejected


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """Round-trip helper (tests, interchange): canonical column order,
    one JSON object per line."""
    df.select(*_DOC_COLS).write.mode("overwrite").json(path)


def write_documents_csv(df: DataFrame, path: str) -> None:
    df.select(*_DOC_COLS).write.mode("overwrite").option("header", "true").option(
        "quote", '"'
    ).option("escape", '"').csv(path)


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """Batch ORC corpus reader — columnar like parquet (predicate
    pushdown + column pruning apply), declared schema; no corrupt-line
    concept (ORC is self-describing, a bad file fails the split, not
    the row)."""
    apply_runtime_confs(spark)
    return spark.read.schema(DOCUMENTS_SCHEMA).orc(path)


def write_documents_orc(df: DataFrame, path: str) -> None:
    df.select(*_DOC_COLS).write.mode("overwrite").orc(path)


def read_documents_xml(spark: SparkSession, path: str) -> DataFrame:
    """Batch XML corpus reader (Spark 4 NATIVE xml source — no
    external spark-xml package): one <doc> element per document,
    declared schema (no inference pass over 100 TB), PERMISSIVE mode
    so a malformed element nulls its row instead of failing the job.
    XML is a row-tag text format like JSONL — no pushdown/pruning at
    the scan, so it is an INGEST format here: read once, write
    parquet, query the parquet."""
    apply_runtime_confs(spark)
    return (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema(DOCUMENTS_SCHEMA)
        .load(path)
    )


def write_documents_xml(df: DataFrame, path: str) -> None:
    df.select(*_DOC_COLS).write.format("xml").option("rootTag", "corpus").option(
        "rowTag", "doc"
    ).mode("overwrite").save(path)
