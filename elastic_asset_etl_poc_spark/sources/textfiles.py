"""Text-format sources: NDJSON (JSON Lines) and CSV readers with
mandatory explicit schemas.

Crawl dumps, API exports and log drops arrive as jsonl/csv long before
anyone converts them to parquet; an ingest engine needs first-class
readers for both.  Two scale rules are enforced here rather than left to
the caller:

* **No schema inference.**  ``inferSchema``/sampling reads the data
  twice and produces a schema that silently changes when the data does —
  at 100 TB that is both a double scan and a correctness hazard.  The
  schema is a required argument; unparseable rows land in a
  ``_corrupt_record`` column (PERMISSIVE) instead of killing the job, so
  one bad crawl line cannot fail a 10-hour ingest.
* **Splittability.**  Plain (uncompressed or bgzip'd) jsonl/csv splits
  by line across executors — Spark parallelizes a single large file
  fine.  Gzip does NOT split; the reader warns via docstring contract:
  feed ``.gz`` shards at most ~max-partition-bytes each or recompress.

Corrupt-row accounting is explicit: :func:`read_jsonl` keeps the
``_corrupt_record`` column when ``keep_corrupt=True`` so the pipeline
can quarantine bad lines (count them, write them to a reject store)
instead of dropping them silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSON Lines with an explicit schema (DDL string).

    PERMISSIVE mode: rows that fail to parse yield NULLs plus the raw
    line in ``_corrupt_record``; ``keep_corrupt=True`` exposes that
    column for quarantine accounting, otherwise it is dropped.
    """
    full = schema + f", {CORRUPT_COL} string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return df if keep_corrupt else df.drop(CORRUPT_COL)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    sep: str = ",",
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read CSV with an explicit schema (DDL string), no inference pass."""
    full = schema + f", {CORRUPT_COL} string"
    df = (
        spark.read.schema(full)
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    return df if keep_corrupt else df.drop(CORRUPT_COL)
