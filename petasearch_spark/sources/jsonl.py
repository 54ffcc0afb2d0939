"""JSONL corpus reader — the standard interchange format of web-scale
text pipelines (one JSON object per line: Common Crawl derivatives, Dolma,
RedPajama dumps). The format analogue of the engine's FASTA ingest (S1):
raw files in, a typed `documents`-shaped DataFrame out.

Scale posture, in order of importance at 100 TB:

* **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a full extra pass over every byte to infer one; with the
  schema given, the scan is single-pass and the JSON parser projects
  only the requested fields (Jackson skips the rest — column pruning at
  the parser level).
* **PERMISSIVE + corrupt-record column.** A 100 TB crawl always carries
  truncated/malformed lines; failing the job (FAILFAST) or silently
  dropping (DROPMALFORMED) are both wrong for curation — quarantine
  them to a side output instead and account for every input line.
* **gzip awareness.** ``.jsonl.gz`` is the common wire format but gzip
  is NOT splittable — one task per file, so shard size = task size.
  The reader works either way; repartition after ingest if the source
  shards are few and fat (the recompression into splittable
  parquet/zstd is exactly what :func:`write_documents` is for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the raw fields a crawl-style dump carries; extra keys in the input are
#: skipped by the parser (never materialized)
JSONL_DOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("_malformed", T.StringType()),
    ]
)


def read_jsonl_docs(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL document dump into the `documents` shape.

    Returns every input line as a row: well-formed lines carry parsed
    fields and ``_malformed IS NULL``; corrupt lines carry the raw line
    in ``_malformed`` with NULL fields. ``doc_id`` is the portable
    64-bit hash of the dump's own id (stable across re-ingests and
    engines — NOT ``monotonically_increasing_id``, which depends on
    partition layout); ``n_chars`` is computed, not trusted from the
    dump.

    Deliberately ``read.text`` + ``from_json`` rather than
    ``read.json``: same single pass and parser-level field skipping,
    but the corrupt record lands in an ORDINARY struct field — the
    native reader's internal corrupt column forbids any downstream
    query that prunes to it alone (UNSUPPORTED_FEATURE.QUERY_ONLY_
    CORRUPT_RECORD_COLUMN; the documented workaround is cache(), a
    non-starter at 100 TB).
    """
    return parse_jsonl_lines(spark.read.text(path))


def parse_jsonl_lines(raw: DataFrame) -> DataFrame:
    """THE dump-line parse, shared verbatim by the batch reader above and
    the streaming ingest (streaming/curate_stream.py) so stream and
    batch cannot drift: ``raw(value)`` lines -> documents-shaped rows
    with ``_malformed`` as an ordinary quarantine column (blank lines
    forced into quarantine — round-5 audit)."""
    from petasearch_spark.operators.portable import hash64

    parsed = raw.select(
        "value",
        F.from_json(
            "value",
            JSONL_DOC_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_malformed"},
        ).alias("j"),
    ).select(
        "j.*",
        # blank/whitespace-only lines parse as an all-NULL struct with
        # _malformed NULL (from_json never flags them), which would land
        # a NULL-field "document" in the CLEAN split — force them into
        # quarantine so every input line stays accounted (round-5 audit)
        F.when(
            F.col("j._malformed").isNull() & (F.trim("value") == ""), F.col("value")
        ).alias("_blank"),
    )
    parsed = parsed.withColumn(
        "_malformed", F.coalesce(F.col("_malformed"), F.col("_blank"))
    ).drop("_blank")
    return parsed.select(
        F.when(F.col("_malformed").isNull(), hash64(F.col("id"))).alias("doc_id"),
        "text",
        "lang",
        "source",
        "url",
        F.length("text").cast("long").alias("n_chars"),
        "_malformed",
    )


def split_malformed(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) split — quarantine keeps the raw line for
    replay after a parser fix; clean drops the bookkeeping column.

    ``_malformed`` is an ordinary column here (see read_jsonl_docs), so
    both sides are plain filters with no corrupt-column restrictions."""
    clean = docs.filter(F.col("_malformed").isNull()).drop("_malformed")
    bad = docs.filter(F.col("_malformed").isNotNull()).select("_malformed")
    return clean, bad


def write_documents(docs: DataFrame, path: str, partitions: int | None = None) -> None:
    """Recompress an ingested dump into the engine's canonical storage:
    splittable ZSTD parquet (the jsonl.gz -> parquet hop every pipeline
    does exactly once, so every later stage scans columnar with
    pushdown instead of re-parsing JSON)."""
    out = docs.repartition(partitions) if partitions else docs
    out.write.mode("overwrite").option("compression", "zstd").parquet(path)
