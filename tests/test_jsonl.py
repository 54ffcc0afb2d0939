"""JSONL corpus ingest (sources/jsonl.py): schema-first parse,
malformed-line quarantine, gzip transparency, parquet recompression."""

from __future__ import annotations

import gzip
import json
import sys

sys.path.insert(0, "/root/repo")

GOOD = [
    {"id": "d1", "text": "hello world", "lang": "en", "source": "web", "url": "http://a", "timestamp": "2024-01-01"},
    {"id": "d2", "text": "bonjour", "lang": "fr", "source": "web", "url": "http://b", "timestamp": "2024-01-02"},
    {"id": "d3", "text": "extra keys skipped", "lang": "en", "source": "books", "url": None, "timestamp": None, "ignored_key": 42},
]
BAD = ['{"id": "d4", "text": "trunca', "not json at all"]


def _write(path, lines):
    path.write_text("\n".join(lines) + "\n")


def test_parse_quarantine_and_stable_ids(spark, tmp_path):
    from petasearch_spark.sources.jsonl import read_jsonl_docs, split_malformed

    f = tmp_path / "dump.jsonl"
    _write(f, [json.dumps(g) for g in GOOD] + BAD)
    docs = read_jsonl_docs(spark, str(f))
    clean, bad = split_malformed(docs)
    crows = {r["text"]: r for r in clean.collect()}
    assert set(crows) == {"hello world", "bonjour", "extra keys skipped"}
    assert crows["hello world"]["n_chars"] == 11
    assert crows["hello world"]["doc_id"] is not None
    # every input line accounted for
    assert bad.count() == 2
    assert docs.count() == 5
    # doc_id is content-stable: re-reading a reshuffled copy gives the
    # same ids (monotonically_increasing_id would not)
    f2 = tmp_path / "dump2.jsonl"
    _write(f2, BAD + [json.dumps(g) for g in reversed(GOOD)])
    ids1 = {r["doc_id"] for r in clean.collect()}
    clean2, _ = split_malformed(read_jsonl_docs(spark, str(f2)))
    assert {r["doc_id"] for r in clean2.collect()} == ids1


def test_gzip_transparent(spark, tmp_path):
    from petasearch_spark.sources.jsonl import read_jsonl_docs, split_malformed

    f = tmp_path / "dump.jsonl.gz"
    with gzip.open(f, "wt") as fh:
        for g in GOOD:
            fh.write(json.dumps(g) + "\n")
    clean, bad = split_malformed(read_jsonl_docs(spark, str(f)))
    assert clean.count() == 3 and bad.count() == 0


def test_parquet_roundtrip_feeds_pipeline(spark, tmp_path):
    """Ingest -> recompress -> the dedup operator family runs on it."""
    from pyspark.sql import functions as F

    from petasearch_spark.sources.jsonl import (
        read_jsonl_docs,
        split_malformed,
        write_documents,
    )

    f = tmp_path / "dump.jsonl"
    _write(f, [json.dumps(g) for g in GOOD] + [json.dumps(GOOD[0] | {"id": "d9"})])
    clean, _ = split_malformed(read_jsonl_docs(spark, str(f)))
    out = tmp_path / "docs.parquet"
    write_documents(clean, str(out), partitions=2)
    back = spark.read.parquet(str(out))
    assert back.count() == 4
    # exact-dup by text hash finds the planted duplicate
    dups = (
        back.groupBy(F.md5("text").alias("h"))
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 1
