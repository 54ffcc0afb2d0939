"""End-to-end test of the `curate` CLI: JSONL dump with planted
malformed lines -> quarantine accounting -> staged canonical store ->
funnel verdicts -> curated subset -> packed training examples, with
every count in the printed JSON line exactly reconcilable."""

import json
import math
import os

from pyspark.sql import functions as F

from petasearch_spark.cli import main
from petasearch_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
MALFORMED_MOD = 50


def test_curate_end_to_end_accounting(spark, tmp_path, capsys):
    docs = load_table(spark, "documents", SF)
    n_docs = docs.count()
    line = F.to_json(
        F.struct(
            F.concat(F.lit("doc-"), F.col("doc_id")).alias("id"),
            "text",
            "lang",
            "source",
        )
    )
    broken = F.when(
        F.col("doc_id") % MALFORMED_MOD == 7, F.substring(line, 1, 15)
    ).otherwise(line)
    dump = str(tmp_path / "dump.jsonl")
    # plus two VALID-JSON lines with missing id/text: parsed but dropped
    nulls = spark.createDataFrame(
        [('{"text": "orphan line without id"}',), ('{"id": "doc-x"}',)], ["value"]
    )
    docs.select(broken.alias("value")).union(nulls).coalesce(2).write.mode(
        "overwrite"
    ).text(dump)
    n_bad = docs.filter(F.col("doc_id") % MALFORMED_MOD == 7).count()

    out = str(tmp_path / "out")
    rc = main(["curate", dump, out])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # ingest accounting: every input line is quarantined, dropped, or staged
    assert report["n_quarantined"] == n_bad
    assert report["n_dropped_null_fields"] == 2
    assert report["n_staged"] == n_docs - n_bad
    assert report["n_quarantined"] + report["n_dropped_null_fields"] + report["n_staged"] == n_docs + 2
    # funnel verdicts cover exactly the staged docs; kept is consistent
    assert report["funnel"]["n_docs"] == report["n_staged"]
    assert report["n_kept"] == report["funnel"]["kept"]
    assert 0 < report["n_kept"] < report["n_staged"]
    # packing: contiguous concatenation of the kept tokens
    assert report["n_packs"] == math.ceil(report["kept_tokens"] / report["ctx_len"])

    # persisted artifacts agree with the report
    assert spark.read.parquet(os.path.join(out, "curated", "documents.parquet")).count() == report["n_kept"]
    fun = spark.read.parquet(os.path.join(out, "funnel.parquet"))
    assert fun.filter("kept").count() == report["n_kept"]
    # a kept doc is never eval, dup, contaminated, unsampled, or low-quality
    assert (
        fun.filter(
            "kept AND (is_eval OR exact_dup OR near_dup OR contaminated OR NOT sampled OR NOT quality_keep)"
        ).count()
        == 0
    )


def test_curate_accepts_parquet_documents_dir(spark, tmp_path, capsys):
    out = str(tmp_path / "out2")
    rc = main(["curate", SF, out])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["n_quarantined"] == 0
    assert report["n_staged"] == 500
    assert report["n_kept"] == report["funnel"]["kept"] > 0


def test_curate_real_world_sources_never_null_kept(spark, tmp_path, capsys):
    """Sources that don't match the synthetic 'srcN' shape (or are NULL)
    must fall back to the hashed rate — never a NULL `sampled`/`kept`
    that silently empties the curated output."""
    rows = []
    for i in range(60):
        # incl. a source whose suffix parses NEGATIVE ('cc:-3'): must hit
        # the hashed fallback, not a negative rate that samples nothing
        src = ["commoncrawl", "cc:-3", None][i % 3]
        rows.append((f"doc-{i}", f"unique text body number {i} with words {i*7} {i*13}", "en", src))
    df = spark.createDataFrame(rows, ["id", "text", "lang", "source"])
    dump = str(tmp_path / "rw.jsonl")
    df.select(F.to_json(F.struct("id", "text", "lang", "source")).alias("value")).coalesce(
        1
    ).write.mode("overwrite").text(dump)

    out = str(tmp_path / "out3")
    rc = main(["curate", dump, out])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["n_quarantined"] == 0 and report["n_staged"] == 60
    fun = spark.read.parquet(os.path.join(out, "funnel.parquet"))
    assert fun.filter("kept IS NULL OR sampled IS NULL").count() == 0
    assert report["funnel"]["n_docs"] == 60
    # with rates in [50,500] permille over 60 docs, some docs must sample in
    assert report["funnel"]["sampled"] > 0
    # the stratified sampler over the same staged store emits only
    # in-band rates for every source shape (incl. negative-suffix, NULL)
    from petasearch_spark.operators.corpus import corpus_sample_stratified

    rates = corpus_sample_stratified(spark, os.path.join(out, "staging")).select(
        "rate_permille"
    ).collect()
    assert all(50 <= r["rate_permille"] <= 500 for r in rates)


def test_curate_resume_is_idempotent_and_skips_complete_stages(spark, tmp_path, capsys):
    """--resume over a partially written store: _SUCCESS-complete stages
    are reused (including the persisted ingest accounting — the raw dump
    is never re-parsed), incomplete stages are recomputed, and the
    printed accounting line equals the uninterrupted run's exactly."""
    docs = load_table(spark, "documents", SF)
    line = F.to_json(
        F.struct(
            F.concat(F.lit("doc-"), F.col("doc_id")).alias("id"),
            "text",
            "lang",
            "source",
        )
    )
    broken = F.when(F.col("doc_id") % MALFORMED_MOD == 7, F.substring(line, 1, 15)).otherwise(line)
    dump = str(tmp_path / "dump.jsonl")
    docs.select(broken.alias("value")).coalesce(2).write.mode("overwrite").text(dump)

    out = str(tmp_path / "out")
    assert main(["curate", dump, out]) == 0
    full = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # simulate a crash after staging: funnel half-written (no marker),
    # later stages absent
    import shutil

    os.remove(os.path.join(out, "funnel.parquet", "_SUCCESS"))
    shutil.rmtree(os.path.join(out, "curated"))
    shutil.rmtree(os.path.join(out, "packs.parquet"))
    # poison the raw dump: a resume that reused staging must NOT re-parse
    # it (scramble a DATA part file — _SUCCESS/.crc siblings are ignored
    # by the text reader, so poisoning them would verify nothing). The
    # scramble keeps SIZE and MTIME identical: resume's input fingerprint
    # is path+size+mtime_ns by design (the source_fingerprint law — cheap,
    # no content hash), so a same-size in-place corruption is exactly the
    # change it cannot see, which is what makes "no re-parse" observable
    part = sorted(f for f in os.listdir(dump) if f.startswith("part-"))[0]
    ppath = os.path.join(dump, part)
    st = os.stat(ppath)
    with open(ppath, "r+") as f:
        f.write("THIS IS NOT JSON AND MUST NEVER BE READ ")
    os.utime(ppath, ns=(st.st_atime_ns, st.st_mtime_ns))

    assert main(["curate", dump, out, "--resume"]) == 0
    resumed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert resumed.pop("resumed_stages") == ["staging"]
    assert resumed == full

    # resume over the now-COMPLETE store: every stage is reused, counts
    # are recomputed from artifacts and still identical
    assert main(["curate", dump, out, "--resume"]) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again.pop("resumed_stages") == ["staging", "funnel", "curated", "packs"]
    assert again == full


def test_curate_resume_recomputes_downstream_of_a_recomputed_stage(spark, tmp_path, capsys):
    """Round-5 review finding: stage markers are per-generation — when an
    upstream stage recomputes (here: staging, after the dump grew and a
    rerun died mid-staging), every downstream stage must recompute too,
    even though its own _SUCCESS survives from the old generation.
    Without the cascade the report pairs the new n_staged with the old
    funnel/kept/packs counts."""
    import shutil

    docs = load_table(spark, "documents", SF).limit(200)
    line = F.to_json(
        F.struct(
            F.concat(F.lit("doc-"), F.col("doc_id")).alias("id"),
            "text",
            "lang",
            "source",
        )
    )
    dump = str(tmp_path / "dump.jsonl")
    docs.filter(F.col("doc_id") < 100).select(line.alias("value")).coalesce(1).write.mode(
        "overwrite"
    ).text(dump)
    out = str(tmp_path / "out")
    assert main(["curate", dump, out]) == 0
    capsys.readouterr()

    # the dump GROWS, and a rerun dies mid-staging (marker + sidecar gone)
    docs.select(line.alias("value")).coalesce(1).write.mode("overwrite").text(dump)
    os.remove(os.path.join(out, "staging", "documents.parquet", "_SUCCESS"))
    os.remove(os.path.join(out, "staging", "ingest.json"))

    assert main(["curate", dump, out, "--resume"]) == 0
    resumed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # nothing reusable: staging had no marker, and everything downstream
    # belonged to the 100-doc generation
    assert resumed["resumed_stages"] == []
    assert resumed["n_staged"] == 200
    assert resumed["funnel"]["n_docs"] == 200

    # the resumed store equals a from-scratch run over the same dump
    scratch = str(tmp_path / "scratch")
    assert main(["curate", dump, scratch]) == 0
    fresh = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    resumed.pop("resumed_stages")
    resumed["out_dir"] = fresh["out_dir"]
    assert resumed == fresh
    shutil.rmtree(scratch)


def test_curate_resume_detects_changed_input_despite_intact_markers(spark, tmp_path, capsys):
    """Round-5 ADVICE: --resume previously trusted an intact
    _SUCCESS-marked store + ingest.json with NO fingerprint of the input
    — if the dump changed but no rerun died mid-staging (markers all
    intact), resume silently paired the OLD staging/counts with the NEW
    input path in the printed report. The ingest sidecar now stores an
    input fingerprint (path+size+mtime_ns per file) and a mismatch
    forces full recompute."""
    docs = load_table(spark, "documents", SF).limit(150)
    line = F.to_json(
        F.struct(
            F.concat(F.lit("doc-"), F.col("doc_id")).alias("id"),
            "text",
            "lang",
            "source",
        )
    )
    dump = str(tmp_path / "dump.jsonl")
    docs.filter(F.col("doc_id") < 60).select(line.alias("value")).coalesce(1).write.mode(
        "overwrite"
    ).text(dump)
    out = str(tmp_path / "out")
    assert main(["curate", dump, out]) == 0
    capsys.readouterr()

    # the dump GROWS but every stage marker and the sidecar stay intact —
    # the exact blind spot the fingerprint closes
    docs.select(line.alias("value")).coalesce(1).write.mode("overwrite").text(dump)

    assert main(["curate", dump, out, "--resume"]) == 0
    resumed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert resumed["resumed_stages"] == []  # nothing trusted
    assert resumed["n_staged"] == 150
    assert resumed["funnel"]["n_docs"] == 150
