"""Scale smoke (round-8, VERDICT r7 item 4): the curation funnel END TO
END at 1M documents INCLUDING `curate-stream --follow` killed mid-run.

The 3-family kill/recover e2e (tests/test_stream_recovery.py) proves the
replay window is safe at sf-small with a surgically placed crash; this
smoke proves the same contract at scale with a blunt instrument — a
SIGKILL delivered to a live `--follow` service process while it is
draining a 1M-doc landing zone that GROWS under it:

1. CONTROL: both deliveries (day1 = 90%, day2 = 10%) land, one
   uninterrupted `curate_stream` run produces the reference accounting.
2. KILL RUN (separate landing + out_dir, same documents): day1 lands, a
   `python -m petasearch_spark curate-stream --follow` subprocess
   starts; once its bronze store shows progress, day2 lands and the
   process is SIGKILLed (no cleanup, no checkpoint flush beyond what
   already committed).
3. RECOVERY: one ordinary `curate_stream` invocation over the same
   landing/out_dir must finish the job — and its final accounting must
   EQUAL the control's exactly (every line parsed exactly once, funnel
   counts, kept docs, packed token count). Nothing is re-parsed, nothing
   is lost, nothing is doubled.

    python scripts/round8_curate_stream_1m_kill_smoke.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from dedup_scale_smoke import synth_documents  # noqa: E402
from petasearch_spark.session import get_spark
from petasearch_spark.streaming.curate_stream import curate_stream

MALFORMED_MOD = 1000
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: report keys that constitute "the accounting" — recovery must equal
#: control on every one of them
ACCOUNT_KEYS = [
    "n_input_lines",
    "n_quarantined",
    "n_staged",
    "n_dropped_null_fields",
    "n_kept",
    "kept_tokens",
    "n_packs",
]


def _dump(docs, path: str) -> None:
    line = F.to_json(
        F.struct(
            F.concat(F.lit("doc-"), F.col("doc_id")).alias("id"),
            "text",
            "lang",
            "source",
        )
    )
    value = F.when(
        F.col("doc_id") % MALFORMED_MOD == 7, F.substring(line, 1, 15)
    ).otherwise(line)
    docs.select(value.alias("value")).write.mode("overwrite").text(path)


def _bronze_files(out_dir: str) -> int:
    staging = os.path.join(out_dir, "staging")
    if not os.path.isdir(staging):
        return 0
    return sum(
        1 for _root, _d, files in os.walk(staging) for f in files if f.startswith("part-")
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_day1 = n_docs * 9 // 10
    spark = get_spark("curate_stream_1m_kill_smoke")
    tmp = tempfile.mkdtemp(prefix="cstream_kill_")
    out: dict[str, object] = {"n_docs": n_docs, "n_day1": n_day1}
    try:
        docs = synth_documents(spark, n_docs).persist()
        day1 = docs.filter(F.col("doc_id") < n_day1)
        day2 = docs.filter(F.col("doc_id") >= n_day1)

        # --- 1. control: uninterrupted run over both deliveries ----------
        c_landing = os.path.join(tmp, "c_landing")
        _dump(day1, os.path.join(c_landing, "day1"))
        _dump(day2, os.path.join(c_landing, "day2"))
        t0 = time.time()
        control = curate_stream(spark, c_landing, os.path.join(tmp, "c_out"))
        out["control_s"] = round(time.time() - t0, 1)
        out["control"] = {k: control[k] for k in ACCOUNT_KEYS}
        assert control["n_input_lines"] == n_docs, control["n_input_lines"]
        spark.catalog.clearCache()

        # --- 2. kill run: follow service, day2 lands under it, SIGKILL ---
        landing = os.path.join(tmp, "landing")
        out_dir = os.path.join(tmp, "out")
        _dump(day1, os.path.join(landing, "day1"))
        t0 = time.time()
        proc = subprocess.Popen(
            [
                sys.executable, "-m", "petasearch_spark", "curate-stream",
                landing, out_dir, "--follow",
                "--poll-interval", "1", "--idle-polls", "99", "--max-polls", "99",
            ],
            cwd=REPO,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        # wait until the service has demonstrably started parsing day1
        # (bronze part-files exist), then land day2 and kill while the
        # drain loop is live mid-corpus
        while _bronze_files(out_dir) == 0:
            assert proc.poll() is None, "follow service exited before progress"
            assert time.time() - t0 < 1200, "no bronze progress within 20 min"
            time.sleep(1)
        out["bronze_at_day2_s"] = round(time.time() - t0, 1)
        files_at_day2 = _bronze_files(out_dir)
        _dump(day2, os.path.join(landing, "day2"))
        # ADVICE r8: a fixed sleep does not guarantee the kill lands
        # MID-day2 — on a fast host day2 could be fully drained and
        # committed first, silently degrading this to recovery-of-nothing.
        # Poll until the bronze store grows past the at-day2 snapshot
        # (the drain loop has its hands on new work), bounded so a stalled
        # service still gets killed; record which case actually happened.
        day2_deadline = time.time() + 300
        while _bronze_files(out_dir) <= files_at_day2 and time.time() < day2_deadline:
            assert proc.poll() is None, "follow service exited before the kill"
            time.sleep(0.5)
        assert proc.poll() is None, "follow service exited before the kill"
        proc.send_signal(signal.SIGKILL)
        proc.wait()
        out["killed_at_s"] = round(time.time() - t0, 1)
        out["bronze_files_at_kill"] = _bronze_files(out_dir)
        # True = the kill interrupted a live day2 drain (the interesting
        # case); False = day2 grew nothing before the poll deadline, so
        # the kill only exercises day1-commit + day2-from-scratch recovery
        out["day2_drain_interrupted"] = out["bronze_files_at_kill"] > files_at_day2

        # --- 3. recovery: one ordinary run finishes the job --------------
        t0 = time.time()
        rec = curate_stream(spark, landing, out_dir)
        out["recovery_s"] = round(time.time() - t0, 1)
        out["recovery"] = {k: rec[k] for k in ACCOUNT_KEYS}
        out["recovery_resumed"] = rec["resumed_stages"]
        mismatch = {
            k: (control[k], rec[k]) for k in ACCOUNT_KEYS if control[k] != rec[k]
        }
        assert not mismatch, f"recovery accounting drift vs control: {mismatch}"
        # and a follow-up is a pure no-op (nothing half-committed remains)
        r2 = curate_stream(spark, landing, out_dir)
        assert r2["stream_batches"] == 0 and r2["n_kept"] == control["n_kept"]
        out["post_recovery_noop"] = True
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
