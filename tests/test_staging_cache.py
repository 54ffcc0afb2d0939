"""The staged_cache claim-by-rename contract (round-4 review fix): two
processes racing on one cache key must each observe either their own
build dir or a COMPLETE published dir — never a half-built one — and no
build debris may survive. Pure-filesystem test, no Spark session."""

from __future__ import annotations

import multiprocessing as mp
import os
import time


def _worker(root: str, q) -> None:
    from petasearch_spark.streaming.stateful import staged_cache

    def build(tmp: str) -> None:
        # two files written with a sleep between them: a process that
        # could see another's half-built dir would find f1 without f2
        with open(os.path.join(tmp, "f1"), "w") as f:
            f.write("one")
        time.sleep(0.3)
        with open(os.path.join(tmp, "f2"), "w") as f:
            f.write("two")

    out = staged_cache(root, build)
    q.put(
        (
            os.getpid(),
            sorted(os.listdir(out)),
            open(os.path.join(out, "f2")).read(),
        )
    )


def test_concurrent_processes_both_get_complete_dir(tmp_path):
    root = str(tmp_path / "key")
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(root, q)) for _ in range(4)]
    for p in procs:
        p.start()
    results = [q.get(timeout=60) for _ in procs]
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0
    for _pid, listing, payload in results:
        assert listing == ["f1", "f2"], listing
        assert payload == "two"
    # exactly one published dir, zero .build debris from rename losers
    assert sorted(os.listdir(tmp_path)) == ["key"]


def test_existing_dir_is_trusted_without_rebuild(tmp_path):
    from petasearch_spark.streaming.stateful import staged_cache

    root = str(tmp_path / "key")
    calls = []

    def build(tmp: str) -> None:
        calls.append(tmp)
        open(os.path.join(tmp, "x"), "w").close()

    assert staged_cache(root, build) == root
    assert staged_cache(root, build) == root
    assert len(calls) == 1  # second call is a pure cache hit
