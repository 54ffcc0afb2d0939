"""Unit tests for the data-selection operators (DSIR + NB classifier).

Oracle parity at both SFs rides tests/test_oracle_parity.py (registry-
driven); these pin the semantics the oracle can't isolate: separable-
corpus learning, the exact-decimal argmax tie-break, target-slice
ranking, and the zero-token-document contract.
"""

import os

from petasearch_spark.operators import selection


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    return str(tmp_path)


def test_nb_learns_a_separable_corpus(spark, tmp_path):
    rows = []
    for i in range(6):
        rows.append((i, "alpha beta gamma alpha", "aa", "s0", 20))
    for i in range(6, 12):
        rows.append((i, "delta epsilon zeta zeta", "bb", "s0", 20))
    sf = _write_docs(spark, tmp_path, rows)
    out = selection.lang_classifier_nb(spark, sf).collect()
    cells = {(r["lang"], r["pred_lang"]): r["n_docs"] for r in out}
    assert cells == {("aa", "aa"): 6, ("bb", "bb"): 6}


def test_nb_exact_tie_breaks_to_smallest_class(spark, tmp_path):
    # identical text, one doc per class: identical gram counts AND
    # identical priors -> exactly equal decimal scores -> both docs
    # predict the lexicographically smallest class
    rows = [(0, "tok tok other", "aa", "s0", 13), (1, "tok tok other", "bb", "s0", 13)]
    sf = _write_docs(spark, tmp_path, rows)
    out = selection.lang_classifier_nb(spark, sf).collect()
    cells = {(r["lang"], r["pred_lang"]): r["n_docs"] for r in out}
    assert cells == {("aa", "aa"): 1, ("bb", "aa"): 1}


def test_dsir_ranks_target_distinctive_docs_first(spark, tmp_path):
    # 'en' (target) docs carry a token the raw-only docs never use; the
    # importance ratio must rank every en doc above every de doc
    rows = []
    for i in range(5):
        rows.append((i, "shared words here zzzz zzzz", "en", "s0", 27))
    for i in range(5, 10):
        rows.append((i, "shared words here mmmm mmmm", "de", "s0", 27))
    sf = _write_docs(spark, tmp_path, rows)
    out = selection.dsir_importance_sample(spark, sf).collect()
    assert len(out) == 10  # below TOP_K: everything returned, ordered
    langs = [r["lang"] for r in out]
    assert langs == ["en"] * 5 + ["de"] * 5
    ratios = [r["mean_log_ratio"] for r in out]
    assert ratios == sorted(ratios, reverse=True)
    # target-distinctive docs strictly dominate (absolute sign is a
    # smoothing artifact on a tiny corpus, not a property)
    assert min(ratios[:5]) > max(ratios[5:])
    # deterministic tie-break inside each equal-score run: doc_id asc
    assert [r["doc_id"] for r in out[:5]] == [0, 1, 2, 3, 4]


def test_zero_token_docs_are_excluded(spark, tmp_path):
    rows = [(0, "   ", "en", "s0", 3), (1, "real tokens", "en", "s0", 11)]
    sf = _write_docs(spark, tmp_path, rows)
    assert [r["doc_id"] for r in selection.dsir_importance_sample(spark, sf).collect()] == [1]
    nb = selection.lang_classifier_nb(spark, sf).collect()
    assert [(r["lang"], r["pred_lang"], r["n_docs"]) for r in nb] == [("en", "en", 1)]


# --- dedup_span_removal (quality.py) — engineered-corpus semantics ---

import hashlib

from petasearch_spark.operators.quality import dedup_span_removal


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_span_removal_cross_doc_and_within_doc(spark, tmp_path):
    span = " ".join(f"a{i}" for i in range(8))
    rep = " ".join(f"b{i}" for i in range(8))
    rows = [
        (0, f"{span} x y z", "en", "s0", 0),       # canonical holder: untouched
        (1, f"p q {span} r", "en", "s0", 0),        # loses the 8-token span
        (2, f"{rep} {rep}", "en", "s0", 0),         # within-doc repeat trimmed
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in dedup_span_removal(spark, sf).collect()}
    assert sorted(out) == [1, 2]  # doc 0 is canonical everywhere -> no rewrite
    assert (out[1]["n_toks"], out[1]["n_removed"]) == (11, 8)
    assert out[1]["kept_hash"] == _h64("p q r")
    assert (out[2]["n_toks"], out[2]["n_removed"]) == (16, 8)
    assert out[2]["kept_hash"] == _h64(rep)


def test_span_removal_canonical_overlap_protects_and_full_removal(spark, tmp_path):
    c = " ".join(f"c{i}" for i in range(8))
    d = " ".join(f"d{i}" for i in range(8))
    rows = [
        (3, f"{c} {d}", "en", "s0", 0),  # canonical for both spans -> protected
        (4, f"{d} {c}", "en", "s0", 0),  # both spans non-canonical -> emptied
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in dedup_span_removal(spark, sf).collect()}
    assert sorted(out) == [4]
    assert (out[4]["n_toks"], out[4]["n_removed"]) == (16, 16)
    assert out[4]["kept_hash"] == _h64("")


def _removal_twin(texts: dict[int, str], w: int = 8):
    """Plain-Python statement of the removal rule (exact token tuples, no
    hashing) — an independent check that the engine and the SQL oracle
    don't share a misconception."""
    toks = {d: [t for t in text.split() if t] for d, text in texts.items()}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d, ts in toks.items():
        for i in range(1, len(ts) - w + 2):
            occ.setdefault(tuple(ts[i - 1 : i - 1 + w]), []).append((d, i))
    protected: dict[int, set[int]] = {d: set() for d in toks}
    covered: dict[int, set[int]] = {d: set() for d in toks}
    for win, places in occ.items():
        if len(places) < 2:
            continue
        cd, ci = min(places)
        protected[cd].update(range(ci, ci + w))
        for d, i in places:
            if (d, i) != (cd, ci):
                covered[d].update(range(i, i + w))
    out = {}
    for d, ts in toks.items():
        removed = covered[d] - protected[d]
        if removed:
            kept = " ".join(t for p, t in enumerate(ts, 1) if p not in removed)
            out[d] = (len(ts), len(removed), _h64(kept))
    return out


def test_span_removal_matches_scalar_twin_on_random_corpora(spark, tmp_path):
    import random

    for seed in range(3):
        rng = random.Random(seed)
        vocab = ["u", "v", "w", "x", "y", "z"]
        texts = {
            d: " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 22)))
            for d in range(12)
        }
        sf = _write_docs(
            spark,
            tmp_path / str(seed),
            [(d, t, "en", "s0", len(t)) for d, t in texts.items()],
        )
        got = {
            r["doc_id"]: (r["n_toks"], r["n_removed"], r["kept_hash"])
            for r in dedup_span_removal(spark, sf).collect()
        }
        assert got == _removal_twin(texts), f"seed={seed}"


def test_nb_excludes_unlabeled_docs(spark, tmp_path):
    """Round-4 ADVICE: lang IS NULL docs can neither be pivoted to a
    count column nor sorted among class strings — they are excluded from
    training and the confusion matrix (documented contract), instead of
    raising TypeError on sorted([None, 'aa', ...])."""
    rows = []
    for i in range(6):
        rows.append((i, "alpha beta gamma alpha", "aa", "s0", 20))
    for i in range(6, 12):
        rows.append((i, "delta epsilon zeta zeta", "bb", "s0", 20))
    rows.append((12, "alpha beta noise rows", None, "s0", 20))
    rows.append((13, "delta zeta noise rows", None, "s0", 20))
    sf = _write_docs(spark, tmp_path, rows)
    out = selection.lang_classifier_nb(spark, sf).collect()
    cells = {(r["lang"], r["pred_lang"]): r["n_docs"] for r in out}
    assert cells == {("aa", "aa"): 6, ("bb", "bb"): 6}

    # and the SQL twin applies the same filter
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = {
        (r[0], r[1]): r[2] for r in con.execute(selection.LANG_NB_SQL).fetchall()
    }
    assert {k: v for k, (v) in cells.items()} == want
