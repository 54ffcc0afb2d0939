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
