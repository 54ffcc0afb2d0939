"""Constructed-frame cross-engine fuzz parity (round-5 VERDICT item 5).

The four round-5 audit passes found 28 real engine/oracle divergences BY
HAND (ANSI casts, window NULL ordering, whitespace dialects, NaN-vs-NULL
ranking, % sign semantics, blank-line parses...). This module
systematizes that hunt: deterministic seeded generators build small
adversarial documents / events / embeddings tables mixing every value
class those audits taught us to fear — NULL / empty / whitespace-only
text (incl. the \\x0B and non-ASCII characters the three regex dialects
disagree on), exact-half money values at cents scale (the
floor(p+0.5) trap), negative/zero/NaN/Inf measures, NULL keys under
windows, duplicate rows and ties, malformed/blank JSON, zero-norm and
NaN vectors — and every (seed, operator) pair is compared Spark vs
DuckDB with the same exact comparator the driver-gate rehearsal uses.

~208 constructed cases across 52 operator cores (a 20-core set over all
six seeds, plus a 32-core extension over a three-seed subset covering
the base/nonfinite/corrupt classes). A failure here is a REAL
cross-engine semantic divergence (or a genuine engine bug) on input the
fixture corpus never produces; fix the operator AND its oracle
together, never the test frame.

Corrupt-vector rows (NULL / wrong-dim / empty embeddings) appear only
in the CORRUPT_EMB_SEEDS, where the ANN rankers are excluded: the ANN
contract assumes ingest-validated fixed-dim vectors (embedding_profile
is the auditor that runs on everything, and it does run on those
seeds).
"""

from __future__ import annotations

import datetime
import math
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
# round 11: whole-module slow tier — see pyproject [tool.pytest.ini_options]
pytestmark = pytest.mark.slow


from petasearch_spark.registry import REGISTRY

from tests.test_oracle_parity import _assert_parity

SEEDS = [1, 2, 3, 4, 5, 6]
#: seeds whose embeddings table carries NULL / wrong-dim / empty vectors
CORRUPT_EMB_SEEDS = {5, 6}
#: seeds whose events table carries NaN / +-Inf values
NONFINITE_EVENT_SEEDS = {4, 5, 6}
#: seeds carrying a >=12-observed-day user plus a NULL-ts event for the
#: same user — forces SAX windows to form AND exercises the day-less-
#: events exclusion law (round-7 ADVICE); both are EXTRA_SEEDS members
#: so events_sax_motifs actually runs on them
SAX_SPAN_SEEDS = {4, 5}

DOC_OPS = [
    "gopher_quality",
    "text_quality_stats",
    "unigram_logprob_score",
    "dup_span_coverage",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "doc_fingerprint",
    "pii_redaction",
    "kmv_distinct_tokens",
    "lang_id_heuristic",
    "corpus_sample_stratified",
]
EVENT_OPS = [
    "events_hourly",
    "events_sessionize",
    "events_json_stats",
    "events_value_quantiles",
    "events_quantile_sketch",
]
EMB_RANKER_OPS = ["ann_cosine_topk", "embedding_neardup"]
EMB_AUDIT_OPS = ["embedding_profile"]

#: extension cores, run over a 3-seed subset (base / nonfinite events /
#: corrupt embeddings) — enough class coverage without doubling suite time
EXTRA_SEEDS = [1, 4, 5]
EXTRA_DOC_OPS = [
    "bm25_search",
    "phrase_search",
    "tfidf_top_terms",
    "doc_chunk_overlap",
    "token_count_bpe",
    "dedup_blocks",
    "quality_weighted_sample",
    "mixture_sample",
    "decontaminate_ngram_overlap",
    "decontaminate_bloom",
    "hll_distinct_tokens",
    "cm_heavy_hitters",
    "lang_classifier_nb",
    "dsir_importance_sample",
    "sequence_packing",
    # round-7 sweep: the remaining never-fuzzed batch doc ops
    "bpe_train_merges",
    "bpe_fertility",
    "bpe_encode_corpus",
    "doc_cluster_tfidf",
    "decontaminate_minhash",
    "dedup_jaccard_pairs",
    "dedup_clusters",
]
EXTRA_EVENT_OPS = [
    "events_rollup",
    "events_conversion_funnel",
    "events_retention_cohorts",
    "events_anomaly_daily",
    "events_value_outliers",
    "events_type_pivot",
    "events_type_unpivot",
    "events_session_window",
    "events_asof_join",
    "events_proximity_pairs",
    "events_sax_motifs",
    "events_csv_ingest",
    # round-7 sweep: the remaining never-fuzzed batch event ops
    "users_purchase_and_error",
    "clean_purchase_days",
    "events_zorder_layout",
]
#: vector ops that assume ingest-validated vectors (skip corrupt seeds).
#: The PQ family is excluded by design: its subspace layout is pinned to
#: the corpus DIM=64 constant and the fuzz vectors are 8-dim.
EXTRA_EMB_RANKER_OPS = [
    "ann_ivf_topk",
    "ann_filtered_topk",
    "semdedup_clusters",
    "ann_ivf_kmeans",
    # round-7 sweep
    "decontaminate_semantic",
]
#: vector ops expected to survive corrupt vectors (all extra seeds).
#: embedding_neardup_lsh moved here round-8 (ADVICE r7): it now applies
#: the finite_vec admission rule on both sides and its signature kernel
#: zero-pads ragged rows, so NULL / wrong-dim / empty / NULL-component
#: corpora are in-contract for it.
EXTRA_EMB_AUDIT_OPS = ["embedding_quantize_int8", "embedding_neardup_lsh"]
#: multimodal ops (round-7): media_table derives payload+metadata FROM
#: documents, so the adversarial doc corpus (NULL/empty/unicode/
#: whitespace-only text) exercises the whole decode/codec family — it
#: was the one oracle-backed family never fuzzed on constructed frames
MEDIA_OPS = [
    "media_catalog",
    "image_stats",
    "image_resize",
    "audio_features",
    "video_frame_sample",
    "image_phash_dedup",
]
#: streaming ops (round-7 sweep): they self-stage from sf_dir, so the
#: adversarial frames drive the REAL micro-batch machinery — stateful
#: kernels on NULL users / NaN values / NULL event ids, the JSONL and
#: dedup streams on NULL/unicode text. Two seeds (base + nonfinite);
#: each case runs an actual stream, so the subset stays small.
STREAM_OPS = [
    "events_stream_hourly",
    "events_stream_user_totals",
    "docs_stream_dedup",
    "cm_stream_heavy_hitters",
    "events_stream_quantiles",
    "docs_stream_ingest",
    "ann_stream_topk",
    "ann_ivf_stream_topk",
    "events_stream_join",
]
STREAM_SEEDS = [1, 4]
#: heavy compositions — two seeds buy the coverage
HEAVY_OPS = ["dedup_span_removal", "corpus_curation_funnel"]
HEAVY_SEEDS = [1, 4]
#: the protein/doc search family derives sequences FROM the documents
#: text (sanitization + k-mer machinery over adversarial unicode/empty/
#: whitespace docs is exactly what to stress); three-seed subset
#: protein_mask_tantan / protein_mask_stats / protein_expand_prefilter /
#: protein_prefilter_biased are excluded: their oracles replay committed
#: goldens keyed to the fixture corpus (corpus_chars) — for a constructed
#: frame the golden branch is empty and the comparison degenerates (the
#: masking kernels and the similar-kmer enumerator keep their independent
#: scalar goldens on the fixtures instead)
PROTEIN_OPS = [
    "doc_shingle_index",
    "doc_prefilter",
    "dna_prefilter",
    "protein_prefilter",
    "protein_ungapped",
    "protein_prefilter_funnel",
    "profile_search_consensus",
    # round-7 (rotated into the gate): both sides consensus-reduced
    "profile_vs_profile_prefilter",
]

#: separators the portable tokenizer treats as whitespace — plus
#: characters it deliberately does NOT (bare \s dialect drift territory)
WS_SEPARATORS = [" ", "\t", "\n", "\r", "\f", "\x0b"]
NON_SEPARATOR_WS = [" ", " ", " ", "　"]

VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "data", "model", "train",
    "loss", "grad", "the", "of", "and", "3.5", "42", "-7", "0x1f", "1e10",
    "naïve", "café", "東京", "🦀", "word's", "end.", "null", "None", "true",
    "NaN", "a", "I",
]


def _text(rng: random.Random, n_lo: int = 5, n_hi: int = 60) -> str:
    n = rng.randint(n_lo, n_hi)
    sep = rng.choice(WS_SEPARATORS + ["  ", " \t ", "\r\n"])
    return sep.join(rng.choice(VOCAB) for _ in range(n))


def _gen_documents(rng: random.Random, seed: int) -> list[tuple]:
    rows: list[tuple] = []
    did = 0

    def add(text, lang="en", source="src1"):
        nonlocal did
        rows.append((did, text, lang, source, None if text is None else len(text)))
        did += 1

    langs = ["en", "de", "fr", "xx", None]
    sources = ["src1", "src2", "src15", "cc:-3", "commoncrawl", None]
    for _ in range(40):
        add(_text(rng), rng.choice(langs), rng.choice(sources))
    # exact-duplicate groups (dedup keep-smallest rule; also forces
    # shared windows/shingles)
    for _ in range(3):
        t = _text(rng, 12, 30)
        for _ in range(rng.randint(2, 3)):
            add(t, rng.choice(langs), rng.choice(sources))
    # near-duplicates: long shared run + small tail change (span
    # coverage + MinHash banding; the shared run exceeds SPAN_W=8)
    base = _text(rng, 24, 40)
    add(base + " tail one")
    add(base + " tail two different")
    # degenerate shapes
    add("")                      # empty text
    add(None, None, None)        # NULL text/lang/source
    for ch in WS_SEPARATORS:
        add(ch * rng.randint(1, 4))          # whitespace-only (separators)
    for ch in NON_SEPARATOR_WS:
        add(ch)                  # single NON-separator whitespace char =
        #                          one 1-char token in every engine
    add("single")
    add("two tokens")
    add("spam " * 50)            # one repeated token (top2/dup3 edges)
    add("x " * 2)                # 2 tokens — below GOPHER_MIN_TOKS
    add("！？。 …… ——")           # punctuation-only unicode tokens
    add("3.5 7 007 -0 1e9 0.49999999999999994")  # digit-shaped tokens
    add("Contact bob@example.com or +1-555-123-4567, SSN 123-45-6789.")
    add("mixé 東京都 🦀🦀 ẞtraße Ωmega ±∞")
    if seed == 3:
        # cross WINDOW_MAX_STARTS / FP_MAX_STARTS (8191) and
        # SHINGLE_MAX_TOKENS (4096): the engine-side slice caps must
        # match the oracle's range(1, N) enumeration exactly
        add(" ".join(rng.choice(VOCAB) for _ in range(8300)))
    if seed == 4:
        add(" ".join(rng.choice(VOCAB) for _ in range(4200)))
    return rows


def _gen_events(rng: random.Random, seed: int) -> list[tuple]:
    rows: list[tuple] = []
    base = datetime.datetime(2026, 1, 1)
    types = ["view", "click", "purchase", "error", "", None, "类型"]
    props_pool = [
        '{"a": 1}',
        '{"a": null, "b": [1, 2]}',
        '{"nested": {"x": "y"}, "n": 3.5}',
        '{"a":',              # malformed — json_valid guard territory
        "not json at all",
        "",                   # blank string
        "   ",                # whitespace-only
        None,
        "[]",
        '{"uni": "東京🦀"}',
    ]
    eid = 0
    for _ in range(150):
        user = rng.choice([None] + [u for u in range(1, 9) for _ in range(3)])
        ts = base + datetime.timedelta(
            days=rng.randint(0, 2),
            seconds=rng.randint(0, 86399) if rng.random() > 0.1 else 0,  # midnights
        )
        value = rng.choice(
            [
                round(rng.uniform(0.01, 99.99), 2),
                1.005, 2.675, -3.005, 0.125,       # exact cents halves
                0.49999999999999994,               # the floor(v+0.5) trap
                0.0, -0.0, -17.38, 1e9, 1e-9,
            ]
        )
        rows.append((eid, ts, user, rng.choice(types), value, rng.choice(props_pool)))
        eid += 1
    # duplicate (user, ts) ties — total-order tie-break law
    tie_ts = base + datetime.timedelta(hours=7)
    for _ in range(4):
        rows.append((eid, tie_ts, 3, "view", 5.0, '{"a": 1}'))
        eid += 1
    # NULL ts and NULL event_id rows
    rows.append((eid, None, 2, "view", 1.0, None)); eid += 1
    rows.append((None, base, 2, "click", 2.0, '{"a": 1}'))
    if seed in NONFINITE_EVENT_SEEDS:
        rows.append((eid, base + datetime.timedelta(hours=1), 4, "view", math.nan, None)); eid += 1
        rows.append((eid, base + datetime.timedelta(hours=2), 4, "view", math.inf, None)); eid += 1
        rows.append((eid, base + datetime.timedelta(hours=3), 5, "error", -math.inf, None)); eid += 1
    if seed in SAX_SPAN_SEEDS:
        # 12 observed days for one user — above SAX_W=8, so SAX windows
        # actually form — PLUS a NULL-ts event for the SAME user: the
        # day-less row would sort FIRST in Spark's array_sort series but
        # LAST under the oracle's ORDER BY day, permuting every window
        # (the round-7 ADVICE latent divergence; both engines now exclude
        # day-less events from daily series)
        for d in range(12):
            rows.append((eid, base + datetime.timedelta(days=3 + d, hours=5), 7,
                         "view", float((d * 7) % 13) + 0.25, None)); eid += 1
        rows.append((eid, None, 7, "view", 999.75, None)); eid += 1
    return rows


def _gen_embeddings(rng: random.Random, seed: int, dim: int = 8) -> list[tuple]:
    rows: list[tuple] = []

    def vec():
        return [round(rng.uniform(-1, 1), 4) for _ in range(dim)]

    vid = 0
    dup = vec()
    for _ in range(30):
        rows.append((vid, vec(), rng.choice([0, 1, 2, 3, None]))); vid += 1
    for _ in range(3):
        rows.append((vid, list(dup), 1)); vid += 1          # exact ties
    rows.append((vid, [0.0] * dim, 0)); vid += 1            # zero norm
    rows.append((vid, [math.nan] + [0.5] * (dim - 1), 2)); vid += 1  # NaN comp
    rows.append((vid, [math.inf] + [0.5] * (dim - 1), 3)); vid += 1  # Inf comp
    rows.append((vid, [1e30] * dim, 0)); vid += 1           # huge magnitude
    rows.append((vid, [1e-30] * dim, 1)); vid += 1          # tiny magnitude
    if seed in CORRUPT_EMB_SEEDS or seed == PQ_CORRUPT_SEED:
        rows.append((vid, None, 2)); vid += 1               # NULL vector
        rows.append((vid, [0.1] * (dim - 3), 3)); vid += 1  # wrong dim
        rows.append((vid, [], 0)); vid += 1                 # empty vector
        # NULL COMPONENT inside an otherwise-present vector: Spark's
        # F.exists yields NULL -> coalesce excludes; DuckDB's list_filter
        # silently drops NULL-predicate elements, so the oracle needs the
        # explicit `x IS NULL` arm in FINITE_VEC_SQL (round-7 ADVICE)
        rows.append((vid, [0.5] * (dim - 1) + [None], 1)); vid += 1
    return rows


def _gen_relational(rng: random.Random, seed: int) -> dict[str, list[tuple]]:
    """Adversarial TPC-H-shaped tables: orphan foreign keys, NULL join/
    order keys, empty-string names, exact-half money values at cents
    scale (the rounding law), boundary discounts, NULL dates — plus
    NaN/Inf prices in the NONFINITE seeds. Primary keys stay unique
    (key integrity is an ingest contract; the adversarial surface is
    values, not broken PKs)."""
    import datetime as dt

    t: dict[str, list[tuple]] = {}
    t["region"] = [(0, "AMERICA"), (1, "ASIA"), (2, ""), (3, None)]
    t["nation"] = [
        (i, n, r)
        for i, (n, r) in enumerate(
            [("NATION_0", 0), ("NATION_1", 0), ("NATION_2", 1), ("", 2), (None, 1), ("NATION_5", 9)]
        )
    ]  # regionkey 9 is an orphan
    segs = ["BUILDING", "AUTOMOBILE", "", None]
    t["customer"] = [
        (
            c,
            f"Customer#{c:09d}",
            rng.choice([0, 1, 2, 3, 4, 5, None]),
            rng.choice([0.0, -17.385, 123.455, 9999.995, round(rng.uniform(-999, 9999), 2)]),
            rng.choice(segs),
        )
        for c in range(30)
    ]
    t["supplier"] = [
        (s, f"Supplier#{s:09d}", rng.choice([0, 1, 2, 3, 4, 5, None]), round(rng.uniform(0, 9999), 2))
        for s in range(10)
    ]
    t["part"] = [
        (
            p,
            f"part name {p}",
            f"Brand#{p % 5}",
            rng.choice(["ECONOMY BRASS", "STANDARD TIN", "", "PROMO %"]),
            rng.choice([1, 50, None]) if p % 7 == 0 else (p % 50) + 1,
            round(rng.uniform(1, 2000), 2),
        )
        for p in range(20)
    ]
    # TPC-H-era dates: orders span 1996-1998 so the registry queries'
    # fixed date predicates (q1 <=2000-09, q3 around 1998-03-15, q4/q5
    # within 1996) select real subsets instead of empty ones
    base = dt.datetime(1996, 3, 1)
    t["orders"] = [
        (
            o,
            rng.choice([*range(25), 998, 999]),  # 998/999: orphan custkeys
            rng.choice(["F", "O", "P"]),
            rng.choice([0.005, 123456.785, round(rng.uniform(100, 300000), 2)]),
            None if o % 17 == 13 else base + dt.timedelta(days=rng.randint(-90, 700), seconds=rng.randint(0, 86399)),
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW", "", None]),
        )
        for o in range(80)
    ]
    lines = []
    for li in range(220):
        price = rng.choice(
            [0.0, 0.005, 950.555, 0.49999999999999994, round(rng.uniform(10, 90000), 2)]
        )
        if seed in NONFINITE_EVENT_SEEDS and li % 60 == 7:
            price = rng.choice([math.nan, math.inf])
        lines.append(
            (
                rng.choice([*range(80), 7777]),  # 7777: orphan orderkey
                rng.randrange(20),
                rng.randrange(10),
                li % 7,
                float(rng.choice([0, 1, 25, 50])),
                price,
                rng.choice([0.0, 0.05, 0.5, 1.0]),
                rng.choice([0.0, 0.08]),
                rng.choice(["A", "N", "R", None]),
                rng.choice(["F", "O"]),
                None if li % 23 == 11 else base + dt.timedelta(days=rng.randint(-400, 900)),
            )
        )
    t["lineitem"] = lines
    return t


REL_SCHEMAS = {
    "region": pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
    "nation": pa.schema(
        [("n_nationkey", pa.int32()), ("n_name", pa.string()), ("n_regionkey", pa.int32())]
    ),
    "customer": pa.schema(
        [("c_custkey", pa.int64()), ("c_name", pa.string()), ("c_nationkey", pa.int32()),
         ("c_acctbal", pa.float64()), ("c_mktsegment", pa.string())]
    ),
    "supplier": pa.schema(
        [("s_suppkey", pa.int64()), ("s_name", pa.string()), ("s_nationkey", pa.int32()),
         ("s_acctbal", pa.float64())]
    ),
    "part": pa.schema(
        [("p_partkey", pa.int64()), ("p_name", pa.string()), ("p_brand", pa.string()),
         ("p_type", pa.string()), ("p_size", pa.int32()), ("p_retailprice", pa.float64())]
    ),
    "orders": pa.schema(
        [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()), ("o_orderstatus", pa.string()),
         ("o_totalprice", pa.float64()), ("o_orderdate", pa.timestamp("us")),
         ("o_orderpriority", pa.string())]
    ),
    "lineitem": pa.schema(
        [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()), ("l_suppkey", pa.int64()),
         ("l_linenumber", pa.int32()), ("l_quantity", pa.float64()),
         ("l_extendedprice", pa.float64()), ("l_discount", pa.float64()),
         ("l_tax", pa.float64()), ("l_returnflag", pa.string()),
         ("l_linestatus", pa.string()), ("l_shipdate", pa.timestamp("us"))]
    ),
}

REL_OPS = [
    "table_profile",  # round-7: single-pass per-column profile, gated
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q7_volume_shipping",
    "q18_large_orders",
    "top_suppliers_per_nation",
    "running_order_totals",
    "repeat_customers",
    "parts_without_lineitems",
    "customers_never_ordered",
]
REL_SEEDS = [1, 4]


def _write(dir_: str, name: str, rows: list[tuple], schema: pa.Schema) -> None:
    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    table = pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)], schema=schema
    )
    pq.write_table(table, os.path.join(dir_, f"{name}.parquet"))


DOC_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
     ("source", pa.string()), ("n_chars", pa.int64())]
)
EVENT_SCHEMA = pa.schema(
    [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64()),
     ("event_type", pa.string()), ("value", pa.float64()), ("props", pa.string())]
)
EMB_SCHEMA = pa.schema(
    [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())), ("label", pa.int32())]
)


#: seed 7: a CORPUS-DIM (64) embeddings table so the PQ family — whose
#: subspace layout is pinned to the DIM constant — gets fuzz coverage too
PQ_SEED = 7
PQ_OPS = ["ann_pq_topk", "ann_ivfpq_topk", "ann_cosine_topk", "ann_ivf_topk", "embedding_profile"]

#: seed 8 (round-7, VERDICT r6 item 3): CORPUS-DIM (64) embeddings WITH
#: the corrupt rows (NULL / wrong-dim / empty / NULL-component vectors) —
#: the PQ family's coverage was one clean DIM=64 seed, so a bug in the
#: admission rule's interaction with the subspace layout would hide here
#: longest. Brute-force cosine is excluded (its contract keeps NaN-first
#: ranking over ingest-validated vectors); every indexed/audited op runs.
#: seed 9 (round-8, VERDICT r7 item 6): degenerate-PSSM corpus for the
#: profile family. The registry profile ops derive their PSSMs from
#: document text (window-sum of BLOSUM62 rows), and INVALID residues —
#: uppercase B/J/O/U/X/Z survive the text->sequence derivation —
#: contribute NOTHING to a window's count vector. Docs made of invalid
#: residues therefore produce all-zero ("zero-weight") PSSM columns
#: whose argmax must tie-canonicalize to 'A' identically in the engine
#: kernel and the SQL oracle; a doc that is ENTIRELY invalid residues is
#: the "all-X consensus" case (every column zero -> consensus all 'A').
#: Query slots (doc_id % 20 == 0) are loaded with the degenerate shapes.
PROFILE_DEGEN_SEED = 9
PROFILE_DEGEN_OPS = ["profile_search_consensus", "profile_vs_profile_prefilter"]


def _gen_profile_degen_documents(rng: random.Random) -> list[tuple]:
    rows = []

    def put(did, text, lang="en", source="src1"):
        rows.append((did, text, lang, source, None if text is None else len(text)))

    put(0, "X" * 60)                       # all-invalid -> all-zero PSSM
    put(20, _text(rng, 20, 40))            # normal control query
    put(40, "qqqqqqqqqqqq" + "XXXXXXXX" + "qqqqqqqqqqqq")  # interior zero columns
    put(60, "BJOUXZ" * 10)                 # all-invalid, mixed letters
    put(80, "abc XYZ de")                  # short: fewer residues than k
    did = 1
    for _ in range(30):                    # non-query targets
        while did % 20 == 0:
            did += 1
        put(did, _text(rng))
        did += 1
    return rows


PQ_CORRUPT_SEED = 8
PQ_CORRUPT_OPS = [
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivf_topk",
    "ann_ivf_filtered_topk",
    "semdedup_clusters",
    "embedding_profile",
    "embedding_quantize_int8",
    # round-8 (ADVICE r7): corrupt-seed coverage at corpus dim for the
    # LSH path too — admission + ragged-safe signature kernel
    "embedding_neardup_lsh",
]


@pytest.fixture(scope="module")
def fuzz_dirs(tmp_path_factory):
    dirs: dict[int, str] = {}
    for seed in SEEDS + [PQ_SEED, PQ_CORRUPT_SEED, PROFILE_DEGEN_SEED]:
        d = str(tmp_path_factory.mktemp(f"fuzz_s{seed}"))
        rng = random.Random(1_000_003 * seed)
        docs = (
            _gen_profile_degen_documents(rng)
            if seed == PROFILE_DEGEN_SEED
            else _gen_documents(rng, seed)
        )
        _write(d, "documents", docs, DOC_SCHEMA)
        _write(d, "events", _gen_events(rng, seed), EVENT_SCHEMA)
        dim = 64 if seed in (PQ_SEED, PQ_CORRUPT_SEED) else 8
        _write(d, "embeddings", _gen_embeddings(rng, seed, dim=dim), EMB_SCHEMA)
        if seed in REL_SEEDS:
            for name, rows in _gen_relational(rng, seed).items():
                _write(d, name, rows, REL_SCHEMAS[name])
        dirs[seed] = d
    return dirs


CASES = (
    [(s, op) for s in SEEDS for op in DOC_OPS + EVENT_OPS + EMB_AUDIT_OPS]
    + [(s, op) for s in SEEDS if s not in CORRUPT_EMB_SEEDS for op in EMB_RANKER_OPS]
    + [(s, op) for s in EXTRA_SEEDS for op in EXTRA_DOC_OPS + EXTRA_EVENT_OPS + EXTRA_EMB_AUDIT_OPS]
    + [(s, op) for s in EXTRA_SEEDS if s not in CORRUPT_EMB_SEEDS for op in EXTRA_EMB_RANKER_OPS]
    + [(s, op) for s in HEAVY_SEEDS for op in HEAVY_OPS]
    + [(s, op) for s in EXTRA_SEEDS for op in PROTEIN_OPS]
    + [(s, op) for s in EXTRA_SEEDS for op in MEDIA_OPS]
    + [(s, op) for s in STREAM_SEEDS for op in STREAM_OPS]
    + [(PQ_SEED, op) for op in PQ_OPS]
    + [(PQ_CORRUPT_SEED, op) for op in PQ_CORRUPT_OPS]
    + [(PROFILE_DEGEN_SEED, op) for op in PROFILE_DEGEN_OPS]
    + [(s, op) for s in REL_SEEDS for op in REL_OPS]
)


@pytest.mark.parametrize(
    "seed,op", CASES, ids=[f"{op}@s{s}" for s, op in CASES]
)
def test_fuzz_cross_engine_parity(spark, fuzz_dirs, seed, op):
    fn, sql = REGISTRY[op]
    assert sql is not None, f"{op} has no oracle — pick a different core"
    _assert_parity(spark, f"{op}@seed{seed}", fn, sql, fuzz_dirs[seed])
