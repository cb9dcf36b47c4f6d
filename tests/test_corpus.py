"""Semantic invariants of the corpus-maintenance operators
(newsflow/corpus.py) beyond the oracle-parity hash checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow import corpus
from newsflow.dedup import core
from newsflow.tables import load_table
from tests.conftest import SF_ORACLE


def test_source_cap_invariants(spark):
    out = corpus.source_capped_sample(spark, SF_ORACLE)
    per_source = out.groupBy("source").count().collect()
    assert all(r["count"] <= corpus.SOURCE_CAP for r in per_source)
    # Kept docs are exactly the SOURCE_CAP smallest ids of each source.
    docs = load_table(spark, SF_ORACLE, "documents")
    smallest = {
        (r["source"], r["doc_id"])
        for r in docs.groupBy("source")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .select(
            "source",
            F.explode(F.slice("ids", 1, corpus.SOURCE_CAP)).alias("doc_id"),
        )
        .collect()
    }
    got = {(r["source"], r["doc_id"]) for r in out.collect()}
    assert got == smallest


def test_incremental_dedup_consistent_with_full_dedup(spark):
    # Existing-corpus keepers ∪ incremental keepers must cover exactly
    # the full corpus's distinct hashes (the diff is sound + complete).
    docs = load_table(spark, SF_ORACLE, "documents")
    full_hashes = {
        r["text_hash"]
        for r in core.exact_dedup_keep_min(docs)
        .select(F.col("text_hash"))
        .collect()
    }
    existing_hashes = {
        r["h"]
        for r in docs.filter(F.col("doc_id") < corpus.EXISTING_MAX_DOC_ID)
        .select(F.md5("text").alias("h"))
        .distinct()
        .collect()
    }
    new_hashes = {
        r["text_hash"]
        for r in corpus.incremental_dedup_new_docs(spark, SF_ORACLE).collect()
    }
    assert new_hashes.isdisjoint(existing_hashes)
    assert existing_hashes | new_hashes == full_hashes


def test_chunking_reconstructs_documents(spark):
    # Stride-aligned prefixes of each chunk concatenate back to the
    # original token stream: chunk i covers [i*stride, i*stride+size).
    docs = load_table(spark, SF_ORACLE, "documents").limit(50)
    out = corpus.doc_chunking(spark, SF_ORACLE)
    got = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"].split(" ")
        for r in out.join(docs.select("doc_id"), "doc_id").collect()
    }
    toks = {
        r["doc_id"]: [
            t
            for t in __import__("re").split(
                "[^a-z0-9]+", r["text"].lower()
            )
            if t
        ]
        for r in docs.select("doc_id", "text").collect()
    }
    for doc_id, t in toks.items():
        if not t:
            continue
        n_chunks = max((r[1] for r in got if r[0] == doc_id), default=-1) + 1
        rebuilt: list[str] = []
        for i in range(n_chunks):
            chunk = got[(doc_id, i)]
            assert chunk == t[
                i * corpus.CHUNK_STRIDE : i * corpus.CHUNK_STRIDE
                + corpus.CHUNK_SIZE
            ]
            rebuilt.extend(chunk[: corpus.CHUNK_STRIDE])
        # Every token position is covered by at least one chunk.
        assert rebuilt[: len(t)] == t[: len(rebuilt)]
        assert len(rebuilt) >= len(t) - corpus.CHUNK_SIZE


def test_boilerplate_ratio_flags_near_dups_only(spark):
    out = corpus.doc_boilerplate_ratio(spark, SF_ORACLE)
    rows = {r["doc_id"]: r for r in out.collect()}
    # Docs in a near-dup pair share 5-gram shingles with their twin, so
    # their boilerplate ratio must be positive.
    pairs = core.jaccard_pairs(
        load_table(spark, SF_ORACLE, "documents"), n=5, threshold=0.8
    ).collect()
    for p in pairs:
        for d in (p["doc_a"], p["doc_b"]):
            assert rows[d]["boilerplate_ratio"] > 0, d
    # Ratio is a valid fraction everywhere.
    assert all(
        0.0 <= r["boilerplate_ratio"] <= 1.0 for r in rows.values()
    )


def test_percentile_gate_keeps_top_quarter(spark):
    out = corpus.doc_quality_percentile_gate(spark, SF_ORACLE)
    n_docs = load_table(spark, SF_ORACLE, "documents").count()
    n_kept = out.count()
    # quantile_cont(0.75) keeps at least 25% (ties can push it higher,
    # but never below the top quarter).
    assert n_kept >= 0.25 * n_docs - 1
    assert n_kept <= 0.75 * n_docs
    thr = out.select("p_threshold").first()["p_threshold"]
    assert all(
        r["quality_score"] >= thr for r in out.collect()
    )


def test_oov_rate_zero_for_vocab_only_docs(spark):
    out = corpus.doc_oov_rate(spark, SF_ORACLE).collect()
    assert all(0.0 <= r["oov_rate"] <= 1.0 for r in out)
    assert all(r["n_oov"] <= r["n_tokens"] for r in out)
    # The corpus vocabulary is tiny (~40 distinct tokens), so a top-20
    # vocab must leave SOME tokens out-of-vocabulary somewhere.
    assert any(r["n_oov"] > 0 for r in out)


def test_documents_profile_matches_direct_counts(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    prof = {
        r["col_name"]: r
        for r in corpus.documents_profile(spark, SF_ORACLE).collect()
    }
    assert set(prof) == set(corpus.PROFILE_COLS)
    n = docs.count()
    for c in corpus.PROFILE_COLS:
        assert prof[c]["n_rows"] == n
        assert prof[c]["n_distinct"] == docs.select(c).distinct().count()
    assert prof["doc_id"]["min_value"] == "0"


def test_mixture_sample_deterministic_and_rate_shaped(spark):
    out1 = corpus.corpus_mixture_sample(spark, SF_ORACLE)
    rows = out1.collect()
    # Deterministic: identical output on re-execution.
    assert {(r["doc_id"]) for r in out1.collect()} == {
        r["doc_id"] for r in rows
    }
    rates = {r["source"]: r["rate"] for r in rows}
    docs = load_table(spark, SF_ORACLE, "documents")
    n_per_source = {
        r["source"]: r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    kept_per_source = {}
    for r in rows:
        kept_per_source[r["source"]] = kept_per_source.get(r["source"], 0) + 1
    # The most-upweighted source keeps everything (rate 1.0); kept
    # fraction tracks the rate within binomial noise.
    assert any(abs(v - 1.0) < 1e-9 for v in rates.values())
    import math

    for s, rate in rates.items():
        n, k = n_per_source[s], kept_per_source.get(s, 0)
        sigma = math.sqrt(n * rate * (1 - rate))
        assert abs(k - n * rate) <= 4 * sigma + 1, (s, k, n, rate)


def test_waterfill_invariants(spark):
    from newsflow.corpus import WATERFILL_BUDGET, source_budget_waterfill

    rows = source_budget_waterfill(spark, "/root/testdata/sf0.01").collect()
    total = sum(r.n_tokens for r in rows)
    alloc = sum(r.allocated for r in rows)
    if total <= WATERFILL_BUDGET:
        assert alloc == total and not any(r.is_capped for r in rows)
    else:
        # budget exhausted up to the floor-division remainder
        assert WATERFILL_BUDGET - len(rows) < alloc <= WATERFILL_BUDGET
        caps = {r.allocated for r in rows if r.is_capped}
        assert len(caps) == 1  # common water level
        level = caps.pop()
        # capped sources exceed the level; uncapped keep everything and
        # never exceed it (max-min fairness)
        assert all(r.n_tokens > level for r in rows if r.is_capped)
        assert all(
            r.allocated == r.n_tokens and r.n_tokens <= level
            for r in rows
            if not r.is_capped
        )
        # at sf0.01 the budget genuinely lands in the mixed regime
        assert any(r.is_capped for r in rows)
        assert any(not r.is_capped for r in rows)


def test_waterfill_all_fit_under_big_budget(spark):
    from newsflow import corpus

    # Same operator, budget above the corpus total: nothing capped.
    rows = corpus.source_budget_waterfill(
        spark, "/root/testdata/sf0.001"
    ).collect()
    total = sum(r.n_tokens for r in rows)
    if total <= corpus.WATERFILL_BUDGET:
        assert all(r.allocated == r.n_tokens for r in rows)
    else:
        assert sum(r.allocated for r in rows) <= corpus.WATERFILL_BUDGET
