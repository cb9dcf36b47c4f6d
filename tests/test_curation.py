"""Unit tests for the curation funnel's stage semantics on a hand-built
corpus: deterministic exact-dup keeper choice, greedy near-dup drop, and
funnel monotonicity. (Oracle parity at sf0.01 is covered automatically by
tests/test_oracle_parity.py via the registry.)"""

from __future__ import annotations

from newsflow import curation
from tests.conftest import SF_SMOKE

# A high-quality, long, lexically diverse English sentence base — passes
# the quality gate (score >= 0.6) comfortably.
_BASE = (
    "distributed query engines shuffle partition data across executor "
    "nodes while broadcast joins replicate small dimension tables "
    "everywhere reducing network traffic during large scale analytics "
    "workloads that scan columnar parquet files with predicate pushdown "
    "enabled for maximum throughput on modern hardware clusters today"
)
# Near-dup of _BASE: one word changed -> Jaccard on 3-gram shingles ~0.9.
_NEAR = _BASE.replace("maximum", "optimal")
# Clearly distinct document, same quality profile.
_OTHER = (
    "streaming pipelines watermark late arriving events into tumbling "
    "windows aggregating session state incrementally while checkpoint "
    "barriers guarantee exactly once semantics across micro batch "
    "boundaries when sinks commit idempotent transactional output files "
    "partitioned by event time for downstream consumption reliability"
)


def _docs(spark):
    rows = [
        (1, _BASE, "en", "siteA"),
        (2, _BASE, "en", "siteB"),      # exact dup of 1 -> dropped
        (3, _NEAR, "en", "siteC"),      # near dup of 1 -> dropped (greedy)
        (4, _OTHER, "en", "siteD"),     # kept
        (5, _BASE, "fr", "siteE"),      # language-gated out
        (6, "the a an and of to", "en", "siteF"),  # quality-gated out
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_curate_funnel_semantics(spark):
    out = curation.curate(_docs(spark), spark)
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 1 survives (min doc_id in both its exact and near-dup groups),
    # doc 4 survives; everything else is filtered at its stage.
    assert set(rows) == {1, 4}
    assert rows[1]["source"] == "siteA"  # keeper is min doc_id, not arbitrary
    assert rows[1]["n_tokens"] == len(_BASE.split())


def test_exact_stage_keeps_min_doc_id_row(spark):
    filtered = curation._scored(_docs(spark)).filter("lang = 'en'")
    kept = curation.curate_exact_stage(filtered)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 2 not in ids  # exact dup of 1 removed
    assert 1 in ids and 3 in ids and 4 in ids


def test_token_budget_equals_global_sort_prefix(spark):
    """The scale-safe two-pass (bucket histogram + boundary window) must
    produce exactly the docs a naive global sort-and-cumsum would keep.
    Scoring is shared via curation._scored — this test pins the selection
    ALGORITHM (two-pass == global prefix), the score itself is pinned by
    the DuckDB oracle."""
    import pyspark.sql.functions as F

    from newsflow.functions.scalars import dround
    from newsflow.tables import load_table

    sf = SF_SMOKE
    got = {
        r["doc_id"]
        for r in curation.corpus_token_budget_sample(spark, sf).collect()
    }
    scored = (
        curation._scored(load_table(spark, sf, "documents"))
        .select("doc_id", "n_tokens", dround(F.col("q"), 4).alias("qb"))
        .toPandas()
    )
    budget = int(scored["n_tokens"].sum() * curation.BUDGET_FRACTION)
    ref = scored.sort_values(["qb", "doc_id"], ascending=[False, True])
    ref = ref[ref["n_tokens"].cumsum() <= budget]
    assert got == set(ref["doc_id"])
    assert len(got) > 0


def test_export_training_shards_roundtrip(spark, tmp_path):
    from newsflow.curation import export_training_shards
    from newsflow.tables import load_table
    from newsflow import curation
    from tests.conftest import SF_ORACLE

    counts = export_training_shards(spark, SF_ORACLE, str(tmp_path / "shards"))
    kept = curation.curate(
        load_table(spark, SF_ORACLE, "documents"), spark
    ).count()
    assert sum(counts.values()) == kept
    assert counts.get("train", 0) > counts.get("val", 0) >= 0
    # written artifact is hive-partitioned by split
    subdirs = {p.name for p in (tmp_path / "shards").iterdir() if p.is_dir()}
    assert {f"split={s}" for s in counts} <= subdirs


def test_export_training_shards_deterministic(spark, tmp_path):
    """Two exports of the same corpus are logically identical — the
    reproducibility contract a training run depends on (md5 split/shard
    assignment, hash-ordered packing, no rand() anywhere)."""
    from newsflow.curation import export_training_shards
    from newsflow.sources.sinks import read_jsonl
    from tests.conftest import SF_SMOKE

    a = export_training_shards(spark, SF_SMOKE, str(tmp_path / "a"))
    b = export_training_shards(spark, SF_SMOKE, str(tmp_path / "b"))
    assert a == b

    def logical(path):
        return sorted(
            (r.doc_id, r.split, r.shard, r.pack_id, r.pack_offset)
            for r in read_jsonl(spark, path).collect()
        )

    assert logical(str(tmp_path / "a")) == logical(str(tmp_path / "b"))


def _docs_frame(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_curate_expectation_gate_blocks_broken_batch(spark):
    """Error-level expectation failures (null key / duplicate key / empty
    text) must fail-fast the funnel before anything is ingested."""
    import pytest

    bad = _docs_frame(
        spark,
        [
            (1, "a perfectly fine document about things", "en", "src1", 39),
            (1, "duplicate key document here", "en", "src2", 27),  # dup id
            (2, "", "en", "src3", 0),  # empty text
            (None, "orphan row with no key", "en", "src4", 22),  # null id
        ],
    )
    with pytest.raises(curation.ExpectationFailure) as exc:
        curation.curate(bad, spark, enforce_expectations=True)
    msg = str(exc.value)
    for check in ("doc_id_not_null", "doc_id_unique", "text_not_empty"):
        assert check in msg


def test_curate_expectation_gate_ignores_warn_level(spark):
    """warn-severity failures (bad source format, out-of-domain lang,
    stale n_chars) must NOT block the funnel — they are monitoring
    signals, and the funnel's own lang filter handles them downstream."""
    warn_only = _docs_frame(
        spark,
        [
            # n_chars wrong + lang out of domain + source format bad:
            # all warn-level; keys and texts are structurally sound.
            # Text passes the quality gate (distinct tokens, no stopwords).
            (i, " ".join(f"token{i}x{j}" for j in range(120)),
             "xx" if i == 0 else "en", "weird-source", 999)
            for i in range(6)
        ],
    )
    out = curation.curate(warn_only, spark, enforce_expectations=True)
    assert out.count() > 0  # funnel ran; gate did not fire


def test_expectations_gate_report_matches_severity_map(spark):
    from newsflow.corpus import EXPECTATION_SEVERITY
    from newsflow.registry import all_specs

    spec = all_specs()["expectations_gate_report"]
    rows = {r.check_name: r for r in spec.build(spark, SF_SMOKE).collect()}
    assert set(rows) == set(EXPECTATION_SEVERITY)
    for name, r in rows.items():
        assert r.severity == EXPECTATION_SEVERITY[name]
        assert r.blocks_ingestion == ((not r.passed) and r.severity == "error")


def test_cluster_split_eliminates_near_dup_leakage(spark):
    """The by_cluster rule's whole claim: ZERO near-dup pairs straddle a
    split boundary, measured (not argued) at the oracle SF — where the
    corpus genuinely has cross-source near-dup pairs that the per-doc
    and by-source rules demonstrably leak."""
    from tests.conftest import SF_ORACLE

    from newsflow.registry import all_specs

    rows = {
        r.split_rule: r
        for r in all_specs()["split_leakage_audit"]
        .build(spark, SF_ORACLE)
        .collect()
    }
    assert rows["by_cluster"].n_pairs > 0  # signal present, not vacuous
    assert rows["by_cluster"].n_cross_split_pairs == 0
    # The rules it improves on really do leak on this corpus.
    assert rows["per_document"].n_cross_split_pairs > 0
    assert rows["by_source"].n_cross_split_pairs > 0


def test_cluster_split_covers_corpus_and_respects_reps(spark):
    """Every document gets exactly one split; clustered docs inherit the
    keeper's bucket, singletons their own — checked by recomputing the
    split from cluster_rep independently."""
    import pyspark.sql.functions as F

    from newsflow.registry import all_specs

    out = all_specs()["corpus_cluster_split"].build(spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert out.count() == docs.count()
    b = F.substring(F.md5(F.col("cluster_rep").cast("string")), 1, 1)
    expected = (
        F.when(b.isin("d", "e"), "val")
        .when(b == "f", "test")
        .otherwise("train")
    )
    assert out.filter(F.col("split") != expected).count() == 0
    assert out.filter(F.col("cluster_rep") > F.col("doc_id")).count() == 0


def test_cluster_split_stability_under_cluster_growth(spark):
    """The keeper convention's stability guarantee, exercised directly:
    adding a LATER-id member to a near-dup cluster leaves every existing
    member's representative — and therefore split — unchanged; only an
    EARLIER id joining can move a cluster (the documented exception)."""
    import pyspark.sql.functions as F

    from newsflow.dedup.cluster import near_dup_clusters

    pairs_before = spark.createDataFrame(
        [(10, 20), (20, 30), (50, 60)], ["doc_a", "doc_b"]
    )
    # A later-id doc (31) joins the {10,20,30} cluster.
    pairs_after = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 31), (50, 60)], ["doc_a", "doc_b"]
    )
    before = {
        r.doc_id: r.keeper for r in near_dup_clusters(pairs_before).collect()
    }
    after = {
        r.doc_id: r.keeper for r in near_dup_clusters(pairs_after).collect()
    }
    for doc_id, keeper in before.items():
        assert after[doc_id] == keeper
    assert after[31] == 10  # newcomer inherits the existing keeper
    # An earlier id (5) joining DOES re-key that cluster - the documented
    # exception, not silent breakage.
    pairs_rekeyed = spark.createDataFrame(
        [(5, 10), (10, 20), (20, 30), (50, 60)], ["doc_a", "doc_b"]
    )
    rekeyed = {
        r.doc_id: r.keeper for r in near_dup_clusters(pairs_rekeyed).collect()
    }
    assert rekeyed[10] == 5 and rekeyed[30] == 5
    assert rekeyed[50] == 50  # untouched cluster keeps its keeper


def test_cluster_split_lsh_pair_source_agrees(spark):
    """The documented 100 TB swap, executed: feeding
    `cluster_keyed_split` the banded-LSH pair tier instead of the exact
    pairs yields an IDENTICAL split assignment at the check SF (where
    the recall gate pins LSH recall to 1) — so swapping the pair source
    at scale changes cost, not semantics."""
    from tests.conftest import SF_ORACLE

    from newsflow.dedup import minhash
    from newsflow.dedup.core import jaccard_pairs_from_arrays
    from newsflow.tables import load_table, spread

    docs = load_table(spark, SF_ORACLE, "documents")
    arrays = minhash.doc_shingle_arrays(spread(docs), 3).cache()
    exact_fed = curation.cluster_keyed_split(
        docs, jaccard_pairs_from_arrays(arrays, threshold=0.8)
    )
    lsh_fed = curation.cluster_keyed_split(
        docs,
        minhash._verify_pairs(
            arrays, minhash.native_minhash_candidates(arrays), threshold=0.8
        ),
    )
    a = {r.doc_id: (r.cluster_rep, r.split) for r in exact_fed.collect()}
    b = {r.doc_id: (r.cluster_rep, r.split) for r in lsh_fed.collect()}
    arrays.unpersist()
    assert a == b
    assert len(a) == docs.count()
