"""Count-Min sketch: structural properties, mergeability, oracle parity,
and plan shape (newsflow/sketch.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from newsflow import sketch as sk
from newsflow.tables import load_table
from tests.conftest import SF_SMOKE
from tests.oracle_utils import assert_parity


def _counts(spark):
    return sk._bigram_counts(load_table(spark, SF_SMOKE, "documents"))


def test_estimate_never_underestimates(spark):
    """est >= exact for EVERY key — structural (a key's own mass is in
    each of its D cells), not probabilistic."""
    counts = _counts(spark)
    est = sk.cms_estimate(counts, sk.cms_sketch(counts))
    assert est.filter(F.col("est_cnt") < F.col("c")).count() == 0
    assert est.count() == counts.count()


def test_sketch_merges_additively(spark):
    """sketch(A) + sketch(B) == sketch(A union B), elementwise — the
    property that makes the sketch map-side-combinable, micro-batch
    updatable, and cross-corpus unionable."""
    docs = load_table(spark, SF_SMOKE, "documents")
    whole = sk.cms_sketch(sk._bigram_counts(docs))
    a = sk.cms_sketch(sk._bigram_counts(docs.filter(F.col("doc_id") % 3 == 0)))
    b = sk.cms_sketch(sk._bigram_counts(docs.filter(F.col("doc_id") % 3 != 0)))
    merged = (
        a.withColumnRenamed("cell", "ca")
        .join(b.withColumnRenamed("cell", "cb"), ["salt", "bucket"], "full_outer")
        .select(
            "salt",
            "bucket",
            (F.coalesce("ca", F.lit(0)) + F.coalesce("cb", F.lit(0))).alias("cell"),
        )
    )
    diff = merged.join(
        whole.withColumnRenamed("cell", "cw"), ["salt", "bucket"], "full_outer"
    ).filter(
        F.coalesce("cell", F.lit(0)) != F.coalesce("cw", F.lit(0))
    )
    assert diff.count() == 0


def test_heavy_hitters_report(spark):
    """The registered query: non-empty at test SF, every row's bound
    certificate TRUE, and the report contains every TRUE heavy hitter
    (est >= exact makes containment structural — verified anyway)."""
    out = sk.bigram_cms_heavy_hitters(spark, SF_SMOKE).collect()
    assert len(out) > 0
    assert all(r.within_bound for r in out)
    assert all(r.est_cnt >= r.exact_cnt for r in out)
    counts = _counts(spark)
    n = counts.agg(F.sum("c")).collect()[0][0]
    true_heavy = {
        r.g
        for r in counts.filter(
            F.col("c") * sk.CMS_PHI_DEN >= sk.CMS_PHI_NUM * F.lit(n)
        ).collect()
    }
    reported = {r.bigram for r in out}
    assert true_heavy <= reported


def test_oracle_parity_smoke(spark, duck_smoke):
    assert_parity(
        sk.bigram_cms_heavy_hitters(spark, SF_SMOKE),
        sk._cms_oracle(),
        duck_smoke,
        "bigram_cms_heavy_hitters",
    )


def test_incremental_update_parity(spark, duck_smoke):
    from newsflow.registry import all_specs

    spec = all_specs()["cms_incremental_update"]
    assert_parity(
        spec.build(spark, SF_SMOKE), spec.oracle, duck_smoke, spec.name
    )


def test_estimation_broadcasts_sketch(spark):
    """The candidate-vs-sketch join must broadcast the D*W sketch side —
    a shuffled join here would shuffle the full candidate stream at
    production scale."""
    counts = _counts(spark)
    plan = sk.cms_estimate(counts, sk.cms_sketch(counts))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_streaming_cms_ingest_matches_rebuild(spark, duck_smoke):
    """The EXECUTED stream path: batch-delta partitions summed at read
    time equal the from-scratch whole-corpus sketch (DuckDB oracle),
    and replaying a batch's write is a no-op by partition overwrite."""
    from newsflow.registry import all_specs

    spec = all_specs()["streaming_cms_ingest"]
    assert_parity(spec.build(spark, SF_SMOKE), spec.oracle, duck_smoke, spec.name)


def test_cms_apply_batch_replay_idempotent(spark, tmp_path):
    from newsflow.streaming.ingest import cms_apply_batch, read_cms_sketch

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    d = str(tmp_path / "sketch")
    cms_apply_batch(spark, docs.filter(F.col("doc_id") < 50), 0, d)
    cms_apply_batch(spark, docs.filter(F.col("doc_id") >= 50), 1, d)
    once = {(r.salt, r.bucket): r.cell for r in read_cms_sketch(spark, d).collect()}
    # Replay batch 1 (at-least-once delivery): same partition, same rows.
    cms_apply_batch(spark, docs.filter(F.col("doc_id") >= 50), 1, d)
    twice = {(r.salt, r.bucket): r.cell for r in read_cms_sketch(spark, d).collect()}
    assert once == twice and len(once) > 0


def _sketch_dict(spark, d):
    from newsflow.streaming.ingest import read_cms_sketch

    return {
        (r.salt, r.bucket): r.cell for r in read_cms_sketch(spark, d).collect()
    }


def test_cms_maintenance_compacts_and_preserves(spark, tmp_path):
    from newsflow.fs import fs_list_subdirs
    from newsflow.streaming.ingest import cms_apply_batch, cms_maintenance

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    d = str(tmp_path / "sketch")
    for b in range(4):
        cms_apply_batch(spark, docs.filter(F.col("doc_id") % 4 == b), b, d)
    before = _sketch_dict(spark, d)
    # Batches 0-2 settled (committed offset = 3); 3 still live.
    out = cms_maintenance(spark, d, settled_before=3)
    assert out["merged_deltas"] == 3 and out["watermark"] == 3
    names = set(fs_list_subdirs(spark, d, "batch="))
    assert names == {"batch=-3", "batch=3"}
    assert _sketch_dict(spark, d) == before
    # Idempotent re-run: nothing newly settled, nothing to sweep.
    out2 = cms_maintenance(spark, d, settled_before=3)
    assert out2["merged_deltas"] == 0 and out2["debris_deleted"] == 0
    assert _sketch_dict(spark, d) == before


def test_cms_maintenance_crash_windows(spark, tmp_path):
    """The two crash windows: (a) base written, source deletes lost —
    the watermark read rule must NOT double-count and the next pass
    sweeps the debris without re-merging; (b) base write crashed
    (no _SUCCESS) — the invalid base is ignored and the deltas still
    read."""
    import os
    import shutil

    from newsflow.fs import fs_list_subdirs
    from newsflow.streaming.ingest import cms_apply_batch, cms_maintenance

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    d = str(tmp_path / "sketch")
    for b in range(3):
        cms_apply_batch(spark, docs.filter(F.col("doc_id") % 3 == b), b, d)
    before = _sketch_dict(spark, d)

    # (a) simulate: compact, then resurrect the source dirs (as if the
    # delete phase crashed after the base write).
    saved = str(tmp_path / "saved")
    shutil.copytree(d, saved)
    cms_maintenance(spark, d, settled_before=3)
    for name in ("batch=0", "batch=1", "batch=2"):
        shutil.copytree(os.path.join(saved, name), os.path.join(d, name))
    assert _sketch_dict(spark, d) == before  # debris excluded, not doubled
    out = cms_maintenance(spark, d, settled_before=3)
    assert out["merged_deltas"] == 0 and out["debris_deleted"] == 3
    assert set(fs_list_subdirs(spark, d, "batch=")) == {"batch=-3"}
    assert _sketch_dict(spark, d) == before

    # (b) simulate a crashed base write: a newer base without _SUCCESS
    # whose data file is TORN (truncated garbage, not valid parquet) —
    # the read must not even open its footer (ADVICE r11: the explicit
    # directory-list read, not read-all-then-filter).
    bad = os.path.join(d, "batch=-7")
    shutil.copytree(os.path.join(d, "batch=-3"), bad)
    os.remove(os.path.join(bad, "_SUCCESS"))
    for name in os.listdir(bad):
        if name.endswith(".parquet"):
            with open(os.path.join(bad, name), "wb") as fh:
                fh.write(b"PAR1\x00torn-mid-write")
    assert _sketch_dict(spark, d) == before  # invalid base ignored
    out = cms_maintenance(spark, d, settled_before=3)
    assert out["debris_deleted"] == 1  # the invalid base swept
    assert _sketch_dict(spark, d) == before


def test_bloom_no_false_negatives_and_fpr(spark):
    """No false negatives is structural (building a key sets exactly
    the bits probing checks); the false-positive rate must sit near the
    (1 - e^(-kn/m))^k sizing expectation (~0.2% here) — 2% is the
    10x alarm threshold."""
    from newsflow.sketch import bloom_dedup_prefilter

    rows = bloom_dedup_prefilter(spark, SF_SMOKE).collect()
    dups = [r for r in rows if r.is_dup]
    novel = [r for r in rows if not r.is_dup]
    assert len(dups) >= 50 and len(novel) > 0
    assert all(r.might_contain for r in dups)  # zero false negatives
    fp = sum(1 for r in novel if r.might_contain)
    assert fp / len(novel) <= 0.02


def test_bloom_probe_broadcasts_bitmap(spark):
    """The probe must broadcast the <= 128-row bitmap; shuffling the
    candidate stream against it would defeat the pre-filter's point."""
    import pyspark.sql.functions as F2

    from newsflow.sketch import bloom_build, bloom_probe

    docs = load_table(spark, SF_SMOKE, "documents")
    keys = docs.select(F2.md5("text").alias("k"))
    plan = bloom_probe(keys, bloom_build(keys))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bloom_sharded_analytic_envelope(spark):
    """The saturation experiment's two claims, against the analytic
    rates computed HERE in Python (no oracle-side transcendentals):
    the fixed 4096-bit form's FPR collapses to ~its saturated analytic
    value, far past sizing; the sharded ~12-bits/key form holds within
    a 4-sigma binomial envelope of (1 - e^(-kn_shard/m))^k."""
    import math

    rows = {
        r.form: r for r in sk.bloom_sharded_fpr_eval(spark, SF_SMOKE).collect()
    }
    fixed, sharded = rows["fixed_4096_bits"], rows["sharded_12bpk"]
    n = fixed.n_keys
    k, m = len(sk.BLOOM_SALTS), sk.BLOOM_SHARD_BITS
    assert sharded.n_shards == math.ceil(n * sk.BLOOM_BITS_PER_KEY / m)
    assert sharded.total_bits >= sk.BLOOM_BITS_PER_KEY * n
    # Fixed form: saturated (load kn/m ~ 0.9 here -> FPR ~ 12%,
    # 50x its 250-key design point) — the certificate must flip.
    p_fixed = (1 - math.exp(-k * n / m)) ** k
    assert not fixed.fpr_le_2pct
    assert fixed.false_positives > 4 * sharded.false_positives
    assert abs(fixed.false_positives - n * p_fixed) <= 4 * math.sqrt(
        n * p_fixed * (1 - p_fixed) + 1
    )
    # Sharded form: constant per-shard load regardless of n.
    n_shard = n / sharded.n_shards
    p_shard = (1 - math.exp(-k * n_shard / m)) ** k
    assert sharded.fpr_le_2pct
    assert sharded.false_positives <= n * p_shard + 4 * math.sqrt(
        n * p_shard * (1 - p_shard) + 1
    )


def test_bloom_sharded_no_false_negatives(spark):
    """Structural: probing the member keys themselves must return
    might_contain=true for every key, at any shard count."""
    docs = load_table(spark, SF_SMOKE, "documents")
    keys = docs.select(F.md5("text").alias("k")).distinct()
    for ns in (1, 3, 17):
        bloom = sk.bloom_build_sharded(keys, n_shards=ns)
        probed = sk.bloom_probe_sharded(keys, bloom, n_shards=ns)
        assert probed.filter(~F.col("might_contain")).count() == 0


def test_bloom_sharded_partitioned_probe_plan(spark):
    """broadcast=False is the past-broadcast scale path: the probe
    must become a shuffled equi-join on (shard, word) — co-partitioned
    work per reducer, no broadcast of the bitmap, no cartesian."""
    docs = load_table(spark, SF_SMOKE, "documents")
    keys = docs.select(F.md5("text").alias("k")).distinct()
    bloom = sk.bloom_build_sharded(keys, n_shards=17)
    # At test scale the 17 x 128-row bitmap is under the auto-broadcast
    # threshold, so Catalyst would (rightly) still broadcast; disable
    # the threshold to see the plan a past-broadcast bitmap gets.
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            sk.bloom_probe_sharded(keys, bloom, n_shards=17, broadcast=False)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastHashJoin" not in plan


def test_cms_four_nibble_width_parity(spark, duck_smoke):
    """The width generalization (VERDICT r11 Next #6): nibbles=4
    (W = 65536) builds the same sketch in both engines — width is a
    constructor argument, not a constant baked into the hash SQL."""
    counts = _counts(spark)
    got = {
        (r.salt, r.bucket): r.cell
        for r in sk.cms_sketch(counts, nibbles=4).collect()
    }
    assert max(b for _, b in got) >= 4096  # actually using the 4th nibble
    nib = lambda p: (  # noqa: E731
        f"(instr('0123456789abcdef', substr(md5(concat(salt, g)), {p}, 1)) - 1)"
    )
    bucket = " + ".join(
        f"{nib(p)} * CAST({16 ** (4 - p)} AS BIGINT)" for p in range(1, 5)
    )
    salts = ", ".join(f"('{s}')" for s in sk.CMS_SALTS)
    want = {
        (r[0], r[1]): r[2]
        for r in duck_smoke.execute(
            f"""
            WITH {sk._SQL_BIGRAM_COUNTS}
            SELECT salt, ({bucket}) AS bucket, CAST(sum(c) AS BIGINT)
            FROM counts CROSS JOIN (VALUES {salts}) s(salt)
            GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert got == want


def test_kmv_certificates_hold(spark):
    from newsflow.sketch import source_overlap_kmv, source_vocab_kmv

    v = source_vocab_kmv(spark, SF_SMOKE).collect()
    assert len(v) > 0 and all(r.within_4rsd for r in v)
    # Estimates land in a sane band around truth (4 rsd ~ 35%).
    for r in v:
        assert 0.5 * r.exact_vocab <= r.est_vocab <= 2.0 * r.exact_vocab
    o = source_overlap_kmv(spark, SF_SMOKE).collect()
    assert len(o) > 0 and all(r.jaccard_within_4rsd for r in o)


def test_kmv_union_merge_identity(spark):
    """K(A u B) computed from the two k-row SKETCHES equals the KMV of
    the union set computed directly — the merge rule that lets overlap
    questions be answered without rescanning either corpus."""
    import pyspark.sql.functions as F2

    from newsflow.sketch import KMV_K, _source_grams, kmv_sketch
    from newsflow.tables import load_table as lt

    grams = _source_grams(lt(spark, SF_SMOKE, "documents"))
    two = grams.filter(F2.col("source").isin("src0", "src1"))
    direct = (
        kmv_sketch(
            two.select(F2.lit("u").alias("source"), "g").distinct()
        )
        .select("h")
        .collect()
    )
    from pyspark.sql import Window

    merged = (
        kmv_sketch(two)  # per-source sketches
        .select("h")
        .distinct()
        .withColumn(
            "rn", F2.row_number().over(Window.orderBy("h"))
        )
        .filter(F2.col("rn") <= KMV_K)
        .select("h")
        .collect()
    )
    assert sorted(r.h for r in direct) == sorted(r.h for r in merged)


def test_kmv_overlap_plan_shape(spark):
    """The sketch-membership joins must be hash joins (an OR-condition
    join degrades to a nested loop over pairs x sketch rows); the only
    nested-loop joins allowed are the source-count-sized (S x S) pair
    cross products."""
    import re

    from newsflow.sketch import source_overlap_kmv

    plan = source_overlap_kmv(spark, SF_SMOKE)._jdf.queryExecution(
    ).executedPlan().toString()
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 2
    for line in plan.splitlines():
        if "NestedLoopJoin" in line or "CartesianProduct" in line:
            assert "(sa" in line and "sb" in line, line


def _bloom_dict(spark, d):
    from newsflow.streaming.ingest import read_bloom

    return {(r.word): r.bits for r in read_bloom(spark, d).collect()}


def _kmv_set(spark, d):
    from newsflow.streaming.ingest import read_kmv

    return {(r.source, r.h, r.rn) for r in read_kmv(spark, d).collect()}


def test_bloom_stream_lifecycle(spark, tmp_path):
    """Streamed bitmap: replay-idempotent deltas, compaction-invariant
    reads, and the crash window (base written, source deletes lost) —
    all benign because bit_or is associative AND idempotent. The merged
    read must equal the from-scratch build exactly."""
    import shutil as sh

    from newsflow.streaming.ingest import bloom_apply_batch, bloom_maintenance

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    d = str(tmp_path / "bloom")
    for b in range(2):
        bloom_apply_batch(spark, docs.filter(F.col("doc_id") % 2 == b), b, d)
    full = {
        r.word: r.bits
        for r in sk.bloom_build(docs.select(F.md5("text").alias("k")))
        .collect()
    }
    assert _bloom_dict(spark, d) == full
    # Replay batch 1: idempotent overwrite.
    bloom_apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 1), 1, d)
    assert _bloom_dict(spark, d) == full
    # Compact batch 0; read unchanged.
    out = bloom_maintenance(spark, d, settled_before=1)
    assert out["merged_deltas"] == 1
    assert _bloom_dict(spark, d) == full
    # Crash window: base written but source deletes lost — resurrected
    # debris is excluded by the watermark rule (and would be harmless
    # even if folded: OR is idempotent).
    saved = str(tmp_path / "saved")
    sh.copytree(d, saved)
    bloom_maintenance(spark, d, settled_before=2)
    sh.copytree(saved + "/batch=1", d + "/batch=1")
    assert _bloom_dict(spark, d) == full


def test_kmv_stream_lifecycle(spark, tmp_path):
    """Streamed per-source KMV: the k-smallest-DISTINCT merge equals
    the from-scratch sketch (same gram in two batches -> same md5, so
    DISTINCT-before-rank is load-bearing); replay and compaction are
    no-ops on the read."""
    from newsflow.streaming.ingest import kmv_apply_batch, kmv_maintenance

    docs = load_table(spark, SF_SMOKE, "documents")
    d = str(tmp_path / "kmv")
    for b in range(2):
        kmv_apply_batch(spark, docs.filter(F.col("doc_id") % 2 == b), b, d)
    full = {
        (r.source, r.h, r.rn)
        for r in sk.kmv_sketch(sk._source_grams(docs)).collect()
    }
    got = _kmv_set(spark, d)
    assert got == full and len(got) > 0
    kmv_apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 1), 1, d)
    assert _kmv_set(spark, d) == full
    import shutil as sh

    saved = str(tmp_path / "saved")
    sh.copytree(d, saved)
    out = kmv_maintenance(spark, d, settled_before=2)
    assert out["merged_deltas"] == 2
    assert _kmv_set(spark, d) == full
    # Crash window: base written, source deletes lost — resurrected
    # debris is excluded by the watermark rule, and would be harmless
    # even if folded (k-smallest-distinct is idempotent).
    sh.copytree(saved + "/batch=1", d + "/batch=1")
    assert _kmv_set(spark, d) == full
    out = kmv_maintenance(spark, d, settled_before=2)
    assert out["debris_deleted"] == 1
    assert _kmv_set(spark, d) == full


def test_bloom_stream_lifecycle_sharded(spark, tmp_path):
    """The PRODUCTION-sized sharded bitmap under the same stream
    lifecycle: per-batch (shard, word, bits) deltas OR-fold to the
    from-scratch sharded build, and compaction leaves the read
    unchanged — shard ids are hash-stable, so deltas built at equal
    shard counts merge freely."""
    from newsflow.streaming.ingest import (
        bloom_apply_batch,
        bloom_maintenance,
        read_bloom,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    d = str(tmp_path / "bloom_sharded")
    ns = 7
    for b in range(2):
        bloom_apply_batch(
            spark, docs.filter(F.col("doc_id") % 2 == b), b, d, n_shards=ns
        )
    full = {
        (r.shard, r.word): r.bits
        for r in sk.bloom_build_sharded(
            docs.select(F.md5("text").alias("k")), n_shards=ns
        ).collect()
    }

    def _read():
        return {
            (r.shard, r.word): r.bits
            for r in read_bloom(spark, d, sharded=True).collect()
        }

    assert _read() == full and len(full) > 0
    out = bloom_maintenance(spark, d, settled_before=2, sharded=True)
    assert out["merged_deltas"] == 2
    assert _read() == full
    # Probing the streamed bitmap: no false negatives, structural.
    keys = docs.select(F.md5("text").alias("k")).distinct()
    probed = sk.bloom_probe_sharded(
        keys, read_bloom(spark, d, sharded=True), n_shards=ns
    )
    assert probed.filter(~F.col("might_contain")).count() == 0


def test_plan_cms_stream_state_matches_inquery_build(spark, tmp_path):
    """The maintained planning sketch (two batch deltas + compaction)
    must sum to EXACTLY the in-query build over the whole corpus —
    additivity of per-batch band-key counts — and survive an
    at-least-once replay unchanged (partition overwrite)."""
    from newsflow.dedup import minhash
    from newsflow.fs import fs_list_subdirs
    from newsflow.streaming.ingest import (
        plan_cms_apply_batch,
        plan_cms_maintenance,
        read_plan_cms,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    d = str(tmp_path / "plan_sketch")
    plan_cms_apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 0), 0, d)
    plan_cms_apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 1), 1, d)

    sigs = minhash.band_signatures(
        minhash.doc_shingle_arrays(docs, 3), 16, 2
    ).withColumn(
        "ck",
        F.concat_ws(
            ":",
            F.col("band").cast("string"),
            F.col("key").cast("array<string>"),
        ),
    )
    full = {
        (r.d, r.bkt): r.cell for r in minhash._plan_cms_build(sigs).collect()
    }
    streamed = {
        (r.d, r.bkt): r.cell for r in read_plan_cms(spark, d).collect()
    }
    assert streamed == full and len(full) > 0
    # Replay batch 1; then compact batch 0 — both reads unchanged.
    plan_cms_apply_batch(spark, docs.filter(F.col("doc_id") % 2 == 1), 1, d)
    out = plan_cms_maintenance(spark, d, settled_before=1)
    assert out["watermark"] == 1
    assert set(fs_list_subdirs(spark, d, "batch=")) == {
        "batch=-1",
        "batch=1",
    }
    assert {
        (r.d, r.bkt): r.cell for r in read_plan_cms(spark, d).collect()
    } == full


def test_cms_streamed_candidates_plan_consumes_persisted_sketch(
    spark, tmp_path
):
    """VERDICT r12 Next #6 'plan assert': the routed candidate
    expansion fed by `read_plan_cms` must provably scan the PERSISTED
    sketch store — no in-query sketch build. The optimized plan's only
    scan of the sketch directory is the broadcast estimate join; the
    in-query build would instead show a second pass over the shingle
    signatures feeding an aggregate."""
    from newsflow.dedup import minhash
    from newsflow.streaming.ingest import plan_cms_apply_batch, read_plan_cms

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    d = str(tmp_path / "plan_sketch")
    plan_cms_apply_batch(spark, docs, 0, d)
    sketch = read_plan_cms(spark, d)  # NOT checkpointed: keep the scan
    arrays = minhash.doc_shingle_arrays(docs, 3)
    cands = minhash.native_minhash_candidates_cms_planned(
        arrays, max_bucket=64, sketch=sketch, sketch_covers_input=False
    )
    files = cands.inputFiles()
    assert any(
        "plan_sketch" in f for f in files
    ), f"plan does not read the persisted sketch: {files}"
    # And the estimates must reach the rows via broadcast, not shuffle.
    phys = cands._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys
