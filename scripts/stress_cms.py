"""Scale-up stress for the Count-Min sketch: build + estimate at 1x and
Nx corpus, proving (a) the sketch row count stays D*W regardless of
corpus size, (b) build wall grows ~linearly (one token pass + a
vocab-keyed shuffle), (c) the estimate probe stays a broadcast join
whose cost tracks the CANDIDATE count, not the corpus.

Usage: python scripts/stress_cms.py [copies]   # default 10
Prints one JSON line for BENCH_sf1.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from newsflow import sketch as sk  # noqa: E402
from newsflow.session import get_spark  # noqa: E402
from newsflow.tables import load_table  # noqa: E402


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="newsflow-stress-cms")
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    big = None
    for i in range(copies):
        c = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            # Distinct suffix per copy so the Nx corpus grows the vocab
            # too (new bigrams at each copy's seams), not just the mass.
            F.concat("text", F.lit(f" stresscopy{i}")).alias("text"),
        )
        big = c if big is None else big.union(c)

    # Steady-state: one untimed warm pass compiles the whole chain
    # (codegen + parquet reader init) so the 1x/Nx comparison measures
    # the plans, not first-run compilation (the bench.py methodology).
    sk.cms_sketch(sk._bigram_counts(docs)).count()

    out: dict[str, object] = {"copies": copies, "sf_dir": sf_dir}
    for label, frame in (("1x", docs), ("%dx" % copies, big)):
        t0 = time.perf_counter()
        counts = sk._bigram_counts(frame).localCheckpoint(eager=True)
        sketch = sk.cms_sketch(counts).localCheckpoint(eager=True)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        est = sk.cms_estimate(counts, sketch)
        n_over = est.filter(F.col("est_cnt") < F.col("c")).count()
        probe_s = time.perf_counter() - t0
        out[label] = {
            "n_tokens": int(counts.agg(F.sum("c")).collect()[0][0]),
            "vocab": counts.count(),
            "sketch_rows": sketch.count(),
            "build_s": round(build_s, 2),
            "probe_all_vocab_s": round(probe_s, 2),
            "underestimates": int(n_over),
        }
    # Planted skew: the synthetic corpus is near-uniform, so ALSO prove
    # the actual heavy-hitter use case — replicate one document 500x
    # (a hot page / boilerplate burst) and check the report finds every
    # one of its bigrams, within the 8N/W certificate.
    hot = docs.filter(F.col("doc_id") == 0).select("text")
    planted = docs.select("text").union(
        hot.crossJoin(spark.range(500).select(F.lit(1).alias("_one"))).select(
            "text"
        )
    )
    counts = sk._bigram_counts(planted).localCheckpoint(eager=True)
    n = counts.agg(F.sum("c")).collect()[0][0]
    est = sk.cms_estimate(counts, sk.cms_sketch(counts))
    heavy = est.filter(
        F.col("est_cnt") * sk.CMS_PHI_DEN >= sk.CMS_PHI_NUM * F.lit(n)
    )
    hot_grams = sk._bigram_counts(hot).filter(
        F.col("c") * 500 * sk.CMS_PHI_DEN >= sk.CMS_PHI_NUM * F.lit(n)
    )
    missed = hot_grams.join(heavy, "g", "left_anti").count()
    out["planted"] = {
        "hot_true_heavy_bigrams": hot_grams.count(),
        "missed_by_report": int(missed),
        "max_overcount_norm_w": float(
            est.agg(
                F.max((F.col("est_cnt") - F.col("c")) * sk.CMS_WIDTH / n)
            ).collect()[0][0]
        ),
    }
    # Bloom filter at 1x/Nx: bitmap row count is capped at BLOOM_WORDS
    # regardless of key count, and the probe joins candidates against
    # the broadcast bitmap — wall tracks the CANDIDATE side only.
    for label, frame in (("1x", docs), ("%dx" % copies, big)):
        keys = frame.select(F.md5("text").alias("k"))
        t0 = time.perf_counter()
        bitmap = sk.bloom_build(keys).localCheckpoint(eager=True)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn = (
            sk.bloom_probe(keys, bitmap)
            .filter(~F.col("might_contain"))
            .count()
        )
        probe_s = time.perf_counter() - t0
        out["bloom_" + label] = {
            "keys": keys.count(),
            "bitmap_rows": bitmap.count(),
            "build_s": round(build_s, 2),
            "self_probe_s": round(probe_s, 2),
            "false_negatives": int(fn),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
