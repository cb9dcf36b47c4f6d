"""Incremental near-dup indexing stress: per-batch cost must track the
BATCH, not the corpus (VERDICT r5 #2 "a stress row showing cost tracks
batch size, not corpus size").

Protocol: a FIXED ingest batch (suffix-mutated copies of sf0.1 docs, so
every batch doc has a true ~0.9-Jaccard match in the index) is probed
against an index built from the sf0.1 corpus replicated ``copies`` x
(distinct suffixes — the bench_sf1 replication scheme). The index's
band-signature and shingle-array tables are PERSISTED to parquet before
timing, as a production pipeline stores them; the timed region is only
what a daily ingest pays: shingle+sign the batch, probe the stored
signature table, exact-verify candidates. For contrast the full
re-pairing (`native_minhash_near_dup_pairs` over index ∪ batch) is
timed too — the thing incremental indexing exists to avoid.

Usage: python scripts/stress_incremental.py [copies ...]
Prints one JSON line per copies value: index size, probe wall,
re-pair wall, and the verified match count (which must be stable:
the batch's true matches are per-original-doc, independent of copies
only for its OWN originals — replicated siblings add matches, reported
for honesty).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from newsflow.dedup import minhash  # noqa: E402
from newsflow.dedup.core import doc_shingle_arrays  # noqa: E402
from newsflow.session import get_spark  # noqa: E402
from newsflow.tables import load_table  # noqa: E402

SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH_DOCS = 500
KEY_SHIFT = 10_000_000


def main() -> None:
    copies_list = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 10]
    spark = get_spark(app_name="newsflow-stress-incremental")
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = load_table(spark, SRC_SF, "documents")
    # Fixed batch: near-dup re-ingests of the FIRST ``BATCH_DOCS``
    # originals, ids far above every replicated index id.
    batch = (
        docs.filter(F.col("doc_id") < BATCH_DOCS)
        .select(
            (F.col("doc_id") + F.lit(100 * KEY_SHIFT)).alias("doc_id"),
            F.concat("text", F.lit(" ingestbatch")).alias("text"),
            "lang",
            "source",
        )
        .cache()
    )
    batch.count()

    for copies in copies_list:
        index_docs = None
        for i in range(copies):
            c = docs.select(
                (F.col("doc_id") + F.lit(i * KEY_SHIFT)).alias("doc_id"),
                F.concat("text", F.lit(f" idxcopy{i}")).alias("text"),
                "lang",
                "source",
            )
            index_docs = c if index_docs is None else index_docs.unionByName(c)

        tmp = tempfile.mkdtemp(prefix="stress_incr_")
        arrays = doc_shingle_arrays(index_docs, 3)
        arrays.write.mode("overwrite").parquet(f"{tmp}/arrays")
        minhash.band_signatures(arrays).write.mode("overwrite").parquet(
            f"{tmp}/sigs"
        )
        stored_sigs = spark.read.parquet(f"{tmp}/sigs")
        stored_arrays = spark.read.parquet(f"{tmp}/arrays")
        n_index = stored_arrays.count()

        probe_wall = float("inf")
        n_matches = 0
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n_matches = minhash.incremental_neardup_from_index(
                stored_sigs, stored_arrays, batch, n=3, threshold=0.8
            ).count()
            probe_wall = min(probe_wall, time.perf_counter() - t0)

        t0 = time.perf_counter()
        n_full = minhash.native_minhash_near_dup_pairs(
            index_docs.unionByName(batch), n=3, threshold=0.8
        ).count()
        repair_wall = time.perf_counter() - t0

        shutil.rmtree(tmp, ignore_errors=True)
        print(
            json.dumps(
                {
                    "copies": copies,
                    "index_docs": n_index,
                    "batch_docs": BATCH_DOCS,
                    "incremental_sec": round(probe_wall, 2),
                    "incremental_matches": n_matches,
                    "full_repair_sec": round(repair_wall, 2),
                    "full_repair_pairs": n_full,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
