"""Sampled-audit agreement + cost measurement (VERDICT r9 #5): the
`*_sampled` dedup audits vs their full-corpus twins at two SFs.

Two claims, measured separately:

1. **Pair audits are EXACT on the sample** — Jaccard/containment
   qualification is pairwise, so the sampled result must equal the full
   result restricted to pairs with both endpoints in the sample. This
   is a theorem about the operators; the script verifies it end-to-end
   anyway (set equality, not counts).
2. **Cluster audits are exact within the sample but components can
   split** when the only bridge doc falls outside the sample — the
   honest caveat `near_dup_clusters_sampled`'s docstring states. The
   script counts full components that shatter into >1 sampled
   component, and the fraction of sampled docs whose keeper matches
   the min SAMPLED member of their full component (assignment-level
   agreement under the sample's own keeper rule).

Usage: python scripts/stress_sampled_audit.py [sf_dir ...]
(defaults: /root/testdata/sf0.1 and the bench_sf1 synthetic dir if
present — run scripts/bench_sf1.py --keep first to materialize it).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pyspark.sql.functions as F  # noqa: E402

from newsflow.dedup import core  # noqa: E402
from newsflow.dedup.cluster import near_dup_clusters  # noqa: E402
from newsflow.dedup.queries import SAMPLE_PREFIXES, _sampled_docs  # noqa: E402
from newsflow.session import get_spark  # noqa: E402
from newsflow.tables import load_table, spread  # noqa: E402


def _timed(df):
    t0 = time.perf_counter()
    rows = df.collect()
    return rows, time.perf_counter() - t0


def run_sf(spark, sf_dir: str) -> None:
    docs = spread(load_table(spark, sf_dir, "documents"))
    sampled = _sampled_docs(spark, sf_dir)
    n_docs = docs.count()
    n_sampled = sampled.count()
    print(f"\n=== {sf_dir}: {n_docs} docs, {n_sampled} sampled "
          f"({len(SAMPLE_PREFIXES)}/16 md5 prefixes) ===")

    sample_ids = {r.doc_id for r in sampled.select("doc_id").collect()}
    for name, fn, thr in (
        ("jaccard", core.jaccard_pairs, 0.8),
        ("containment", core.containment_pairs, 0.9),
    ):
        full, t_full = _timed(fn(docs, n=3, threshold=thr))
        samp, t_samp = _timed(fn(sampled, n=3, threshold=thr))
        full_pairs = {(r.doc_a, r.doc_b) for r in full}
        samp_pairs = {(r.doc_a, r.doc_b) for r in samp}
        restricted = {
            (a, b)
            for a, b in full_pairs
            if a in sample_ids and b in sample_ids
        }
        exact = samp_pairs == restricted
        print(
            f"{name}: full {len(full_pairs)}p/{t_full:.1f}s  "
            f"sampled {len(samp_pairs)}p/{t_samp:.1f}s  "
            f"speedup {t_full / max(t_samp, 1e-9):.1f}x  "
            f"restriction-exact={exact}"
        )
        assert exact, f"{name} sampled != full∩sample² at {sf_dir}"

    # Time construction + collect: the iterative label propagation runs
    # EAGERLY (localCheckpoint per round) at build time.
    t0 = time.perf_counter()
    full_c = near_dup_clusters(
        core.jaccard_pairs(docs, n=3, threshold=0.8)
    ).collect()
    t_full = time.perf_counter() - t0
    t0 = time.perf_counter()
    samp_c = near_dup_clusters(
        core.jaccard_pairs(sampled, n=3, threshold=0.8)
    ).collect()
    t_samp = time.perf_counter() - t0
    comp_of = {r.doc_id: r.keeper for r in full_c}
    scomp_of = {r.doc_id: r.keeper for r in samp_c}
    # Full components restricted to sampled members, keyed by full keeper.
    restr: dict[int, set[int]] = {}
    for d, k in comp_of.items():
        if d in sample_ids:
            restr.setdefault(k, set()).add(d)
    splits = 0
    agree = 0
    total = 0
    for members in restr.values():
        skeepers = {scomp_of.get(d) for d in members if d in scomp_of}
        skeepers.discard(None)
        if len(skeepers) > 1:
            splits += 1
        expected = min(members)
        for d in members:
            if d in scomp_of:
                total += 1
                agree += scomp_of[d] == expected
    print(
        f"clusters: full {len(restr)} components (sampled-restricted) "
        f"/{t_full:.1f}s  sampled /{t_samp:.1f}s  "
        f"speedup {t_full / max(t_samp, 1e-9):.1f}x  "
        f"split-components={splits}  "
        f"keeper-agreement={agree}/{total}"
        f" ({(agree / total if total else 1):.3f})"
    )


def main() -> None:
    dirs = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not dirs:
        dirs = ["/root/testdata/sf0.1"]
        sf1 = "/tmp/newsflow_sf1"
        if os.path.isdir(sf1):
            dirs.append(sf1)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (
        os.cpu_count() or 4
    )
    spark = get_spark(
        app_name="newsflow-sampled-audit",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    for d in dirs:
        run_sf(spark, d)


if __name__ == "__main__":
    main()
