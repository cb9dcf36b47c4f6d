"""FFD packing (newsflow/packing.py): invariants + a pure-Python
first-fit-decreasing reference replay on the real corpus."""

from __future__ import annotations

import re
from collections import defaultdict

from newsflow.curation import N_PACK_SHARDS, SEQ_LEN
from newsflow.registry import all_specs
from tests.conftest import SF_ORACLE

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _py_ffd(docs_by_shard):
    """Textbook FFD per shard: (shard, bin_idx) -> [doc_id...]."""
    out = {}
    for shard, docs in docs_by_shard.items():
        docs = sorted(docs, key=lambda x: (-x[1], x[0]))
        bins: list[int] = []
        members = defaultdict(list)
        for doc_id, n in docs:
            for i, rem in enumerate(bins):
                if rem >= n:
                    bins[i] -= n
                    members[i + 1].append(doc_id)
                    break
            else:
                bins.append(SEQ_LEN - n)
                members[len(bins)].append(doc_id)
        for b, ids in members.items():
            out[(shard, b)] = sorted(ids)
    return out


def test_ffd_matches_python_reference_and_invariants(spark):
    import hashlib

    from newsflow.tables import load_table

    rows = (
        load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "text")
        .collect()
    )
    by_shard = defaultdict(list)
    total = 0
    for r in rows:
        toks = [t for t in _TOKEN_RE.split((r.text or "").lower()) if t]
        h = hashlib.md5(str(r.doc_id).encode()).hexdigest()
        shard = ord(h[0]) % N_PACK_SHARDS
        by_shard[shard].append((r.doc_id, len(toks)))
        total += len(toks)
    ref = _py_ffd(by_shard)

    got = {
        (r.shard, r.seq_id): (r.n_docs, r.seq_tokens, r.doc_ids)
        for r in all_specs()["corpus_pack_ffd"]
        .build(spark, SF_ORACLE)
        .collect()
    }
    assert set(got) == set(ref)
    for key, (n_docs, seq_tokens, doc_ids) in got.items():
        ids = [int(x) for x in doc_ids.split("-")]
        assert ids == ref[key]
        assert n_docs == len(ids)
        # capacity respected unless a single oversized doc owns the bin
        assert seq_tokens <= SEQ_LEN or n_docs == 1
    assert sum(v[1] for v in got.values()) == total  # token conservation


def test_waste_report_tradeoff(spark):
    rows = {
        r.packer: r
        for r in all_specs()["corpus_pack_waste_report"]
        .build(spark, SF_ORACLE)
        .collect()
    }
    ffd, fw = rows["ffd"], rows["fixed_window"]
    # Both packers place the same token mass.
    assert (
        ffd.n_sequences * SEQ_LEN - ffd.padded_tokens
        == fw.n_sequences * SEQ_LEN - fw.padded_tokens
    )
    # The trade: fixed windows split docs but pad only final partials;
    # FFD splits nothing (absent oversized docs) but pads more.
    assert fw.split_docs > 0
    assert ffd.split_docs == 0  # no >SEQ_LEN docs in the check corpus
    assert ffd.padded_tokens >= fw.padded_tokens
    assert ffd.n_sequences >= fw.n_sequences
    assert 0.0 < ffd.fill_pct <= 1.0
    # FFD stays within 3x of the bin-count lower bound on this corpus
    # (classic FFD bound is 11/9 OPT + 6/9; shard-local packing can
    # only add per-shard rounding).
    assert ffd.n_sequences <= 3 * fw.n_sequences


def test_ffd_arrow_matches_jvm_fold(spark):
    """The shipped Arrow FFD and the pure-JVM aggregate-fold reference
    must produce identical assignments on the real corpus."""
    from newsflow.packing import _ffd_assigns, _ffd_assigns_jvm, _toks

    toks = _toks(spark, SF_ORACLE)
    a = {
        (r.shard, r.doc_id, r.n_tokens, r.bin_idx)
        for r in _ffd_assigns(toks).collect()
    }
    b = {
        (r.shard, r.doc_id, r.n_tokens, r.bin_idx)
        for r in _ffd_assigns_jvm(toks).collect()
    }
    assert a == b
