"""BPE merge learning (newsflow/ml/bpe.py) vs a pure-Python textbook
reference (greedy left-to-right fold merges, Sennrich et al.)."""

from __future__ import annotations

import re
from collections import Counter

from newsflow.ml.bpe import BPE_MERGES
from newsflow.registry import all_specs
from newsflow.tables import load_table
from tests.conftest import SF_ORACLE


def _py_words(spark):
    rows = (
        load_table(spark, SF_ORACLE, "documents").select("text").collect()
    )
    words: Counter = Counter()
    for r in rows:
        for w in re.split(r"[^a-z0-9]+", (r.text or "").lower()):
            if w:
                words[w] += 1
    return words


def _py_bpe_greedy(words: Counter, n_merges: int):
    """Textbook greedy BPE: fold-based merge application (runs merge
    left-to-right compactly), same (count DESC, lhs, rhs) argmax."""
    segs = {w: list(w) for w in words}
    merges = []
    for step in range(1, n_merges + 1):
        pc: Counter = Counter()
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += words[w]
        (lhs, rhs), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, lhs, rhs, c))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == lhs
                    and syms[i + 1] == rhs
                ):
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges, segs


def test_corpus_has_no_triple_symbol_runs(spark):
    """The single-pass-replace variant equals textbook greedy BPE
    whenever no >= 3-run of identical adjacent symbols appears — assert
    that precondition holds on the check corpus so the next test is a
    true textbook comparison."""
    for w in _py_words(spark):
        assert not re.search(r"(.)\1\1", w), w


def test_merge_table_matches_textbook_reference(spark):
    """The engine's learned merge table (and final segmentations) must
    equal the pure-Python textbook trainer on the same corpus."""
    words = _py_words(spark)
    ref_merges, ref_segs = _py_bpe_greedy(words, BPE_MERGES)

    specs = all_specs()
    got = [
        (r.step, r.lhs, r.rhs, r.pair_count)
        for r in specs["bpe_merge_table"]
        .build(spark, SF_ORACLE)
        .orderBy("step")
        .collect()
    ]
    assert got == ref_merges

    segs = {
        r.word: r.segmented.split(" ")
        for r in specs["bpe_word_segments"].build(spark, SF_ORACLE).collect()
    }
    assert segs == ref_segs
