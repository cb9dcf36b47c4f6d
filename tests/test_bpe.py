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
        # Exact precondition for single-pass-replace == textbook greedy
        # at THIS step: no word contains the merged pair twice in a row
        # (L R L R shares the boundary space in the spaced form, so
        # non-overlapping replace merges only the first occurrence).
        # Checked dynamically per step because multi-char symbols can
        # form repeated pairs that no char-level regex on the raw word
        # anticipates (e.g. 'abcabc' after merging (a,b) then (ab,c)).
        for w, syms in segs.items():
            for i in range(len(syms) - 3):
                assert not (
                    syms[i] == lhs
                    and syms[i + 1] == rhs
                    and syms[i + 2] == lhs
                    and syms[i + 3] == rhs
                ), (w, step, lhs, rhs)
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
    """Static screens for the single-pass-replace == textbook-greedy
    precondition: no >= 3-run of identical symbols AND no repeated
    adjacent char pair (L R L R shares the boundary space, so
    non-overlapping replace merges only the first occurrence — e.g.
    'banana' for merge (a, n)). These char-level screens are necessary
    but not sufficient once symbols are multi-char; the EXACT per-step
    condition (merged pair never occurs twice in a row in any word's
    current segmentation) is asserted inside _py_bpe_greedy, which the
    next test drives through every merge step."""
    for w in _py_words(spark):
        assert not re.search(r"(.)\1\1", w), w
        assert not re.search(r"(.)(.)\1\2", w), w


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
