"""Waterfill allocator invariants on adversarial size distributions
(round-3 ADVICE: prove sum(allocated) <= budget rather than relying on
the cutoff condition's monotonicity argument alone).

Proof sketch the tests exercise: with c = (min failing rank) - 1,
total = full_sum + sum_{rk>c} min(n_rk, share)
      <= full_sum + (n_src - c) * ((budget - full_sum) // (n_src - c))
      <= budget
— which holds for ANY cutoff c, so the budget bound is robust even if
the ordering invariant were perturbed.
"""

from __future__ import annotations

import random

import pytest

from newsflow.corpus import waterfill_alloc

CASES = [
    # (name, sizes)
    ("one_giant", [1, 1, 1, 10_000]),
    ("all_tiny", [3] * 40),
    ("all_huge", [50_000, 60_000, 70_000]),
    ("budget_below_nsrc", [10] * 200),  # floor share is 0 for budget=100
    ("powers_of_two", [2**i for i in range(14)]),
    ("equal_at_boundary", [25, 25, 25, 25]),
    ("single_source", [123_456]),
    ("zero_tokens_source", [0, 0, 500, 500]),
]


@pytest.mark.parametrize("name,sizes", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("budget", [100, 1_000, 26_000])
def test_waterfill_budget_and_fairness(spark, name, sizes, budget):
    df = spark.createDataFrame(
        [(f"s{i:03d}", n) for i, n in enumerate(sizes)],
        "source string, n_tokens long",
    )
    rows = {r.source: r for r in waterfill_alloc(df, budget).collect()}
    assert len(rows) == len(sizes)
    total = sum(r.allocated for r in rows.values())
    # The budget is a hard ceiling whenever it can be (it always can:
    # floor division never over-assigns).
    assert total <= budget, f"{name}: allocated {total} > budget {budget}"
    for r in rows.values():
        assert 0 <= r.allocated <= r.n_tokens
    # Max-min fairness: every capped source gets the same floor share
    # (or its full size if smaller), and no uncapped source exceeds any
    # capped source's allocation.
    capped = [r for r in rows.values() if r.is_capped]
    uncapped = [r for r in rows.values() if not r.is_capped]
    if capped:
        share = max(r.allocated for r in capped)
        assert all(
            r.allocated == min(r.n_tokens, share) for r in capped
        ), f"{name}: unequal water level"
        assert all(r.allocated == r.n_tokens for r in uncapped)


def test_waterfill_randomized_skew(spark):
    """Seeded random heavy-tail distributions: the adversarial shape the
    ADVICE called out (sources whose rank order and sizes conspire)."""
    rng = random.Random(20260814)
    for trial in range(5):
        n_src = rng.randint(1, 30)
        sizes = [
            int(rng.paretovariate(0.7) * rng.choice([1, 10, 1000]))
            for _ in range(n_src)
        ]
        budget = rng.randint(1, max(2, sum(sizes)))
        df = spark.createDataFrame(
            [(f"s{i:03d}", n) for i, n in enumerate(sizes)],
            "source string, n_tokens long",
        )
        out = waterfill_alloc(df, budget).collect()
        total = sum(r.allocated for r in out)
        assert total <= budget, (trial, sizes, budget, total)
        assert all(0 <= r.allocated <= r.n_tokens for r in out)
        # Exhaustiveness: if anything was capped, the leftover after the
        # full-funded prefix is too small to raise every capped source by
        # one more token (the allocation is maximal for a common level).
        capped = [r for r in out if r.is_capped]
        if capped:
            assert budget - total < len(capped)
