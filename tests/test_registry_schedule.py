"""The driver checks a 50-slot prefix of the registry; the scheduler must
guarantee every oracled query reaches that window within ceil(N/50)
rounds, with no hand-tended rotation lists (VERDICT r2 "Next round" #2).
"""

from __future__ import annotations

import math

from newsflow import registry
from newsflow.registry import schedule_order

WINDOW = 50


def _simulate(n_queries: int, rounds: int, recheck=()):
    """Play the driver loop: each round the first WINDOW queries of the
    scheduled order go green for that round. Returns first-seen round
    per query (None = never reached the window)."""
    names = [f"q{i:03d}" for i in range(n_queries)]
    last_green: dict[str, int] = {}
    first_seen: dict[str, int | None] = {n: None for n in names}
    for rnd in range(1, rounds + 1):
        order = schedule_order(names, last_green, recheck)
        for n in order[:WINDOW]:
            last_green[n] = rnd
            if first_seen[n] is None:
                first_seen[n] = rnd
    return first_seen


def test_every_query_reaches_window_within_ceil_n_over_50():
    for n in (50, 73, 101, 137, 250):
        bound = math.ceil(n / WINDOW)
        seen = _simulate(n, bound)
        missed = [q for q, r in seen.items() if r is None]
        assert not missed, f"N={n}: {missed} never reached the window"


def test_never_green_sorts_before_any_green():
    names = [f"q{i}" for i in range(10)]
    last_green = {n: 1 for n in names if n != "q7"}
    order = schedule_order(names, last_green)
    assert order[0] == "q7"


def test_least_recently_green_first_then_registration_order():
    names = ["a", "b", "c", "d"]
    order = schedule_order(names, {"a": 3, "b": 1, "c": 2, "d": 1})
    assert order == ["b", "d", "c", "a"]


def test_recheck_jumps_queue_in_given_order():
    names = ["a", "b", "c", "d"]
    order = schedule_order(names, {"c": 9}, recheck=("c", "a"))
    assert order[:2] == ["c", "a"]


def test_rotation_converges_with_recheck_pins():
    # Even with rechecks occupying slots every round, the remaining
    # slots still drain the backlog (recheck count << WINDOW).
    seen = _simulate(101, 3, recheck=tuple(f"q{i:03d}" for i in range(6)))
    assert all(r is not None for r in seen.values())


def test_live_registry_puts_pending_work_first():
    specs = registry.all_specs()
    window = list(specs)[:WINDOW]
    history = registry._green_history()
    # LIVE (non-expired) recheck pins must be in the window; once a
    # recheck earns a green row in >= the declared round it expires and
    # legitimately rotates to the back.
    for name in registry._RECHECK_THIS_ROUND:
        if history.get(name, 0) < registry._RECHECK_DECLARED_ROUND:
            assert name in window, f"live recheck {name} not in window"
    # Any never-driver-green oracled query must be in the window (as
    # long as they number fewer than the window size).
    never_green = [
        n
        for n, s in specs.items()
        if s.oracle and history.get(n, 0) == 0
    ]
    if len(never_green) <= WINDOW - len(registry._RECHECK_THIS_ROUND):
        for name in never_green:
            assert name in window, f"never-green {name} missed the window"
    # Oracled queries strictly precede rows-only queries.
    oracled_flags = [bool(s.oracle) for s in specs.values()]
    assert oracled_flags == sorted(oracled_flags, reverse=True)


def test_recheck_expires_once_green_in_declared_round():
    # Simulate the registry's expiry rule directly: a recheck query that
    # gets its green row in the declared round must NOT retain front
    # priority afterwards.
    from newsflow.registry import _RECHECK_DECLARED_ROUND

    names = ["a", "b", "c"]
    history = {"a": _RECHECK_DECLARED_ROUND, "b": 1}
    live = tuple(
        n for n in ("a", "b")
        if history.get(n, 0) < _RECHECK_DECLARED_ROUND
    )
    assert live == ("b",)
    order = schedule_order(names, history, live)
    assert order[0] == "b"          # still-unverified recheck leads
    assert order[1] == "c"          # never-green next
    assert order[2] == "a"          # verified fix rotates normally


def test_round4_window_is_greedy_oldest_first():
    """VERDICT r3 #3: with the r3 rechecks expired, the round-4 window
    must be exactly (new never-green queries) + (live recheck pins) +
    the LEAST-recently-green cohort — no query may sit in the window
    while an older-green oracled query waits outside it."""
    specs = registry.all_specs()
    oracled = [n for n, s in specs.items() if s.oracle]
    history = registry._green_history()
    window, outside = oracled[:WINDOW], oracled[WINDOW:]
    live_recheck = {
        n
        for n in registry._RECHECK_THIS_ROUND
        if history.get(n, 0) < registry._RECHECK_DECLARED_ROUND
    }
    # r3's nine recheck pins are expired (green in r3) — none may still
    # occupy priority slots.
    assert "near_dup_clusters" not in live_recheck
    in_rounds = [
        history.get(n, 0) for n in window if n not in live_recheck
    ]
    out_rounds = [history.get(n, 0) for n in outside]
    if in_rounds and out_rounds:
        assert max(in_rounds) <= min(out_rounds), (
            "window holds a fresher-green query than one waiting outside: "
            f"max(in)={max(in_rounds)} > min(out)={min(out_rounds)}"
        )
    # Every never-driver-green query (the round-4 additions) is in the
    # window, and so is every live recheck.
    for n in oracled:
        if history.get(n, 0) == 0:
            assert n in window, f"never-green {n} outside window"
    for n in live_recheck:
        assert n in window, f"live recheck {n} outside window"


def test_round5_window_drains_stale_r1_cohort_from_committed_history():
    """VERDICT r4 #2, asserted from the COMMITTED CORRECTNESS_r*.json
    files rather than simulation: every oracled query whose newest
    driver-green row is the OLDEST round in the history must be inside
    the next window (the stale cohort is smaller than the slots left
    after never-green queries and recheck pins — 14 r1-stale + 1 new +
    1 recheck at round-5 start). The full r1+r2 backlog (57 queries at
    round-5 start) exceeds one 50-slot window by construction; the
    greedy-oldest-first test above already proves no fresher query cuts
    the line ahead of the residue."""
    specs = registry.all_specs()
    oracled = [n for n, s in specs.items() if s.oracle]
    history = registry._green_history()
    greens = [history[n] for n in oracled if history.get(n, 0) > 0]
    if not greens:  # fresh clone with no driver history: vacuous
        return
    oldest = min(greens)
    stale = [n for n in oracled if history.get(n, 0) == oldest]
    never = [n for n in oracled if history.get(n, 0) == 0]
    pins = len(registry._RECHECK_THIS_ROUND) + len(never)
    if len(stale) > WINDOW - pins:
        return  # cohort itself exceeds the free slots; greedy test governs
    window = set(oracled[:WINDOW])
    missing = [n for n in stale if n not in window]
    assert not missing, f"stale r{oldest} queries outside window: {missing}"


def test_round10_window_clears_entire_stale_cohort():
    """VERDICT r9 #4: at round-10 start the stale cohort is 45 r6-green
    queries — small enough that ONE window clears it completely,
    tightening the invariant to "no oracled query last-green < r7"
    after this round. This pin guards the new-query budget: every
    never-green (new) oracled query takes a slot ahead of the cohort,
    so the round may add at most WINDOW - |stale| of them. If this
    fails, either drop a new query's oracle to next round or accept
    the cohort spilling (and update this test with the new bound)."""
    specs = registry.all_specs()
    oracled = [n for n, s in specs.items() if s.oracle]
    history = registry._green_history()
    greens = [history[n] for n in oracled if history.get(n, 0) > 0]
    if not greens or min(greens) != 6:
        return  # history moved past round 10's state: the generic
        # drain test above governs
    stale = [n for n in oracled if history.get(n, 0) == 6]
    never = [n for n in oracled if history.get(n, 0) == 0]
    assert len(never) + len(stale) <= WINDOW, (
        f"{len(never)} never-green + {len(stale)} r6-stale exceed the "
        f"{WINDOW}-slot window: the r6 cohort will NOT drain this round"
    )
    window = set(oracled[:WINDOW])
    assert all(n in window for n in stale + never)
