"""Driver-window rotation semantics (round-3 verdict, What's wrong #1-#3).

Pure logic over __spark_entry__._ordered_names — no SparkSession. The
driver records the FIRST 50 queries() entries each round, so ordering IS
the verification schedule:

- terminal no_oracle names must sort last (they can never hash-match);
- forced window names retire on their first green row (a past round's
  window must not re-occupy the slots after its greens land);
- the two re-verification entries carry stale pre-rewrite greens by
  design and retire only on a round >= 4 green;
- a window name whose row the driver failed to record re-queues.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as E
from osmgraft import contract as C

REVERIFY = {"window_rank", "value_deciles"}


def _with_history(seen, seen_r4plus, terminal):
    """Run _ordered_names under a synthetic driver history."""
    orig = E._driver_history

    def fake():
        fake.seen_r4plus = frozenset(seen_r4plus)
        # synthetic histories treat round>=4 greens as round>=5 too:
        # the r05/r06 tests that need the distinction pass disjoint sets
        fake.seen_r5plus = frozenset(seen_r4plus)
        return (frozenset(seen), frozenset(terminal))

    E._driver_history = fake
    try:
        return E._ordered_names()
    finally:
        E._driver_history = orig


def test_ordered_names_is_registry_permutation():
    names = E._ordered_names()
    assert sorted(names) == sorted(C.QUERIES)


def test_r04_window_fronts_under_r03_history():
    """Synthetic r03-era history (no r04 rows yet): the r04 window
    fronts the ordering. The old ``today`` form of this assertion went
    stale the moment the driver wrote CORRECTNESS_r04.json (r04 names
    correctly retire on their greens) — round-4 verdict, What's wrong
    #1; the epoch now lives in the fixture, not the filesystem."""
    out = _with_history(set(), set(), set())
    assert out[: len(E._R04_WINDOW)] == list(E._R04_WINDOW)


def test_todays_front_window_is_useful():
    """Epoch-independent: whatever CORRECTNESS files exist on disk, every
    slot the driver will actually record (first 50) must be able to
    produce a useful row — no terminal no_oracle names, and nothing
    already green unless it is a queued re-verification still awaiting
    its post-rewrite row."""
    names = E._ordered_names()
    verified, terminal = E._driver_history()
    fresh4 = E._driver_history.seen_r4plus
    fresh5 = E._driver_history.seen_r5plus
    unverified = [n for n in names if n not in verified and n not in terminal]
    front = names[: min(50, len(unverified))]
    assert not (set(front) & set(terminal))
    for n in front:
        if n in REVERIFY:
            assert n not in fresh4, n
        elif n == "embedding_neardup_pairs":
            assert n not in fresh5, n
        else:
            assert n not in verified, n


def test_terminal_no_oracle_names_sort_last():
    names = list(C.QUERIES)
    terminal = {names[0], names[10]}
    out = _with_history(set(), set(), terminal)
    assert set(out[-2:]) == terminal


def test_window_retires_on_green():
    greens = set(E._R04_WINDOW)
    out = _with_history(greens, greens, set())
    # entire r04 window green in r04 -> r05 window surfaces
    assert out[0] == E._R05_WINDOW[0]
    assert not (set(out[:50]) & (greens - REVERIFY))


def test_reverify_entries_ignore_stale_greens():
    # verified in an old round (stale), no round>=4 row yet -> still forced
    out = _with_history(REVERIFY, set(), set())
    assert out[:50][: len(E._R04_WINDOW)].count("window_rank") == 1
    assert "value_deciles" in out[:50]


def test_reverify_entries_retire_on_round4_green():
    out = _with_history(REVERIFY, REVERIFY, set())
    front = out[: len(E._R04_WINDOW)]
    assert "window_rank" not in front
    assert "value_deciles" not in front


def test_missed_window_row_requeues():
    greens = set(E._R04_WINDOW) - {"pq_quant_recall"}
    out = _with_history(greens, greens, set())
    assert out[0] == "pq_quant_recall"
    assert out[1] == E._R05_WINDOW[0]


def test_r05_window_names_are_registered_and_unverified_today():
    verified, terminal = E._driver_history()
    fresh5 = E._driver_history.seen_r5plus
    reverify5 = {"embedding_neardup_pairs"}  # r01 green, rewritten round 4
    for n in E._R05_WINDOW:
        assert n in C.QUERIES, n
        if n not in reverify5:
            # pre-r05-driver-run: must be unverified; once the r05 file
            # lands, any green is recorded as a round >= 5 row
            assert n not in verified or n in fresh5, (
                f"{n} green before r05 — drop from _R05_WINDOW"
            )
        assert n not in terminal, n
    assert len(set(E._R05_WINDOW)) == len(E._R05_WINDOW) == 52


def test_r06_window_names_are_registered_and_need_evidence():
    """Epoch-robust like the r05 check: every r06 window name is
    registered, oracle-capable, and either still unverified or carries
    a round >= 5 green (the rotation retires it then)."""
    verified, terminal = E._driver_history()
    fresh5 = E._driver_history.seen_r5plus
    for n in E._R06_WINDOW:
        assert n in C.QUERIES, n
        assert n not in verified or n in fresh5, (
            f"{n} green before r05 — drop from _R06_WINDOW"
        )
        assert n not in terminal, n
    assert len(set(E._R06_WINDOW)) == len(E._R06_WINDOW) == 52
    # disjoint from the earlier windows — each name burns one slot ever
    assert not set(E._R06_WINDOW) & set(E._R05_WINDOW)
    assert not set(E._R06_WINDOW) & set(E._R04_WINDOW)


def test_r06_window_queues_behind_unretired_r05_names():
    """Synthetic: all r04+r05 greens recorded -> r06 fronts; r05 missed
    one name -> that name leads, r06 follows."""
    g45 = set(E._R04_WINDOW) | set(E._R05_WINDOW)
    out = _with_history(g45, g45, set())
    assert out[0] == E._R06_WINDOW[0]
    missed = set(E._R05_WINDOW) - {"tfidf_cosine_pairs"}
    out = _with_history(set(E._R04_WINDOW) | missed,
                        set(E._R04_WINDOW) | missed, set())
    assert out[0] == "tfidf_cosine_pairs"
    assert out[1] == E._R06_WINDOW[0]


def test_r05_reverify_entry_queued_despite_old_green():
    """embedding_neardup_pairs carries an r01 green recorded against the
    pre-GEMM refine: it must lead the r05 queue DESPITE being verified —
    until a round >= 5 green retires it (epoch-conditional so the test
    stays true after the driver writes CORRECTNESS_r05.json)."""
    names = E._ordered_names()
    seen, _terminal = E._driver_history()
    assert "embedding_neardup_pairs" in seen  # r01 evidence exists
    if "embedding_neardup_pairs" in E._driver_history.seen_r5plus:
        assert "embedding_neardup_pairs" not in names[:50]
    else:
        assert "embedding_neardup_pairs" in names[:60]
