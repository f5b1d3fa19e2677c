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
        return (frozenset(seen), frozenset(terminal))

    E._driver_history = fake
    try:
        return E._ordered_names()
    finally:
        E._driver_history = orig


def test_ordered_names_is_registry_permutation():
    names = E._ordered_names()
    assert sorted(names) == sorted(C.QUERIES)


def test_r04_window_fronts_the_ordering_today():
    names = E._ordered_names()
    assert names[: len(names[:50])][:4] == list(E._R04_WINDOW[:4])
    # every real window slot is oracle-paired or an intended rows-only —
    # the four terminal no_oracle names must not appear
    verified, terminal = E._driver_history()
    assert not (set(names[:50]) & set(terminal))


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
    reverify5 = {"embedding_neardup_pairs"}  # r01 green, rewritten round 4
    for n in E._R05_WINDOW:
        assert n in C.QUERIES, n
        if n not in reverify5:
            assert n not in verified, f"{n} already green — drop from _R05_WINDOW"
        assert n not in terminal, n
    assert len(set(E._R05_WINDOW)) == len(E._R05_WINDOW) == 52


def test_r05_reverify_entry_queued_despite_old_green():
    """embedding_neardup_pairs carries an r01 green recorded against the
    pre-GEMM refine: it must lead the r05 queue DESPITE being verified
    (today no round >= 5 green exists, so it may not sort into `seen`)."""
    names = E._ordered_names()
    assert "embedding_neardup_pairs" in names[:60]
    seen, _terminal = E._driver_history()
    assert "embedding_neardup_pairs" in seen  # r01 evidence exists
    assert "embedding_neardup_pairs" not in E._driver_history.seen_r5plus
