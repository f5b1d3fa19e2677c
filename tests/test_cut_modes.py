"""Materialization-cut knob (round-4 verdict, What's wrong #3).

The reused-relation cuts must produce identical results under every
OSMGRAFT_CUT_MODE: ``local`` (sandbox default, localCheckpoint),
``reliable`` (DFS checkpoint — survives executor loss on a cluster),
``persist`` (spillable cache, lineage kept), ``none`` (pure lineage).
The knob is read per cut() call, so flipping the env var mid-session
is enough — no session restart.

Exercised through two real cut consumers: dup_span_stats (gram stream
materialized once for its agg + join-back consumers) and
dedup_clusters (iterative min-contraction CC — the lineage-bounding
case ``none`` makes slow but must keep correct).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, ".")

from osmgraft import contract as C  # noqa: E402
from osmgraft import contract_corpus  # noqa: E402,F401
from osmgraft import contract_text  # noqa: E402,F401
from osmgraft.runtime.cut import cut_mode  # noqa: E402

SF = "/root/testdata/sf0.001"
# dup_span_stats: gram stream cut (agg + join-back consumers);
# dedup_clusters: iterative min-contraction CC (lineage-bounding cuts);
# pip_tile_counts: geo/pip cell-map spine cut (broadcast-join consumer)
QUERIES = ("dup_span_stats", "dedup_clusters", "pip_tile_counts")


def _rows(spark, name):
    return sorted(map(tuple, C.QUERIES[name](spark, SF).collect()))


@pytest.fixture()
def cut_env(monkeypatch):
    def set_mode(mode):
        monkeypatch.setenv("OSMGRAFT_CUT_MODE", mode)
        assert cut_mode() == mode

    return set_mode


@pytest.mark.parametrize("mode", ["reliable", "persist", "none"])
@pytest.mark.parametrize("name", QUERIES)
def test_cut_modes_agree_with_local(spark, cut_env, mode, name):
    cut_env("local")
    baseline = _rows(spark, name)
    assert baseline  # non-trivial fixture
    cut_env(mode)
    assert _rows(spark, name) == baseline


def test_unknown_mode_falls_back_to_local(monkeypatch):
    monkeypatch.setenv("OSMGRAFT_CUT_MODE", "bogus")
    assert cut_mode() == "local"


def test_persist_mode_cuts_are_releasable(spark, cut_env):
    from osmgraft.runtime import cut as cutmod

    cut_env("persist")
    baseline = _rows(spark, "dup_span_stats")
    assert baseline
    n = cutmod.release_cuts()
    assert n >= 1  # the gram-stream cut was registered and released
    assert cutmod.release_cuts() == 0  # idempotent
    # results unchanged after release (persist keeps lineage)
    assert _rows(spark, "dup_span_stats") == baseline
    cutmod.release_cuts()
