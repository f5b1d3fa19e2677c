"""Invariant + plan audits for the web-corpus analytics operators
(osmgraft/contract_web.py). Cross-engine value parity is covered by
tests/test_contract_oracle.py; these pin semantic invariants and the
at-scale plan shapes."""

from __future__ import annotations

from osmgraft import contract_web as cw
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_funnel_is_monotone(spark):
    rows = {r["stage"]: r for r in cw.funnel_conversion(spark, SF_CORRECT).collect()}
    assert set(rows) == {
        "all_users", "signup", "click_after_signup", "purchase_after_click"
    }
    total = rows["all_users"]["users"]
    s, c, p = (
        rows["signup"]["users"],
        rows["click_after_signup"]["users"],
        rows["purchase_after_click"]["users"],
    )
    assert total >= s >= c >= p >= 0
    assert all(0.0 <= r["pct"] <= 1.0 for r in rows.values())


def test_pagerank_is_a_distribution(spark):
    df = cw.pagerank_cosupply(spark, SF_SMOKE).collect()
    assert len(df) > 1
    assert all(r["rank"] > 0 for r in df)
    # teleport + conservation: ranks sum to ~1 (snapped at 10 dp/iteration)
    assert abs(sum(r["rank"] for r in df) - 1.0) < 1e-3


def test_crawl_latest_keeps_the_newest_snapshot(spark):
    rows = cw.crawl_latest_snapshot(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_snapshots"] <= 4
        assert r["n_replaced"] == r["n_snapshots"] - 1
        # url embeds its url_key; the kept doc must belong to that key group
        url_key = int(r["url"].rsplit("/", 1)[1])
        assert r["kept_doc_id"] // 4 == url_key


def test_url_rollup_partitions_the_corpus(spark):
    rows = cw.url_host_rollup(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == 7  # doc_id % 7 hosts, case-folded together
    assert sum(r["n_pages"] for r in rows) == docs
    assert all(r["n_urls"] <= r["n_pages"] for r in rows)
    assert all(r["host"] == r["host"].lower() for r in rows)


def test_session_paths_topk_is_distributed(spark):
    df = cw.session_paths(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort for the top-k


def test_outlink_graph_degree_accounting(spark):
    import pyspark.sql.functions as F

    rows = cw.outlink_host_graph(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_docs = docs.count()
    # every doc emits 1 + (doc_id % 3) links; total edge weight must match
    expected_links = (
        docs.select(F.sum(1 + F.col("doc_id") % 3)).collect()[0][0]
    )
    assert sum(r["n_links"] for r in rows) == expected_links
    assert all(r["n_docs"] <= r["n_links"] for r in rows)
    # the third anchor targets the page's own host -> self loops exist
    assert any(r["is_self"] == 1 and r["src_host"] == r["dst_host"] for r in rows)
    assert n_docs > 0


def test_snapshot_diff_partitions_the_url_universe(spark):
    rows = {r["status"]: r for r in cw.snapshot_diff(spark, SF_SMOKE).collect()}
    # all four CDC statuses fire on the fixture
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    url_keys = (docs + 3) // 4
    in_a = sum(1 for k in range(url_keys) if k % 5 != 0)
    in_b = sum(1 for k in range(url_keys) if k % 7 != 0)
    union = sum(1 for k in range(url_keys) if k % 5 != 0 or k % 7 != 0)
    total = sum(r["n_urls"] for r in rows.values())
    assert total == union
    assert rows["removed"]["n_urls"] == in_a - (in_a + in_b - union)
    assert rows["added"]["n_urls"] == in_b - (in_a + in_b - union)


def test_triangle_count_matches_bruteforce(spark):
    import itertools

    row = cw.triangle_count(spark, SF_SMOKE).collect()[0]
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id")
    edges = set()
    for (i,) in docs.collect():
        u = i % cw._TRI_N
        v = ((i // cw._TRI_N) * 2311 + i * 7919 + 13) % cw._TRI_N
        if u != v:
            edges.add((min(u, v), max(u, v)))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if c > b  # each triangle once: a < b < c by canonical edge order
    )
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(adj)
    assert row["max_degree"] == max(len(s) for s in adj.values())
    assert row["n_triangles"] == tri
    assert tri > 0  # the fixture graph must actually contain triangles


def test_triangle_count_plans_no_cartesian(spark):
    plan = (
        cw.triangle_count(spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # the two scalar summary frames are 1-row crossJoins (BNLJ on 1 row is
    # fine); the wedge and closing joins must be hash equi-joins
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_url_normalisation_is_idempotent(spark):
    # normalising an already-normal url must be a fixed point: the rollup's
    # n_urls (distinct normalised) for a host never exceeds its page count,
    # and every reported host is already lower-case with no port/fragment
    rows = cw.url_host_rollup(spark, SF_SMOKE).collect()
    for r in rows:
        assert ":" not in r["host"] and "#" not in r["host"]
        assert r["host"] == r["host"].lower()
        assert 0 < r["n_urls"] <= r["n_pages"]


def test_click_attribution_accounts_for_every_purchase(spark):
    import pyspark.sql.functions as F

    rows = cw.click_attribution(spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_purchases = ev.where(F.col("event_type") == "purchase").count()
    assert sum(r["n_purchases"] for r in rows) == n_purchases
    bands = {r["lag_band"] for r in rows}
    assert bands <= {"<1h", "1-6h", "6-24h", "unattributed"}
    for r in rows:
        if r["lag_band"] == "unattributed":
            assert r["avg_lag_s"] is None
        else:
            assert 0 <= r["avg_lag_s"] <= 24 * 3600


def test_gap_fill_accounting(spark):
    import pyspark.sql.functions as F

    rows = cw.gap_fill_daily(spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert len(rows) == n_users
    assert any(r["n_filled"] > 0 for r in rows)  # fixture has real gaps
    for r in rows:
        assert r["n_days"] == r["n_observed"] + r["n_filled"]
        assert r["n_observed"] >= 1
        # with >=1 observed day and forward fill from day 0, the
        # position-weighted checksum is always defined
        assert r["fill_checksum"] is not None


def test_cohort_retention_matrix_invariants(spark):
    rows = cw.cohort_retention(spark, SF_SMOKE).collect()
    assert rows
    by_cohort: dict = {}
    for r in rows:
        assert 0 < r["n_active"] <= r["cohort_size"]
        assert 0.0 < r["retention_pct"] <= 1.0
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r
    for cells in by_cohort.values():
        # week 0 always contains the cohort's own first events
        assert cells[0]["n_active"] == cells[0]["cohort_size"]
        assert cells[0]["retention_pct"] == 1.0


def test_cms_never_underestimates_and_merges(spark):
    import pyspark.sql.functions as F

    # top-k surface: overestimate >= 0 by construction
    for r in cw.cms_heavy_hitters(spark, SF_SMOKE).collect():
        assert r["overestimate"] >= 0
        assert r["est_count"] >= r["exact_count"] >= 1
    # mergeability: sketch(first half) + sketch(second half) == sketch(all)
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id"
    )
    uid = F.col("user_id")

    def sketch(df):
        pairs = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("r"),
                            (((uid * a + b) % cw._CMS_P) % cw._CMS_W).alias("bkt"),
                        )
                        for i, (a, b) in enumerate(cw._CMS_HASHES)
                    ]
                )
            ).alias("s")
        ).select("s.r", "s.bkt")
        return {
            (r["r"], r["bkt"]): r["c"]
            for r in pairs.groupBy("r", "bkt").agg(F.count("*").alias("c")).collect()
        }

    lo = sketch(e.where(F.col("event_id") % 2 == 0))
    hi = sketch(e.where(F.col("event_id") % 2 == 1))
    full = sketch(e)
    merged: dict = {}
    for part in (lo, hi):
        for k, v in part.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == full


def test_daily_anomalies_flags_real_outliers(spark):
    rows = cw.daily_anomalies(spark, SF_CORRECT).collect()
    assert rows  # the fixture has genuine volume outliers
    for r in rows:
        assert abs(r["z"]) >= cw._ANOM_Z
        assert r["sd_n"] > 0
        # z sign must agree with which side of the mean the day sits on
        assert (r["n"] > r["mean_n"]) == (r["z"] > 0)


def test_funnel_plans_one_user_exchange(spark):
    # three chained MIN windows over the same partitioning must share ONE
    # hashpartitioning Exchange on user_id (the docstring's claim)
    plan = (
        cw.funnel_conversion(spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_crawl_latest_plans_no_window_sort(spark):
    # keep-latest must be a max_by partial agg, never a per-url window sort
    plan = (
        cw.crawl_latest_snapshot(spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_cms_estimate_joins_are_broadcast(spark):
    # the 192-row counter table must broadcast into all 3 estimate joins
    plan = (
        cw.cms_heavy_hitters(spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_rolling_totals_window_semantics(spark):
    rows = cw.rolling_daily_totals(spark, SF_SMOKE).collect()
    assert rows
    by_day = {r["day"]: r for r in rows}
    days = sorted(by_day)
    for i, day in enumerate(days):
        r = by_day[day]
        # RANGE frame: exactly the calendar days within [day-6, day]
        in_window = [d for d in days if 0 <= (day - d).days <= 6]
        assert r["days_in_window"] == len(in_window)
        assert r["n_7d"] == sum(by_day[d]["n"] for d in in_window)
        if i >= 7:
            assert r["days_in_window"] <= 7


def test_pagerank_edges_join_is_equi(spark):
    # the per-order pair expansion must plan as an equi-join, never a
    # cartesian/broadcast-nested-loop (table-quadratic at scale)
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    os_ = li.distinct()
    import pyspark.sql.functions as F

    pairs = (
        os_.alias("a")
        .join(os_.alias("b"), "l_orderkey")
        .where(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_user_growth_accounting(spark):
    """First-touch accounting: new users sum to the distinct-user total,
    the cumulative series is monotone and ends at that total, and daily
    active is bounded by the users seen so far."""
    rows = cw.user_growth_daily(spark, SF_CORRECT).collect()
    assert rows == sorted(rows, key=lambda r: r["day"])
    total = (
        spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert sum(r["new_users"] for r in rows) == total
    assert rows[-1]["cum_users"] == total
    prev = 0
    for r in rows:
        assert r["cum_users"] == prev + r["new_users"]
        assert 0 < r["active_users"] <= r["cum_users"]
        assert r["new_users"] <= r["active_users"]
        prev = r["cum_users"]


def test_blocklist_label_boundary_semantics(spark):
    """Blocking must follow the injection schedule exactly: a page is
    blocked iff its registrable domain is listed (doc_id % 7 ∈ {2, 5})
    or its full sub-host is the listed sub rule (even doc_id with
    doc_id % 3 == 1 and doc_id % 7 == 3). Nothing else may match — the
    suffix expansion only matches at label boundaries."""
    rows = {r["rule"]: r for r in cw.blocklist_filter_stats(spark, SF_CORRECT).collect()}
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id").collect()
    ]
    exp = {"ALLOWED": 0, "example-2.co.uk": 0, "example-5.co.uk": 0,
           "sub1.example-3.co.uk": 0}
    for i in ids:
        if i % 7 in (2, 5):
            exp[f"example-{i % 7}.co.uk"] += 1
        elif i % 2 == 0 and i % 3 == 1 and i % 7 == 3:
            exp["sub1.example-3.co.uk"] += 1
        else:
            exp["ALLOWED"] += 1
    assert set(rows) == {k for k, v in exp.items() if v > 0}
    for rule, n in exp.items():
        if n:
            assert rows[rule]["n_pages"] == n, rule
    assert abs(sum(r["pct"] for r in rows.values()) - 1.0) < 1e-4


def test_hist_quantile_sketch_error_bound_and_mergeability(spark):
    """The histogram estimate must land within one bin width of the exact
    order statistic (≤ 2 widths of the interpolated continuous quantile),
    and bin counters built from disjoint halves of the input must SUM to
    the full sketch (the mergeable-summary property)."""
    import math

    from pyspark.sql import functions as F

    rows = {r["event_type"]: r for r in cw.hist_quantile_sketch(spark, SF_CORRECT).collect()}
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
    vals: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for et, vs in vals.items():
        vs.sort()
        width = (vs[-1] - vs[0]) / cw._HQ_B
        for name, qf in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            exact = vs[math.ceil(qf * len(vs)) - 1]
            assert abs(rows[et][f"{name}_est"] - exact) <= width + 1e-9, (et, name)

    # mergeability: per-(group, bin) counters from even/odd event_id halves
    # sum to the full histogram
    def hist(df):
        rng = df.groupBy("event_type").agg(
            F.min("value").alias("lo"), F.max("value").alias("hi")
        )
        # bins must come from the GLOBAL range (merge contract: shared edges)
        full_rng = ev.groupBy("event_type").agg(
            F.min("value").alias("lo"), F.max("value").alias("hi")
        )
        del rng
        b = df.join(F.broadcast(full_rng), "event_type").select(
            "event_type",
            F.least(
                F.floor(
                    (F.col("value") - F.col("lo")) * float(cw._HQ_B)
                    / (F.col("hi") - F.col("lo"))
                ).cast("int"),
                F.lit(cw._HQ_B - 1),
            ).alias("bin"),
        )
        return {
            (r["event_type"], r["bin"]): r["c"]
            for r in b.groupBy("event_type", "bin").agg(F.count("*").alias("c")).collect()
        }

    full = hist(ev)
    even = hist(ev.where(F.col("event_id") % 2 == 0))
    odd = hist(ev.where(F.col("event_id") % 2 == 1))
    merged: dict = {}
    for part in (even, odd):
        for k, v in part.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == full


def _fixture_host(i: int) -> str:
    sub = f"sub{i % 3}." if i % 2 == 0 else ""
    return f"{sub}example-{i % 7}.co.uk"


def test_crawl_schedule_politeness_invariants(spark):
    """Per-host serialization must hold: total fetches == total pages,
    and the final makespan equals max over hosts of n_pages·delay (the
    last fetch's end time); makespan is monotone across slots."""
    rows = cw.crawl_schedule_timeline(spark, SF_CORRECT).collect()
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id").collect()
    ]
    per_host: dict[str, int] = {}
    for i in ids:
        per_host[_fixture_host(i)] = per_host.get(_fixture_host(i), 0) + 1
    assert sum(r["n_fetches"] for r in rows) == len(ids)
    exp_makespan = max(
        n * (1 + len(h) % 3) for h, n in per_host.items()
    )
    assert rows[-1]["makespan_s"] == exp_makespan
    spans = [r["makespan_s"] for r in rows]
    assert spans == sorted(spans)
    assert all(r["n_hosts_active"] <= len(per_host) for r in rows)


def test_frontier_bfs_matches_python_bfs(spark):
    """Recompute the 3-round min-depth BFS in plain Python over the same
    deterministic outlink rule and compare the full depth histogram."""
    rows = {r["depth"]: r for r in cw.frontier_bfs_depths(spark, SF_CORRECT).collect()}
    ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id").collect()
    )
    nn = len(ids)
    out = {i: [(i * 2 + 1) % nn, (i * 3 + 2) % nn] for i in ids}
    depth = {i: 0 for i in ids if i % cw._BFS_SEED_MOD == 0}
    frontier = set(depth)
    for d in (1, 2, 3):
        nxt = {v for u in frontier for v in out[u]} - set(depth)
        for v in nxt:
            depth[v] = d
        frontier = nxt
    exp: dict[int, int] = {}
    for i in ids:
        exp[depth.get(i, -1)] = exp.get(depth.get(i, -1), 0) + 1
    assert {d: r["n_docs"] for d, r in rows.items()} == exp
    assert sum(r["n_docs"] for r in rows.values()) == nn


def test_html_text_extract_reference_python(spark):
    """Recompute the extraction in plain Python (re module) for a doc
    sample and compare md5/char counts — pins tag stripping, entity
    decoding, and whitespace collapse byte-for-byte."""
    import hashlib
    import re

    out = {r["doc_id"]: r for r in cw.html_text_extract(spark, SF_CORRECT).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .where("doc_id < 30").collect()
    }
    for i, text in docs.items():
        ent = " &amp; 5 &lt;five&gt; &quot;q&#39;" if i % 5 == 0 else ""
        html = (
            f"<html><head><title>t{i}</title><script>var x={i % 7};"
            f"</script></head><body><h1>{text[:40]}</h1>"
            f"<script>nav()</script><p>{text}{ent}</p><!-- c{i % 3} -->"
            f'<div style="x">footer nav</div></body></html>'
        )
        s = re.sub(r"(?s)<head.*?</head>", " ", html)
        s = re.sub(r"(?s)<script.*?</script>", " ", s)
        s = re.sub(r"(?s)<!--.*?-->", " ", s)
        n_tags = len(re.findall(r"<[^>]*>", s))
        s = re.sub(r"<[^>]*>", " ", s)
        for e, c in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&#39;", "'"), ("&amp;", "&")):
            s = s.replace(e, c)
        txt = re.sub(r"\s+", " ", s).strip()
        r = out[i]
        assert r["text_md5"] == hashlib.md5(txt.encode()).hexdigest(), i
        assert r["n_chars"] == len(txt)
        assert r["n_tags_stripped"] == n_tags
        assert 0 < r["content_ratio"] < 1


def test_robots_rep_winning_rule_semantics(spark):
    """Recompute REP longest-match/allow-tiebreak verdicts in plain
    Python per page and compare the (host, verdict) histogram exactly."""
    rows = {
        (r["host_mod"], r["verdict"]): r["n_pages"]
        for r in cw.robots_allow_audit(spark, SF_CORRECT).collect()
    }
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id").collect()
    ]
    exp: dict[tuple[int, str], int] = {}
    for i in ids:
        host = i % 7
        path = ("/private/" if i % 11 == 0 else "/p/") + str(i % 40)
        best = None
        for h, rp, allow in cw._ROBOTS_RULES:
            if h == host and path.startswith(rp):
                key = (len(rp), allow)
                if best is None or key > (len(best[0]), best[1]):
                    best = (rp, allow)
        if best is None:
            v = "ALLOW (no rule)"
        elif best[1] == 1:
            v = f"ALLOW {best[0]}"
        else:
            v = f"DISALLOW {best[0]}"
        exp[(host, v)] = exp.get((host, v), 0) + 1
    assert rows == exp
    # the tiebreak case must actually occur in the fixture: host 2 pages
    # under /p/22 hit both the allow /p/2 and disallow /p/22 rules
    assert any("DISALLOW /p/22" in v for _, v in rows)


def test_ewma_matches_python_recursion(spark):
    """Recompute the EWMA recursion in plain Python from the rounded
    daily sums; every smoothed value must also stay inside the series'
    running min/max envelope."""
    rows = cw.ewma_daily_values(spark, SF_CORRECT).collect()
    series: dict[str, list] = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(r)
    for et, rs in series.items():
        rs.sort(key=lambda r: r["day"])
        ew = rs[0]["daily_sum"]
        assert abs(rs[0]["ewma"] - round(ew, 6)) < 1e-9
        lo = hi = rs[0]["daily_sum"]
        for r in rs[1:]:
            ew = 0.3 * r["daily_sum"] + 0.7 * ew
            lo, hi = min(lo, r["daily_sum"]), max(hi, r["daily_sum"])
            assert abs(r["ewma"] - round(ew, 6)) < 1e-6, (et, r["day"])
            assert lo - 1e-6 <= r["ewma"] <= hi + 1e-6


def test_bot_regularity_power_sum_variance(spark):
    """Recompute per-user gap cv in plain Python (exact integer power
    sums) for the reported users and check values; the LAG+agg must share
    one user-keyed exchange (plan audit)."""
    rows = cw.bot_regularity_profile(spark, SF_CORRECT).collect()
    assert rows and len(rows) <= cw._BOT_TOP
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet").select(
        "user_id", "ts", "event_id").collect()
    per_user: dict[int, list] = {}
    for r in ev:
        per_user.setdefault(r["user_id"], []).append(
            (int(r["ts"].timestamp()), r["event_id"])
        )
    import math

    for r in rows:
        secs = sorted(per_user[r["user_id"]])
        gaps = [b[0] - a[0] for a, b in zip(secs, secs[1:])]
        assert len(gaps) == r["n_gaps"] >= cw._BOT_MIN_EVENTS
        n, sg, sg2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
        mean = sg / n
        var = (sg2 - sg * mean) / n
        assert abs(r["mean_gap_s"] - round(mean, 4)) < 1e-9
        assert abs(r["gap_cv"] - round(math.sqrt(max(var, 0.0)) / mean, 6)) < 1e-9
    cvs = [r["gap_cv"] for r in rows]
    assert cvs == sorted(cvs)
    plan = cw.bot_regularity_profile(spark, SF_CORRECT)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(user_id") <= 1
    assert "TakeOrderedAndProject" in plan


def test_redirect_doubling_matches_python_walk(spark):
    """Walk the functional redirect graph hop-by-hop in Python (the
    oracle's algorithm) and compare the doubling implementation's
    histogram; chains past 2^rounds hops and cycles must report -1."""
    rows = {r["hops"]: r["n_urls"] for r in cw.redirect_resolution(spark, SF_CORRECT).collect()}
    ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id").collect()
    )
    nn = len(ids)
    is_rd = lambda i: i % cw._RD_MOD == 0  # noqa: E731
    nxt = lambda i: (i * 7 + i // 5) % nn  # noqa: E731
    exp: dict[int, int] = {}
    cap = 1 << cw._RD_ROUNDS
    for i in ids:
        if not is_rd(i):
            continue
        cur, hops = nxt(i), 1
        while is_rd(cur) and hops < cap:
            cur, hops = nxt(cur), hops + 1
        h = hops if not is_rd(cur) else -1
        exp[h] = exp.get(h, 0) + 1
    assert rows == exp
    assert sum(rows.values()) == sum(1 for i in ids if is_rd(i))


def test_ks_drift_matches_python_ks(spark):
    """Recompute the two-sample KS statistic in plain Python per event
    type (pooled-sort CDF walk) and compare; D must sit in [0, 1]."""
    rows = {r["event_type"]: r for r in cw.ks_value_drift(spark, SF_CORRECT).collect()}
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet").select(
        "event_type", "value", "event_id", "ts").collect()
    samples: dict[str, list] = {}
    for r in ev:
        samples.setdefault(r["event_type"], []).append(
            (r["value"], r["event_id"], 1 if r["ts"].day < cw._KS_SPLIT_DAY else 0)
        )
    for et, pts in samples.items():
        pts.sort(key=lambda p: (p[0], p[1]))
        n_a = sum(p[2] for p in pts)
        n_b = len(pts) - n_a
        ca = cb = 0
        d = 0.0
        for _, _, in_a in pts:
            ca += in_a
            cb += 1 - in_a
            d = max(d, abs(ca / n_a - cb / n_b))
        r = rows[et]
        assert (r["n_a"], r["n_b"]) == (n_a, n_b)
        assert abs(r["ks_d"] - round(d, 6)) < 1e-9
        assert 0.0 <= r["ks_d"] <= 1.0


def test_correlation_matrix_bounds_and_python(spark):
    """Pearson r ∈ [-1, 1] for every pair; recompute one pair in plain
    Python from the rounded daily sums and match to 5 dp; the matrix
    covers all C(types, 2) pairs."""
    rows = cw.metric_correlation_matrix(spark, SF_CORRECT).collect()
    types = set()
    for r in rows:
        assert -1.0 <= r["pearson_r"] <= 1.0
        types.update((r["type_a"], r["type_b"]))
    k = len(types)
    assert len(rows) == k * (k - 1) // 2
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet").collect()
    daily: dict[tuple, float] = {}
    for e in ev:
        key = (e["ts"].date(), e["event_type"])
        daily[key] = daily.get(key, 0.0) + e["value"]
    daily = {k2: round(v, 6) for k2, v in daily.items()}
    ta, tb = rows[0]["type_a"], rows[0]["type_b"]
    xs, ys = [], []
    for (day, et), v in daily.items():
        if et == ta and (day, tb) in daily:
            xs.append(v)
            ys.append(daily[(day, tb)])
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    r_ref = (n * sxy - sx * sy) / (
        ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    )
    assert rows[0]["n_days"] == n
    assert abs(rows[0]["pearson_r"] - round(r_ref, 5)) < 2e-5


def test_adamic_adar_matches_bruteforce(spark):
    """Top-k Adamic-Adar candidates equal a plain-Python recompute over
    the same derived graph (exact micro-unit scores), and the plan uses
    equi-joins + TakeOrderedAndProject (no cartesian, no global sort)."""
    import math

    from osmgraft.contract_web import _AA_N, _AA_TOPK, adamic_adar_linkpred
    from tests.conftest import SF_CORRECT

    df = adamic_adar_linkpred(spark, SF_CORRECT)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) == _AA_TOPK

    docs = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    edges = set()
    for d in docs:
        u = d % _AA_N
        v = ((d // _AA_N) * 2311 + d * 7919 + 13) % _AA_N
        if u != v:
            edges.add((min(u, v), max(u, v)))
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    scores: dict[tuple[int, int], tuple[int, int]] = {}
    for m, ns in nbrs.items():
        term = int(round(1.0e6 / math.log(len(ns))))
        sns = sorted(ns)
        for i, p in enumerate(sns):
            for q2 in sns[i + 1:]:
                if (p, q2) in edges:
                    continue
                c, s = scores.get((p, q2), (0, 0))
                scores[(p, q2)] = (c + 1, s + term)
    ref = sorted(
        ((s, p, q2, c) for (p, q2), (c, s) in scores.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:_AA_TOPK]
    got = [(r["u"], r["v"], r["n_common"]) for r in rows]
    exp = [(p, q2, c) for s, p, q2, c in ref]
    assert got == exp
    for r, (s, _, _, _) in zip(rows, ref):
        assert abs(r["aa_score"] - round(s * 1e-6, 6)) < 1e-9


def test_mann_whitney_matches_scipy_style_reference(spark):
    """U and z equal a plain-Python tie-corrected rank-sum recompute on
    the same quantized bins; the rank window runs over the post-agg bin
    relation (bins ≤ _MW_BINS), not the raw table."""
    from osmgraft.contract_web import _MW_BINS, mann_whitney_drift
    from tests.conftest import SF_CORRECT

    row = mann_whitney_drift(spark, SF_CORRECT).collect()[0]
    assert row["n_bins"] <= _MW_BINS

    import datetime
    import math

    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet").collect()
    cut = datetime.date(2024, 1, 15)
    bins: dict[int, list[int]] = {}
    for e in ev:
        v = int(math.floor(e["value"] * 100.0)) % _MW_BINS
        a = 1 if e["ts"].date() <= cut else 0
        na, nb = bins.get(v, (0, 0))
        bins[v] = (na + a, nb + (1 - a))
    prior, r_a, ties, n_a, n_b = 0, 0.0, 0.0, 0, 0
    for v in sorted(bins):
        na, nb = bins[v]
        tcnt = na + nb
        r_a += na * (prior + (tcnt + 1) * 0.5)
        ties += float(tcnt) ** 3 - tcnt
        prior += tcnt
        n_a += na
        n_b += nb
    u = r_a - n_a * (n_a + 1) * 0.5
    mu = n_a * n_b * 0.5
    n = n_a + n_b
    sigma = math.sqrt(
        n_a * n_b / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    )
    assert row["n_a"] == n_a and row["n_b"] == n_b
    assert abs(row["u_stat"] - round(u, 1)) < 1e-9
    assert abs(row["z_score"] - round((u - mu) / sigma, 6)) < 2e-6


def test_assortativity_matches_networkx_style_reference(spark):
    """r equals a plain-Python Pearson-over-edge-slots recompute and
    lies in [-1, 1]."""
    from osmgraft.contract_web import _AA_N, degree_assortativity
    from tests.conftest import SF_CORRECT

    row = degree_assortativity(spark, SF_CORRECT).collect()[0]
    docs = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    edges = set()
    for d in docs:
        u = d % _AA_N
        v = ((d // _AA_N) * 2311 + d * 7919 + 13) % _AA_N
        if u != v:
            edges.add((min(u, v), max(u, v)))
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = []
    for a, b in edges:
        xs.append((deg[a], deg[b]))
        xs.append((deg[b], deg[a]))
    m2 = len(xs)
    sx = sum(x for x, _ in xs)
    sxy = sum(x * y for x, y in xs)
    sxx = sum(x * x for x, _ in xs)
    r_ref = (m2 * sxy - sx * sx) / (m2 * sxx - sx * sx)
    assert row["n_nodes"] == len(deg)
    assert row["n_edges"] == len(edges)
    assert -1.0 - 1e-9 <= row["assortativity"] <= 1.0 + 1e-9
    assert abs(row["assortativity"] - round(r_ref, 6)) < 1e-9


def test_bellman_ford_matches_python_dijkstra_within_budget(spark):
    """Round-bounded distances equal a plain-Python Bellman-Ford with
    the same 6-round budget; and for nodes whose true shortest path has
    <= 6 edges, they equal full Dijkstra."""
    import heapq

    from osmgraft.contract_web import (
        _BF_N,
        _BF_ROUNDS,
        _BF_SRC,
        bellman_ford_distances,
    )
    from tests.conftest import SF_CORRECT

    rows = {
        r["node"]: r[f"dist_{_BF_ROUNDS}"]
        for r in bellman_ford_distances(spark, SF_CORRECT).collect()
    }
    docs = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    w: dict[tuple[int, int], int] = {}
    for d in docs:
        u = d % _BF_N
        v = ((d // _BF_N) * 331 + d * 211 + 5) % _BF_N
        if u == v:
            continue
        wt = 1 + d % 9
        w[(u, v)] = min(w.get((u, v), 99), wt)
    adj: dict[int, list[tuple[int, int]]] = {}
    for (u, v), wt in w.items():
        adj.setdefault(u, []).append((v, wt))
        adj.setdefault(v, []).append((u, wt))
    # 6-round Bellman-Ford reference
    dist = {_BF_SRC: 0}
    for _ in range(_BF_ROUNDS):
        nxt = dict(dist)
        for u, du in dist.items():
            for v, wt in adj.get(u, []):
                if du + wt < nxt.get(v, 1 << 60):
                    nxt[v] = du + wt
        dist = nxt
    assert rows == dist
    # Dijkstra with hop tracking: nodes reachable in <= ROUNDS edges on
    # their shortest path must already be exact
    pq = [(0, 0, _BF_SRC)]
    best: dict[int, tuple[int, int]] = {}
    while pq:
        d2, hops, u = heapq.heappop(pq)
        if u in best:
            continue
        best[u] = (d2, hops)
        for v, wt in adj.get(u, []):
            if v not in best:
                heapq.heappush(pq, (d2 + wt, hops + 1, v))
    for u, (d2, hops) in best.items():
        if hops <= _BF_ROUNDS:
            assert rows.get(u) == d2
