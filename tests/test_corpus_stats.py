"""Invariant + plan audits for the corpus-statistics operators
(osmgraft/contract_corpus.py session-5 additions). Cross-engine value
parity is covered by tests/test_contract_oracle.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from osmgraft import contract_corpus as cc
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_unigram_logprob_bounds_and_accounting(spark):
    """Every doc's bits-per-token score lies between the corpus's
    most-frequent-word bits (lower bound) and rarest-word bits (upper
    bound); band doc counts account for every document."""
    rows = cc.unigram_logprob(spark, SF_CORRECT).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # recompute the model bounds directly
    toks = docs.select(F.explode(F.split("text", " ")).alias("w"))
    wc = toks.groupBy("w").count().collect()
    total = sum(r["count"] for r in wc)
    bits = [-math.log2(r["count"] / total) for r in wc]
    lo, hi = min(bits) - 1e-6, max(bits) + 1e-6
    for r in rows:
        assert lo <= r["min_bits"] <= r["avg_bits"] <= r["max_bits"] <= hi
        assert r["bits_band"] == math.floor(r["min_bits"] + 1e-9) or (
            # min_bits is rounded to 4dp for display; band uses 6dp score
            abs(r["min_bits"] - round(r["min_bits"])) < 1e-3
        )
        assert r["n_docs"] > 0


def test_unigram_model_is_broadcast(spark):
    """The scoring join must broadcast the vocabulary model — the corpus
    side (10^12 tokens at scale) never shuffles for the join."""
    df = cc.unigram_logprob(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_zipf_fit_shape(spark):
    """On the word-soup fixture the rank-frequency fit must be a
    well-formed OLS result: negative slope, r2 in [0, 1], vocab matches
    the distinct word count."""
    row = cc.zipf_vocab_fit(spark, SF_CORRECT).collect()
    assert len(row) == 1
    r = row[0]
    vocab = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .count()
    )
    assert r["n_vocab"] == vocab
    assert r["zipf_slope"] < 0
    assert 0.0 <= r["r2"] <= 1.0
    # intercept is ln(freq) at rank 1 — must be at least the slope line's
    # value at the largest rank (frequencies are positive)
    assert r["intercept"] > 0


def test_pii_scrub_finds_exactly_the_injected_pii(spark):
    """The scrubber must find exactly the PII the injection schedule
    placed: doc_id % 4 == 0 emails, % 5 == 0 phones, % 3 == 0 IPs —
    nothing more (no false positives on the clean fixture text)."""
    rows = cc.pii_scrub_stats(spark, SF_CORRECT).collect()
    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id", "lang").collect()
    )
    exp: dict[str, dict[str, int]] = {}
    for d in docs:
        e = exp.setdefault(
            d["lang"],
            {"n_docs": 0, "email": 0, "phone": 0, "ip": 0, "total": 0},
        )
        e["n_docs"] += 1
        e["email"] += d["doc_id"] % 4 == 0
        e["phone"] += d["doc_id"] % 5 == 0
        e["ip"] += d["doc_id"] % 3 == 0
        e["total"] += (d["doc_id"] % 4 == 0) + (d["doc_id"] % 5 == 0) + (
            d["doc_id"] % 3 == 0
        )
    for r in rows:
        e = exp[r["lang"]]
        assert r["n_docs"] == e["n_docs"]
        assert r["n_email_docs"] == e["email"]
        assert r["n_phone_docs"] == e["phone"]
        assert r["n_ip_docs"] == e["ip"]
        assert r["total_redactions"] == e["total"]
        assert r["avg_len_saved"] > 0  # placeholders are shorter than PII


def test_bloom_prune_join_has_no_false_negatives(spark):
    """The bloom-pruned + refined result must equal the plain exact join
    (Bloom filters never drop a true match), and every probe join in the
    plan must be a broadcast — the fact table never shuffles."""
    from osmgraft import contract as c

    df = c.bloom_prune_join(spark, SF_CORRECT)
    rows = {r["o_orderstatus"]: r for r in df.collect()}
    cust = spark.read.parquet(f"{SF_CORRECT}/customer.parquet").where(
        c._BLOOM_DIM_PRED
    ).select("c_custkey")
    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    exact = {
        r["o_orderstatus"]: r
        for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
        .collect()
    }
    for status, e in exact.items():
        r = rows[status]
        assert r["n_matched"] == e["n"]
        assert abs(r["matched_revenue"] - e["rev"]) < 1e-4
        assert r["n_false_pos"] >= 0
        assert r["n_bloom_pass"] == r["n_matched"] + r["n_false_pos"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4  # 3 bitmap probes + refine


def test_bloom_refine_survives_a_saturated_filter(spark, monkeypatch):
    """Shrink the filter to 64 bits so it saturates and MUST emit false
    positives — the exact-refine stage still reports precisely the true
    matches (the fp path is otherwise dormant at the sized m=4096)."""
    from osmgraft import contract as c

    monkeypatch.setattr(c, "_BLOOM_BITS", 64)
    rows = c.bloom_prune_join(spark, SF_CORRECT).collect()
    assert sum(r["n_false_pos"] for r in rows) > 0  # saturated ⇒ fps exist
    cust = spark.read.parquet(f"{SF_CORRECT}/customer.parquet").where(
        c._BLOOM_DIM_PRED
    ).select("c_custkey")
    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r["n_matched"] == exact[r["o_orderstatus"]]


def test_winnowing_matches_reference_python(spark):
    """Recompute winnowing in plain Python for a sample of documents —
    shingle hashes, window minima, distinct fingerprints — and check the
    engine's counts; also pin the duplicate-document guarantee: exact
    dup pairs share ALL fingerprints."""
    out = {r["doc_id"]: r for r in cc.winnowing_fingerprints(spark, SF_CORRECT).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .where(F.col("doc_id") < 40).collect()
    }

    def fps(text: str) -> set[int]:
        ws = text.split(" ")
        whs = []
        for w in ws:
            h = 0
            for ch in w:
                h = (h * 31 + ord(ch)) % cc._WIN_P
            whs.append(h)
        hs = []
        for i in range(len(ws) - cc._WIN_K + 1):
            h = 0
            for v in whs[i : i + cc._WIN_K]:
                h = (h * cc._WIN_B + v) % cc._WIN_P
            hs.append(h)
        return {
            min(hs[j : j + cc._WIN_W])
            for j in range(len(hs) - cc._WIN_W + 1)
        }

    by_fp: dict[int, set[int]] = {}
    for did, text in docs.items():
        if len(text.split(" ")) < cc._WIN_K + cc._WIN_W - 1:
            assert did not in out
            continue
        f = fps(text)
        assert out[did]["n_fps"] == len(f), did
        assert out[did]["n_shingles"] == len(text.split(" ")) - cc._WIN_K + 1
        for v in f:
            by_fp.setdefault(v, set()).add(did)
    # exact duplicate texts must share every fingerprint
    texts: dict[str, list[int]] = {}
    for did, text in docs.items():
        texts.setdefault(text, []).append(did)
    for dups in texts.values():
        if len(dups) > 1:
            a = dups[0]
            assert out[a]["n_shared_fps"] == out[a]["n_fps"]


def test_weighted_sample_matches_python_es(spark):
    """Recompute Efraimidis-Spirakis keys in plain Python and verify the
    engine selected exactly the true top-k; higher weight at equal u must
    produce a higher key (the A-Res property)."""
    rows = cc.weighted_sample_topk(spark, SF_CORRECT).collect()
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").select(
        "doc_id", "n_chars").collect()
    keyed = []
    for r in docs:
        if r["n_chars"] <= 0:
            continue
        u = (r["doc_id"] * cc._WS_HASH_A) % cc._WS_HASH_P / cc._WS_HASH_P
        keyed.append((round(u ** (1.0 / r["n_chars"]), 6), -r["doc_id"], r["doc_id"]))
    keyed.sort(reverse=True)
    exp = [(d, round(k, 6)) for k, _, d in keyed[: cc._WS_K]]
    got = [(r["doc_id"], r["sample_key"]) for r in rows]
    assert got == exp
    assert 0.9 ** (1 / 100.0) > 0.9 ** (1 / 50.0)  # key monotone in weight


def test_corpus_mix_plan_invariants(spark):
    """No source upsamples (k_sel ≤ n_docs), the binding source is taken
    ~whole (its keep_rate is the max), achieved shares sum to 1 and track
    the targets within the floor() slack."""
    rows = cc.corpus_mix_plan(spark, SF_CORRECT).collect()
    assert len(rows) == 20
    assert all(r["k_sel"] <= r["n_docs"] for r in rows)
    assert abs(sum(r["achieved_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["target_w"] for r in rows) - 1.0) < 1e-9
    total = sum(r["k_sel"] for r in rows)
    for r in rows:
        # floor() can cost at most one doc per source
        assert abs(r["achieved_share"] - r["target_w"]) <= 1.5 / total + 1e-6
    assert max(r["keep_rate"] for r in rows) > 0.99


def test_leakage_safe_split_group_integrity(spark):
    """No source may straddle splits (the leakage-safety property), the
    assignment must be deterministic across invocations, and every
    document is assigned exactly once."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    bucket = (
        (F.substring("source", 4, 10).cast("long") * cc._SPLIT_A + 12345)
        % cc._SPLIT_P
    ) % 10
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    per_source = (
        docs.select("source", split.alias("split"))
        .groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert all(r["k"] == 1 for r in per_source)
    rows1 = cc.leakage_safe_split(spark, SF_CORRECT).collect()
    rows2 = cc.leakage_safe_split(spark, SF_CORRECT).collect()
    assert rows1 == rows2
    assert sum(r["n_docs"] for r in rows1) == docs.count()
    splits = {r["split"] for r in rows1}
    assert splits == {"train", "val", "test"}


def test_containment_pairs_reference_and_identity(spark):
    """Containment ≥ Jaccard for every pair (min ≤ union identity), and a
    plain-Python recompute over the rare-blocked shingle sets agrees."""
    from osmgraft import contract_text as ct

    rows = ct.containment_pairs(spark, SF_CORRECT).collect()
    assert rows
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet").collect()
    }
    sets: dict[int, set[str]] = {}
    df_count: dict[str, int] = {}
    for did, text in docs.items():
        ws = text.split(" ")
        sh = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        sets[did] = sh
        for s in sh:
            df_count[s] = df_count.get(s, 0) + 1
    rare = {s for s, c in df_count.items() if c <= ct._RARE_MAX}
    blocked = {d: s & rare for d, s in sets.items()}
    for r in rows:
        a, b = blocked[r["doc_a"]], blocked[r["doc_b"]]
        ov = len(a & b)
        assert r["overlap"] == ov
        cont = ov / min(len(a), len(b))
        jac = ov / (len(a) + len(b) - ov)
        assert abs(r["containment"] - round(cont, 4)) < 1e-9
        assert abs(r["jaccard"] - round(jac, 4)) < 1e-9
        assert r["containment"] >= r["jaccard"]


def test_mirror_matrix_counts_cross_source_templates(spark):
    """Recompute the cross-source template-prefix pair matrix in Python."""
    from osmgraft import contract_text as ct

    rows = {
        (r["source_a"], r["source_b"]): r["n_dup_pairs"]
        for r in ct.mirror_source_matrix(spark, SF_CORRECT).collect()
    }
    assert rows
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").select(
        "doc_id", "source", "text").collect()
    by_dig: dict[str, list] = {}
    for r in docs:
        pref = " ".join(r["text"].strip().lower().split(" ")[: ct._MIRROR_PREFIX_WORDS])
        by_dig.setdefault(pref, []).append((r["doc_id"], r["source"]))
    exp: dict[tuple, int] = {}
    for members in by_dig.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (ia, sa), (ib, sb) = members[i], members[j]
                if sa != sb:
                    key = (min(sa, sb), max(sa, sb))
                    exp[key] = exp.get(key, 0) + 1
    assert rows == exp


def test_lang_confusion_diagonal_and_accounting(spark):
    """Matrix cells account for every document; n_agree is n_docs on the
    diagonal and 0 off it; the word-soup fixture must show meaningful
    diagonal mass for at least one language."""
    from osmgraft import contract_text as ct

    rows = ct.lang_confusion_matrix(spark, SF_CORRECT).collect()
    total = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == total
    for r in rows:
        if r["declared_lang"] == r["pred_lang"]:
            assert r["n_agree"] == r["n_docs"]
        else:
            assert r["n_agree"] == 0
    diag = sum(r["n_docs"] for r in rows if r["declared_lang"] == r["pred_lang"])
    assert diag > 0


def test_anchor_text_terms_come_from_linking_docs(spark):
    """Every reported anchor term must be one of the first 4 words of
    some linking document, each host reports at most top-3 with ranks
    1..k, and counts are non-increasing within a host."""
    from osmgraft import contract_web as cwq

    rows = cwq.anchor_text_index(spark, SF_CORRECT).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").select(
        "doc_id", "text").collect()
    lead_words = set()
    for r in docs:
        ws = r["text"].split(" ")
        if len(ws) >= 4:
            lead_words.update(ws[:4])
    per_host: dict[str, list] = {}
    for r in rows:
        assert r["term"] in lead_words
        per_host.setdefault(r["dst_host"], []).append(r)
    for host, rs in per_host.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        ns = [r["n"] for r in rs]
        assert ns == sorted(ns, reverse=True)
        assert len(rs) <= cwq._ANCHOR_TOP


def test_compaction_bins_bounded_and_lossless(spark):
    """Streaming bin-pack invariants: total size is preserved, every bin
    except possibly a partition's last is ≥ target OR ends a partition,
    and no bin exceeds target + max single file (the streaming bound)."""
    rows = cc.compaction_bin_plan(spark, SF_CORRECT).collect()
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
    assert sum(r["bin_size"] for r in rows) == ev.count()
    files = (
        ev.groupBy(
            (F.col("event_id") % 7).alias("part"),
            (F.col("event_id") % 173).alias("file_id"),
        )
        .count().collect()
    )
    max_file = max(r["count"] for r in files)
    per_part: dict[int, list] = {}
    for r in rows:
        per_part.setdefault(r["part"], []).append(r)
    for part, rs in per_part.items():
        rs.sort(key=lambda r: r["bin"])
        for r in rs[:-1]:
            # a non-final bin closed because cum size crossed the target
            assert r["bin_size"] + max_file > cc._COMPACT_TARGET
        for r in rs:
            assert r["bin_size"] <= cc._COMPACT_TARGET + max_file


def test_zonemap_clustered_prunes_scattered_does_not(spark):
    """Recompute both layouts' zone maps in Python; clustered pruning
    must dominate scattered by a wide margin (the sort-order argument)."""
    rows = {r["layout"]: r for r in cc.zonemap_prune_audit(spark, SF_CORRECT).collect()}
    docs = sorted(
        ((r["n_chars"], r["doc_id"])
         for r in spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
         .select("doc_id", "n_chars").collect())
    )
    n = len(docs)
    zones: dict[int, list] = {}
    for rnk, (nc, did) in enumerate(docs):
        f = int(rnk * cc._ZM_FILES / n)
        zones.setdefault(f, []).append(nc)
    pruned = sum(
        1 for v in zones.values()
        if max(v) < cc._ZM_LO or min(v) > cc._ZM_HI
    )
    assert rows["clustered"]["n_pruned"] == pruned
    assert rows["clustered"]["n_files"] == cc._ZM_FILES
    assert rows["clustered"]["pruned_pct"] >= rows["scattered"]["pruned_pct"] + 0.5


def test_quantile_normalization_rank_semantics(spark):
    """percent_rank/cume_dist must follow the rank-based definitions
    exactly (recomputed in Python per language, ties sharing values) and
    ties in n_chars must produce identical normalized values."""
    from osmgraft import contract_text as ct

    rows = ct.quantile_normalize_lengths(spark, SF_CORRECT).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        vals = sorted(r["n_chars"] for r in rs)
        n = len(vals)
        import bisect

        for r in rs:
            lo = bisect.bisect_left(vals, r["n_chars"])
            hi = bisect.bisect_right(vals, r["n_chars"])
            pct = lo / (n - 1) if n > 1 else 0.0
            cume = hi / n
            assert abs(r["len_pctrank"] - round(pct, 6)) < 1e-9, (lang, r)
            assert abs(r["len_cume"] - round(cume, 6)) < 1e-9
        seen: dict[int, tuple] = {}
        for r in rs:
            key = (r["len_pctrank"], r["len_cume"])
            assert seen.setdefault(r["n_chars"], key) == key  # ties identical


def test_editdist_pairs_python_reference(spark):
    """Recompute blocked levenshtein pairs in plain Python (full
    Wagner-Fischer) and compare exactly; every reported distance must be
    ≥ 1 (equal titles excluded) and ≤ the cap; the typo-injected twins
    must actually appear (distance 1 pairs exist)."""
    from osmgraft import contract_text as ct

    rows = [tuple(r) for r in ct.title_editdist_pairs(spark, SF_CORRECT).collect()]
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").select(
        "doc_id", "text").collect()

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    titles = {}
    for r in docs:
        t0 = " ".join(r["text"].lower().split(" ")[:6])
        titles[r["doc_id"]] = t0[:2] + t0[3:] if r["doc_id"] % 6 == 0 else t0
    ids = sorted(titles)
    exp = []
    for i, da in enumerate(ids):
        ta = titles[da]
        for db in ids[i + 1:]:
            tb = titles[db]
            if ta == tb or ta[:2] != tb[:2] or abs(len(ta) - len(tb)) > ct._ED_MAX:
                continue
            d = lev(ta, tb)
            if d <= ct._ED_MAX:
                exp.append((da, db, d))
    assert rows == sorted(exp)
    assert rows and all(1 <= r[2] <= ct._ED_MAX for r in rows)
    assert any(r[2] == 1 for r in rows)


def test_skyline_matches_bruteforce_dominance(spark):
    """Recompute the Pareto front from the DEFINITION (no j that is no
    worse on both axes and strictly better on one) by brute force over
    all parts — proves the bucketed two-phase prefix-max rewrite AND the
    window-form oracle both equal textbook dominance semantics."""
    import numpy as np

    from osmgraft.contract_corpus import skyline_pareto_front
    from tests.conftest import SF_CORRECT

    got = sorted(
        (r["p_partkey"], r["price_cents"], r["size"])
        for r in skyline_pareto_front(spark, SF_CORRECT).collect()
    )
    rows = (
        spark.read.parquet(f"{SF_CORRECT}/part.parquet")
        .selectExpr(
            "p_partkey",
            "CAST(FLOOR(p_retailprice * 100.0e0 + 5.0e-1) AS BIGINT) AS x",
            "CAST(p_size AS BIGINT) AS y",
        )
        .collect()
    )
    x = np.array([r["x"] for r in rows])
    y = np.array([r["y"] for r in rows])
    k = np.array([r["p_partkey"] for r in rows])
    want = []
    for i in range(len(rows)):
        dominated = (
            (x <= x[i]) & (y >= y[i]) & ((x < x[i]) | (y > y[i]))
        ).any()
        if not dominated:
            want.append((int(k[i]), int(x[i]), int(y[i])))
    assert got == sorted(want)


def test_symspell_pairs_complete_at_distance_one(spark):
    """Brute-force every title pair with an O(L) distance-1 check (equal
    lengths: exactly one substitution; off-by-one lengths: one
    insertion) — the deletion-neighborhood theorem says the blocked join
    must find EXACTLY these pairs."""
    from osmgraft.contract_text import symspell_typo_pairs
    from tests.conftest import SF_CORRECT

    got = sorted(
        (r["doc_a"], r["doc_b"])
        for r in symspell_typo_pairs(spark, SF_CORRECT).collect()
    )

    rows = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .selectExpr(
            "doc_id",
            "array_join(slice(split(lower(text), ' '), 1, 6), ' ') AS t0",
        )
        .selectExpr(
            "doc_id",
            "CASE WHEN doc_id % 6 = 0 THEN "
            "concat(substring(t0, 1, 2), substring(t0, 4)) ELSE t0 END "
            "AS title",
        )
        .collect()
    )

    def dist_le_1(a: str, b: str) -> bool:
        if a == b:
            return False  # equal titles are excluded by the query
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = j = edits = 0
        while i < la and j < lb:
            if a[i] == b[j]:
                i += 1
                j += 1
            else:
                edits += 1
                if edits > 1:
                    return False
                j += 1
        return True

    want = sorted(
        (x["doc_id"], y["doc_id"])
        for i, x in enumerate(rows)
        for y in rows[i + 1:]
        if dist_le_1(x["title"], y["title"])
    )
    want = [
        (min(p), max(p)) for p in want
    ]
    assert got == sorted(want)


class TestSession8Stats:
    SF = "/root/testdata/sf0.001"

    def test_roc_auc_matches_numpy(self, spark):
        """Rank-identity AUC == direct pairwise comparison count."""
        import numpy as np
        from osmgraft.contract_corpus import roc_auc_eval

        ev = spark.read.parquet(f"{self.SF}/events.parquet").toPandas()
        y = (ev.event_type == "purchase").to_numpy()
        s = ev.value.to_numpy()
        pos, neg = s[y], s[~y]
        wins = (pos[:, None] > neg[None, :]).sum()
        ties = (pos[:, None] == neg[None, :]).sum()
        exp = (wins + 0.5 * ties) / (len(pos) * len(neg))
        out = roc_auc_eval(spark, self.SF).toPandas().iloc[0]
        assert int(out.n_pos) == len(pos)
        assert int(out.n_neg) == len(neg)
        assert abs(out.auc - exp) < 1e-6

    def test_poisson_bootstrap_sane(self, spark):
        """Deterministic hash weights: replicate sizes concentrate
        around n, the CI brackets the point mean, se > 0."""
        from osmgraft.contract_corpus import poisson_bootstrap_ci

        out = poisson_bootstrap_ci(spark, self.SF).toPandas().iloc[0]
        n = int(out.n_rows)
        # Poisson(1) total: mean n, sd ~ sqrt(n) — allow 6 sigma
        assert abs(int(out.min_n_eff) - n) < 6 * n**0.5 + 10
        assert abs(int(out.max_n_eff) - n) < 6 * n**0.5 + 10
        assert out.ci_lo < out.point_mean < out.ci_hi
        assert out.boot_se > 0

    def test_ols_matches_numpy(self, spark):
        """Closed-form normal equations == numpy lstsq on the snapped
        response."""
        import numpy as np
        from osmgraft.contract_corpus import ols_multifeature

        ev = spark.read.parquet(f"{self.SF}/events.parquet").toPandas()
        yu = np.floor(ev.value.to_numpy() * 100.0 + 0.5) / 100.0
        x1 = (ev.event_id % 24).to_numpy()
        x2 = (ev.user_id % 7).to_numpy()
        X = np.column_stack([np.ones_like(yu), x1, x2])
        beta, *_ = np.linalg.lstsq(X, yu, rcond=None)
        pred = X @ beta
        ssr = ((pred - yu.mean()) ** 2).sum()
        sst = ((yu - yu.mean()) ** 2).sum()
        out = ols_multifeature(spark, self.SF).toPandas().iloc[0]
        assert abs(out.beta0 - beta[0]) < 1e-4
        assert abs(out.beta1 - beta[1]) < 1e-4
        assert abs(out.beta2 - beta[2]) < 1e-4
        assert abs(out.r2 - ssr / sst) < 1e-4

    def test_subtree_rollup_matches_treewalk(self, spark):
        """Closed-form ancestor enumeration == recursive tree walk."""
        import numpy as np
        from osmgraft.contract_corpus import subtree_rollup, _TREE_TOP

        part = spark.read.parquet(f"{self.SF}/part.parquet").toPandas()
        nodes = (part.p_partkey + 1).to_numpy()
        vu = np.floor(part.p_retailprice.to_numpy() * 100.0 + 0.5)
        val = {int(n): float(v) for n, v in zip(nodes, vu)}
        maxn = int(nodes.max())

        def subtree(a):
            cnt, s, stack = 0, 0.0, [a]
            while stack:
                x = stack.pop()
                if x > maxn:
                    continue
                if x in val:
                    cnt += 1
                    s += val[x]
                stack.extend((2 * x, 2 * x + 1))
            return cnt, s

        out = subtree_rollup(spark, self.SF).toPandas()
        assert list(out.ancestor) == [
            a for a in range(1, _TREE_TOP + 1) if subtree(a)[0] > 0
        ]
        for _, row in out.iterrows():
            cnt, s = subtree(int(row.ancestor))
            assert int(row.n_desc) == cnt
            assert abs(row.subtree_value - s / 100.0) < 1e-6

    def test_ivm_all_consistent(self, spark):
        """Maintained view == full recompute for every group."""
        from osmgraft.contract_corpus import ivm_agg_delta

        out = ivm_agg_delta(spark, self.SF).toPandas()
        assert len(out) > 0
        assert out.consistent.all()


class TestSemdedupAndBigramLM:
    SF = "/root/testdata/sf0.001"

    def test_semdedup_drops_exactly_injected_copies(self, spark):
        """The dropped set is exactly the injected scaled-copy schedule
        (isotropic originals never cross tau by construction)."""
        from osmgraft.contract_text import (
            semdedup_prune, _SD_DUP_MOD, _SD_DUP_OFF,
        )

        emb = spark.read.parquet(f"{self.SF}/embeddings.parquet")
        n = emb.count()
        n_dups = emb.where(F.col("vec_id") % _SD_DUP_MOD == 0).count()
        out = semdedup_prune(spark, self.SF).toPandas()
        assert out.n_vecs.sum() == n + n_dups
        assert out.n_dropped.sum() == n_dups
        assert (out.n_kept + out.n_dropped == out.n_vecs).all()

    def test_bigram_lm_matches_python_reference(self, spark):
        """Interpolated bigram bits recomputed in Python on sf0.001."""
        import math
        from collections import Counter

        from osmgraft.contract_corpus import bigram_logprob_interp

        docs = spark.read.parquet(f"{self.SF}/documents.parquet").toPandas()
        uc, bc, ctx = Counter(), Counter(), Counter()
        doc_bgs = {}
        for _, r in docs.iterrows():
            ws = r.text.split(" ")
            uc.update(ws)
            bgs = list(zip(ws, ws[1:]))
            doc_bgs[r.doc_id] = (r.lang, bgs)
            bc.update(bgs)
            ctx.update(w1 for w1, _ in bgs)
        N = sum(uc.values())
        bands = Counter()
        scores = {}
        for did, (lang, bgs) in doc_bgs.items():
            if not bgs:
                continue
            bits = [
                round(
                    -math.log2(
                        0.7 * bc[p] / ctx[p[0]] + 0.3 * uc[p[1]] / N
                    ),
                    10,
                )
                for p in bgs
            ]
            s = round(sum(bits) / len(bits), 6)
            scores[did] = (lang, s)
            bands[(lang, math.floor(s))] += 1
        out = bigram_logprob_interp(spark, self.SF).toPandas()
        got = {
            (r.lang, int(r.bits_band)): int(r.n_docs)
            for _, r in out.iterrows()
        }
        assert got == dict(bands)


def test_sequence_packing_matches_python_reference(spark):
    """Per-shard next-fit-decreasing packing equals a plain-Python
    replay: same bin counts, and the accounting identities
    (n_bins*CTX = packed + waste; truncation count) hold exactly."""
    from osmgraft.contract_corpus import _PK_CTX, _PK_SHARDS

    rows = {
        r["shard"]: r
        for r in cc.sequence_packing_plan(spark, SF_CORRECT).collect()
    }
    assert len(rows) == _PK_SHARDS
    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select(
            "doc_id", F.size(F.split("text", " ")).alias("n_tok")
        )
        .collect()
    )
    shards: dict[int, list[tuple[int, int]]] = {}
    for d in docs:
        shards.setdefault(d["doc_id"] % _PK_SHARDS, []).append(
            (d["n_tok"], d["doc_id"])
        )
    some_multi_doc_bin = False
    for shard, members in shards.items():
        # next-fit-decreasing: count desc, doc_id asc tiebreak
        order = sorted(
            members, key=lambda p: (-min(p[0], _PK_CTX), p[1])
        )
        bins, fill = 0, 0
        for n_tok, _ in order:
            c = min(n_tok, _PK_CTX)
            if fill + c > _PK_CTX:
                bins, fill = bins + 1, c
            else:
                fill += c
        if fill:
            bins += 1
        r = rows[shard]
        assert r["n_bins"] == bins
        assert r["n_docs"] == len(members)
        assert r["n_truncated"] == sum(
            1 for n_tok, _ in members if n_tok > _PK_CTX
        )
        assert (
            r["n_bins"] * _PK_CTX
            == r["packed_tokens"] + r["waste_tokens"]
        )
        assert r["packed_tokens"] <= r["total_tokens"]
        if r["n_bins"] < r["n_docs"]:
            some_multi_doc_bin = True
    # the fixture must exercise genuine packing, not 1 doc per bin
    assert some_multi_doc_bin


def test_fk_orphan_audit_matches_direct_recompute(spark):
    """Orphan rows per relation equal a direct NOT-IN recompute against
    the same simulated partial dim, and the simulation actually produces
    orphans (non-degenerate audit path)."""
    from osmgraft.contract_corpus import _FK_ARMS, _FK_DROP_MOD

    rows = {
        r["relation"]: r
        for r in cc.fk_orphan_audit(spark, SF_CORRECT).collect()
    }
    assert len(rows) == len(_FK_ARMS)
    total_orphans = 0
    for rel, child, fk, parent, pk in _FK_ARMS:
        c = spark.read.parquet(f"{SF_CORRECT}/{child}.parquet")
        p = (
            spark.read.parquet(f"{SF_CORRECT}/{parent}.parquet")
            .where(F.col(pk) % _FK_DROP_MOD != 0)
            .select(pk)
        )
        expected = c.join(p, c[fk] == p[pk], "left_anti").count()
        r = rows[rel]
        assert r["n_orphan_rows"] == expected
        assert r["n_orphan_rows"] <= r["n_child"] == c.count()
        total_orphans += r["n_orphan_rows"]
    assert total_orphans > 0


def test_scd2_intervals_partition_each_users_history(spark):
    """SCD2 invariants: per user, versions are 1..n with exactly one
    is_current row; intervals chain exactly (valid_to of version k ==
    valid_from of version k+1); adjacent versions differ in attr; the
    observed-day counts account for every user-day snapshot."""
    rows = cc.scd2_dimension_build(spark, SF_CORRECT).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
    n_user_days = (
        ev.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .distinct()
        .count()
    )
    assert sum(r["n_days_observed"] for r in rows) == n_user_days
    import datetime

    sentinel = datetime.date(9999, 12, 31)
    some_multi_version = False
    for vs in by_user.values():
        vs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in vs] == list(range(1, len(vs) + 1))
        assert sum(r["is_current"] for r in vs) == 1
        assert vs[-1]["is_current"] and vs[-1]["valid_to"] == sentinel
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["attr"] != b["attr"]
            assert a["valid_from"] < a["valid_to"]
        if len(vs) > 1:
            some_multi_version = True
    assert some_multi_version


def test_mor_delete_apply_accounting_and_equivalence(spark):
    """MoR invariants: n_base == n_pos_del + n_eq_del + n_live per file;
    the live set equals a direct double-anti-join reconstruction (count
    and checksum); both delete classes fire on the fixture; the
    equality-delete side is broadcast in the plan."""
    from osmgraft.contract_corpus import (
        _MOR_DV,
        _MOR_EQK,
        _MOR_EQV,
        _MOR_FILES,
        mor_delete_apply,
    )

    df = mor_delete_apply(spark, SF_CORRECT)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert len(rows) == _MOR_FILES
    assert sum(r["n_pos_del"] for r in rows) > 0
    assert sum(r["n_eq_del"] for r in rows) > 0
    for r in rows:
        assert r["n_base"] == r["n_pos_del"] + r["n_eq_del"] + r["n_live"]

    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet").selectExpr(
        f"l_orderkey % {_MOR_FILES} AS file_id",
        f"(l_orderkey div {_MOR_FILES}) * 10 + l_linenumber AS pos",
        "l_partkey",
    )
    posdel = li.where(
        f"(file_id * 31 + pos) % {_MOR_DV} = 0"
    ).select("file_id", "pos")
    eqdel = li.where(
        f"l_partkey % {_MOR_EQK} = {_MOR_EQV}"
    ).select("l_partkey").distinct()
    live = li.join(posdel, ["file_id", "pos"], "left_anti").join(
        eqdel, "l_partkey", "left_anti"
    )
    direct = {
        r["file_id"]: (r["n"], r["s"])
        for r in live.groupBy("file_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_partkey") + F.col("pos")).alias("s"),
        )
        .collect()
    }
    for r in rows:
        n, s = direct.get(r["file_id"], (0, 0))
        assert r["n_live"] == n
        assert r["live_sum"] == (s or 0)


def test_textrank_matches_python_reference(spark):
    """Final ranks equal a plain-Python TextRank replay (same snaps),
    and ranks are positive with the teleport floor."""
    from osmgraft.contract_text import (
        _TR_DAMP,
        _TR_ITERS,
        _TR_TOPK,
        textrank_keywords,
    )

    rows = textrank_keywords(spark, SF_CORRECT).collect()
    assert len(rows) == _TR_TOPK

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").collect()
    wt: dict[tuple[str, str], float] = {}
    for d in docs:
        toks = d["text"].split(" ")
        for a, b in zip(toks, toks[1:]):
            if a == b:
                continue
            wt[(a, b)] = wt.get((a, b), 0.0) + 1.0
            wt[(b, a)] = wt.get((b, a), 0.0) + 1.0
    wsum: dict[str, float] = {}
    for (a, _b), v in wt.items():
        wsum[a] = wsum.get(a, 0.0) + v
    rank = {n: 1.0 for n in wsum}
    for _ in range(_TR_ITERS):
        incoming: dict[str, float] = {}
        for (a, b), v in wt.items():
            incoming[b] = incoming.get(b, 0.0) + rank[a] * (v / wsum[a])
        rank = {
            n2: round((1.0 - _TR_DAMP) + _TR_DAMP * s, 10)
            for n2, s in incoming.items()
        }
    ref = sorted(
        ((round(r, 6), w) for w, r in rank.items()),
        key=lambda t2: (-t2[0], t2[1]),
    )[:_TR_TOPK]
    got = [(r["rank"], r["word"]) for r in rows]
    assert got == ref
    for r in rows:
        assert r["rank"] >= (1.0 - _TR_DAMP) - 1e-9
        assert r["cooc_weight"] == int(wsum[r["word"]])


def test_vacuum_audit_consistent_with_time_travel(spark):
    """Vacuum monotonicity + cross-op consistency: reclaimable files
    shrink as retention grows; eligible + retained = all removed files;
    what retention-R vacuum deletes is exactly the removed files absent
    from every snapshot >= current-R in time_travel_file_state's log."""
    from osmgraft.contract_corpus import (
        _TT_MAX_V,
        _VAC_WINDOWS,
        vacuum_retention_audit,
    )

    rows = {
        r["retention"]: r
        for r in vacuum_retention_audit(spark, SF_CORRECT).collect()
    }
    assert set(rows) == set(_VAC_WINDOWS)
    docs = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    )
    removed = {
        d["doc_id"]: (d["doc_id"] % 5 + 1 + d["doc_id"] % 4, d["n_chars"])
        for d in docs
        if d["doc_id"] % 3 == 0
    }
    n_removed = len(removed)
    prev = None
    for ret in sorted(_VAC_WINDOWS):
        r = rows[ret]
        elig = [
            b for (rv, b) in removed.values() if rv <= _TT_MAX_V - ret
        ]
        assert r["n_vacuum_files"] == len(elig)
        assert r["reclaim_bytes"] == sum(elig)
        assert r["n_retained_tombstones"] == n_removed - len(elig)
        if prev is not None:
            assert r["n_vacuum_files"] <= prev
        prev = r["n_vacuum_files"]
    assert rows[min(_VAC_WINDOWS)]["n_vacuum_files"] > 0


def test_pmi_pairs_survive_short_docs_and_match_hand_computation(spark, tmp_path):
    """Regression for the zip_with pair generator: 1-token and empty
    documents contribute zero pairs (the old nested-transform form built
    sequence(0, -1), which descends and crashed), and the PMI value on a
    corpus engineered past the min-pair gate matches the closed form
    2*ln(t_words / c_w)."""
    texts = ["a b"] * 30 + ["solo", ""]
    spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = cc.pmi_cooccurrence(spark, str(tmp_path)).collect()
    assert [(r["pair"], r["c_pair"]) for r in rows] == [("a b", 30)]
    # t_pairs=30, c_w(a)=c_w(b)=30, t_words=62 ("solo" + the empty-string
    # token each count once) -> pmi = ln((30/30)/((30/62)^2))
    expected = math.floor(2 * math.log(62 / 30) * 10000 + 0.5) / 10000
    assert rows[0]["pmi"] == expected


def test_tfidf_cosine_light_heavy_split_is_lossless(spark, monkeypatch):
    """The shipped tau = _TC_LIGHT_DF = 64 never routes a fixture term
    heavy (sf0.01 max df is 7), so force the split down to tau = 4 —
    151 terms go heavy — and require the light+heavy fused dot to equal
    a single-path DuckDB computation with the same constants. The rare
    window is lowered with tau (rare ⊆ light is the split's invariant:
    the candidate flag is only emitted on the light join)."""
    import duckdb

    from osmgraft import contract_text as ct

    monkeypatch.setattr(ct, "_TC_RARE_DF", 4)
    monkeypatch.setattr(ct, "_TC_LIGHT_DF", 4)
    got = (
        ct.tfidf_cosine_pairs(spark, SF_CORRECT)
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    naive = con.sql(
        f"""
        WITH arrs AS (SELECT doc_id, string_split(text, ' ') AS arr
                      FROM '{SF_CORRECT}/documents.parquet'
                      WHERE len(string_split(text, ' ')) >= 3),
        toks AS (SELECT doc_id,
                        array_to_string(list_slice(arr, k + 1, k + 3), ' ')
                          AS w
                 FROM arrs, UNNEST(range(len(arr) - 2)) AS t(k)),
        tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
               FROM toks GROUP BY doc_id, w),
        df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
        nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
        wt AS (SELECT tf.doc_id, tf.w,
                      CAST(FLOOR(tf.tf * LN(nd.n * 1.0e0 / df.df)
                                 * 1000000.0e0 + 5.0e-1) AS BIGINT) AS wu
               FROM tf JOIN df USING (w) CROSS JOIN nd),
        norms AS (SELECT doc_id, SUM(wu * wu) AS n2 FROM wt
                  GROUP BY doc_id),
        rare AS (SELECT w FROM df WHERE df BETWEEN 2 AND 4),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM tf a JOIN rare USING (w) JOIN tf b USING (w)
                 WHERE a.doc_id < b.doc_id),
        dots AS (SELECT c.doc_a, c.doc_b, SUM(x.wu * y.wu) AS dot
                 FROM cand c
                 JOIN wt x ON x.doc_id = c.doc_a
                 JOIN wt y ON y.doc_id = c.doc_b AND y.w = x.w
                 GROUP BY c.doc_a, c.doc_b)
        SELECT d.doc_a, d.doc_b,
               ROUND(d.dot / (SQRT(na.n2 * 1.0e0) * SQRT(nb.n2 * 1.0e0)),
                     6) AS cosine
        FROM dots d
        JOIN norms na ON na.doc_id = d.doc_a
        JOIN norms nb ON nb.doc_id = d.doc_b
        WHERE d.dot / (SQRT(na.n2 * 1.0e0) * SQRT(nb.n2 * 1.0e0))
              >= 0.5e0 - 5.0e-7
        ORDER BY d.doc_a, d.doc_b
        """
    ).df()
    # non-vacuous: heavy terms exist AND some surviving pair shares one
    heavy_shared = con.sql(
        f"""
        WITH arrs AS (SELECT doc_id, string_split(text, ' ') AS arr
                      FROM '{SF_CORRECT}/documents.parquet'
                      WHERE len(string_split(text, ' ')) >= 3),
        toks AS (SELECT doc_id,
                        array_to_string(list_slice(arr, k + 1, k + 3), ' ')
                          AS w
                 FROM arrs, UNNEST(range(len(arr) - 2)) AS t(k)),
        tf AS (SELECT DISTINCT doc_id, w FROM toks),
        df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
        heavy AS (SELECT w FROM df WHERE df > 4)
        SELECT COUNT(*) AS n FROM tf a JOIN heavy USING (w)
        JOIN tf b USING (w) WHERE a.doc_id < b.doc_id
        """
    ).df()["n"][0]
    assert heavy_shared > 0
    assert len(got) > 0
    assert len(got) == len(naive)
    assert (got["doc_a"].values == naive["doc_a"].values).all()
    assert (got["doc_b"].values == naive["doc_b"].values).all()
    assert (abs(got["cosine"].values - naive["cosine"].values) < 2e-6).all()
