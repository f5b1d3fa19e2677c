"""Driver-contract entries: linkage / drift / layout mining (round-3
session-12).

Operators a production entity-resolution + data-layout pipeline runs
that no existing entry covers, each oracle-paired:

- ``sorted_neighborhood_pairs``: the OTHER classic record-linkage
  blocking strategy (Hernandez & Stolfo 1995) — sort records by a key,
  slide a fixed window, compare only within the window. Complements
  ``phonetic_blocking_pairs`` (key-equality blocking): SNM catches
  typos that CHANGE the phonetic skeleton but keep lexicographic
  locality. Distributed via the repo's two-level exact global rank
  (``analytics/ranking.with_global_rank``) + overlap-block equi-join —
  no single-partition window, no range join.
- ``wasserstein_value_drift``: exact 1-D earth-mover (W1) distance
  between each event type's value distribution and the pooled
  distribution — the integral |F_t - F_pool| over the merged support.
  PSI/JS/KS entries bin or take sups; W1 is the metric that weights
  HOW FAR mass moved, the standard drift score for numeric features.
  Exact integer micro-CDF arithmetic on both engines.
- ``consistent_hash_rebalance``: shard-map churn audit — for every key,
  its shard under mod-N vs rendezvous (highest-random-weight) hashing
  at N=8 and N=9 shards, and the fraction of keys that MOVE when a
  shard is added. The quantified argument for consistent hashing in a
  partition-layout design review (mod moves ~ N/(N+1) of all keys,
  rendezvous ~ 1/(N+1) — minimal disruption, Thaler & Ravishankar
  1998). Pure deterministic integer hash arithmetic, identical on both
  engines.

Reference surface being generalized: the reference's dedup/refinement
workflows (validation_and_refinement_workflow.sh near-match passes,
power_user_queries.sql fuzzy-match sections) block on exact name keys;
SNM + the drift/layout audits extend the same scan-and-aggregate shapes
to the linkage and partition-maintenance primitives a 10^12-page corpus
needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osmgraft.analytics.ranking import with_global_rank
from osmgraft.contract import q, t
from osmgraft.contract_select import _PB_NAME_SQL, _PB_FIRST, _PB_LAST, _pb_case

# ---------------------------------------------------------------------------
# sorted-neighborhood record-linkage pairs
# ---------------------------------------------------------------------------

_SNM_W = 4  # window size: compare ranks r, s with 1 <= s - r <= _SNM_W - 1

_SNM_SQL = f"""
    WITH named AS ({_PB_NAME_SQL}),
    keyed AS (
      SELECT name, CAST(COUNT(*) AS BIGINT) AS n_ids
      FROM named GROUP BY name),
    ranked AS (
      SELECT name, n_ids,
             ROW_NUMBER() OVER (ORDER BY name) AS rn
      FROM keyed),
    pairs AS (
      SELECT a.name AS name_a, b.name AS name_b,
             levenshtein(a.name, b.name) AS lev
      FROM ranked a JOIN ranked b
        ON b.rn BETWEEN a.rn + 1 AND a.rn + {_SNM_W - 1})
    SELECT lev,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           MIN(name_a || '|' || name_b) AS example_pair
    FROM pairs WHERE lev <= 2
    GROUP BY lev ORDER BY lev
    """


@q("sorted_neighborhood_pairs", oracle=_SNM_SQL)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood method (SNM) record linkage: sort the
    DISTINCT-name relation lexicographically, compare each name only
    against the next ``w-1`` names in sort order, keep Levenshtein <= 2
    matches, roll up per edit distance. The classic complement to
    key-equality blocking — a doubled-final-letter typo keeps the name
    adjacent in sort order even when it changes a phonetic key.

    Scale shape (the part the naive form gets wrong): the global sort
    rank comes from the repo's two-level exact ranking (range buckets
    from an approxQuantile probe on an order-isomorphic numeric prefix
    encoding, per-bucket ROW_NUMBER + driver prefix-sum offsets — the
    widest stage is B-way parallel, never a single-partition window).
    Window-adjacency pairs come from an overlap-block EQUI-join: each
    row emits block ids ``(rn-1) div (w-1)`` and that + 1, so any two
    ranks within w-1 of each other share a block — never a BNLJ range
    join. Levenshtein runs only on the O(n·w) candidate pairs.
    """
    c = t(spark, sf_dir, "customer").select("c_custkey")
    nm = F.expr(
        f"{_pb_case('c_custkey % 8', _PB_FIRST)} || ' ' || "
        f"{_pb_case('(c_custkey div 8) % 8', _PB_LAST)}"
    )
    named = c.select(
        F.col("c_custkey").alias("id"), nm.alias("nm")
    ).select(
        "id",
        F.when(F.col("id") % 5 == 0, F.expr("replace(nm, 'e', 'a')"))
        .when(
            F.col("id") % 7 == 0,
            F.expr("nm || substr(nm, length(nm), 1)"),
        )
        .otherwise(F.col("nm"))
        .alias("name"),
    )
    keyed = named.groupBy("name").agg(
        F.count("*").cast("long").alias("n_ids")
    )
    # numeric prefix encoding, order-isomorphic to the name's first 6
    # chars (ascii(c) <= 127 for the [a-z ] alphabet; missing chars -> 0
    # which sorts first, matching 'ab' < 'abc'); ties broken by the full
    # name inside with_global_rank, so rank order == ORDER BY name.
    enc = sum(
        (
            F.ascii(F.expr(f"substr(name, {i + 1}, 1)")).cast("long")
            * F.lit(128 ** (5 - i)).cast("long")
            for i in range(6)
        ),
        start=F.lit(0).cast("long"),
    )
    ranked = with_global_rank(
        keyed.withColumn("_enc", enc), ["_enc", "name"], rank_col="rn",
        n_buckets=16,
    ).drop("_enc")
    wm1 = _SNM_W - 1
    blocks = ranked.select(
        "name", "rn",
        F.explode(
            F.array(
                ((F.col("rn") - 1) / wm1).cast("long"),
                ((F.col("rn") - 1) / wm1).cast("long") + 1,
            )
        ).alias("blk"),
    ).dropDuplicates(["name", "blk"])
    a = blocks.select(
        F.col("blk"), F.col("name").alias("name_a"), F.col("rn").alias("rn_a")
    )
    b = blocks.select(
        F.col("blk").alias("blk_b"), F.col("name").alias("name_b"),
        F.col("rn").alias("rn_b"),
    )
    pairs = (
        a.join(b, (a.blk == b.blk_b))
        .where(
            (F.col("rn_b") > F.col("rn_a"))
            & (F.col("rn_b") <= F.col("rn_a") + wm1)
        )
        .dropDuplicates(["name_a", "name_b"])
        .withColumn("lev", F.levenshtein("name_a", "name_b"))
        .where(F.col("lev") <= 2)
    )
    return (
        pairs.groupBy("lev")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.min(F.concat_ws("|", "name_a", "name_b")).alias("example_pair"),
        )
        .orderBy("lev")
    )


# ---------------------------------------------------------------------------
# exact 1-D Wasserstein (earth-mover) drift per event type
# ---------------------------------------------------------------------------

_W1_SQL = """
    WITH ev AS (
      SELECT event_type, CAST(FLOOR(value * 100e0) AS BIGINT) AS vc
      FROM events),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev),
    ttot AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nt
      FROM ev GROUP BY event_type),
    pool AS (
      SELECT vc, CAST(COUNT(*) AS BIGINT) AS cp
      FROM ev GROUP BY vc),
    tc AS (
      SELECT event_type, vc, CAST(COUNT(*) AS BIGINT) AS ct
      FROM ev GROUP BY event_type, vc),
    grid AS (
      SELECT t.event_type, p.vc, p.cp, COALESCE(c.ct, 0) AS ct
      FROM pool p CROSS JOIN ttot t
      LEFT JOIN tc c ON c.event_type = t.event_type AND c.vc = p.vc),
    cdf AS (
      SELECT g.event_type, g.vc,
             SUM(g.ct) OVER (PARTITION BY g.event_type ORDER BY g.vc)
               * 1000000 // tt.nt AS f_t,
             SUM(g.cp) OVER (PARTITION BY g.event_type ORDER BY g.vc)
               * 1000000 // (SELECT n FROM tot) AS f_p,
             LEAD(g.vc) OVER (PARTITION BY g.event_type ORDER BY g.vc)
               AS vnext
      FROM grid g JOIN ttot tt ON g.event_type = tt.event_type)
    SELECT c.event_type, tt.nt AS n_events,
           CAST(SUM(ABS(c.f_t - c.f_p) * (c.vnext - c.vc)) AS BIGINT)
             AS w1_micro_cents,
           ROUND(SUM(ABS(c.f_t - c.f_p) * (c.vnext - c.vc)) / 1.0e8, 6)
             AS w1_value
    FROM cdf c JOIN ttot tt ON c.event_type = tt.event_type
    WHERE c.vnext IS NOT NULL
    GROUP BY c.event_type, tt.nt ORDER BY c.event_type
    """


@q("wasserstein_value_drift", oracle=_W1_SQL)
def wasserstein_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between each event
    type's value distribution and the pooled distribution: W1 =
    integral of |F_type - F_pool| over the merged support, computed on
    cent-quantized values so every CDF step is an exact integer
    micro-fraction (cum_count * 1e6 div total) and the distance itself
    is an exact BIGINT in micro-cent units. The drift metric that
    weights distance-moved, completing the drift family (PSI bins, KS
    sups, JS/chi2 on categories).

    Scale shape: raw events reduce in ONE (type, cent) partial-agg
    shuffle; the CDF windows run on the POST-AGG distinct-value grid
    (bounded by 100 x value range x n_types, independent of row count),
    partitioned by event type — never a window over raw rows.
    """
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(FLOOR(value * 100e0) AS BIGINT)").alias("vc"),
    )
    tot = ev.count()
    ttot = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("nt"))
    pool = ev.groupBy("vc").agg(F.count("*").cast("long").alias("cp"))
    tc = ev.groupBy("event_type", "vc").agg(
        F.count("*").cast("long").alias("ct")
    )
    grid = (
        pool.crossJoin(F.broadcast(ttot))
        .join(
            tc.withColumnRenamed("vc", "vc_c").withColumnRenamed(
                "event_type", "et_c"
            ),
            (F.col("vc") == F.col("vc_c"))
            & (F.col("event_type") == F.col("et_c")),
            "left",
        )
        .select(
            "event_type", "vc", "cp", "nt",
            F.coalesce("ct", F.lit(0)).alias("ct"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("vc")
    cdf = grid.select(
        "event_type", "vc", "nt",
        F.sum("ct").over(w).alias("cum_t"),
        F.sum("cp").over(w).alias("cum_p"),
        F.lead("vc").over(w).alias("vnext"),
    ).select(
        "event_type", "vc", "nt", "vnext",
        F.expr("cum_t * 1000000 div nt").alias("f_t"),
        F.expr(f"cum_p * 1000000 div {tot}").alias("f_p"),
    )
    return (
        cdf.where(F.col("vnext").isNotNull())
        .groupBy("event_type", F.col("nt").alias("n_events"))
        .agg(
            F.sum(
                F.abs(F.col("f_t") - F.col("f_p"))
                * (F.col("vnext") - F.col("vc"))
            ).cast("long").alias("w1_micro_cents"),
        )
        .select(
            "event_type", "n_events", "w1_micro_cents",
            F.round(F.col("w1_micro_cents") / F.lit(1.0e8), 6).alias("w1_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# consistent-hash rebalance audit (mod vs rendezvous, N=8 -> 9)
# ---------------------------------------------------------------------------

_CH_N = 8

# deterministic per-(key, shard) weight; * 16 + s keeps weights distinct
# across shards for one key, so every argmax is unique (no tie ambiguity)
_CH_H = (
    "((event_id * 1103515245 + {s} * 2654435761 + 12345) % 2147483648)"
    " * 16 + {s}"
)


def _ch_argmax_sql(n: int) -> str:
    exprs = ", ".join(_CH_H.format(s=s) for s in range(n))
    return (
        f"list_position(l{n}, list_max(l{n})) - 1"
        .replace(f"l{n}", f"[{exprs}]")
    )


_CH_SQL = f"""
    WITH keys AS (SELECT DISTINCT event_id FROM events),
    assigned AS (
      SELECT event_id,
             event_id % {_CH_N} AS mod8,
             event_id % {_CH_N + 1} AS mod9,
             {_ch_argmax_sql(_CH_N)} AS rdv8,
             {_ch_argmax_sql(_CH_N + 1)} AS rdv9
      FROM keys),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(CASE WHEN mod8 <> mod9 THEN 1 ELSE 0 END) AS BIGINT)
               AS moved_mod,
             CAST(SUM(CASE WHEN rdv8 <> rdv9 THEN 1 ELSE 0 END) AS BIGINT)
               AS moved_rdv
      FROM assigned)
    SELECT 'mod' AS scheme, n_keys, moved_mod AS n_moved,
           moved_mod * 1000000 // n_keys AS moved_ppm
    FROM agg
    UNION ALL
    SELECT 'rendezvous' AS scheme, n_keys, moved_rdv AS n_moved,
           moved_rdv * 1000000 // n_keys AS moved_ppm
    FROM agg
    ORDER BY scheme
    """


@q("consistent_hash_rebalance", oracle=_CH_SQL)
def consistent_hash_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-map churn audit: assign every key (distinct event id) to a
    shard under mod-N hashing AND rendezvous (highest-random-weight)
    hashing at N=8 and N=9 shards, then report the fraction of keys
    that MOVE when the 9th shard is added. Mod re-shuffles ~N/(N+1) of
    all keys; rendezvous moves only the ~1/(N+1) that the new shard now
    wins — the quantified case for consistent placement in any
    partition-layout / cache-shard design (Thaler & Ravishankar 1998).
    The per-(key, shard) weight is a pure LCG polynomial with the shard
    id mixed into the low bits, so argmaxes are unique and both engines
    compute bit-identical assignments.

    Scale shape: one distinct-key reduce, then per-row constant-width
    arithmetic (9 weight expressions + argmax over a 9-element array)
    and ONE global conditional aggregate. No join, no window; the
    shard count is a literal, never a relation.
    """
    keys = t(spark, sf_dir, "events").select("event_id").distinct()

    def argmax_expr(n: int) -> str:
        exprs = ", ".join(_CH_H.format(s=s) for s in range(n))
        return (
            f"array_position(array({exprs}), "
            f"array_max(array({exprs}))) - 1"
        )

    assigned = keys.select(
        F.expr(f"event_id % {_CH_N}").alias("mod8"),
        F.expr(f"event_id % {_CH_N + 1}").alias("mod9"),
        F.expr(argmax_expr(_CH_N)).alias("rdv8"),
        F.expr(argmax_expr(_CH_N + 1)).alias("rdv9"),
    )
    agg = assigned.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum(F.when(F.col("mod8") != F.col("mod9"), 1).otherwise(0))
        .cast("long").alias("moved_mod"),
        F.sum(F.when(F.col("rdv8") != F.col("rdv9"), 1).otherwise(0))
        .cast("long").alias("moved_rdv"),
    )
    mod_row = agg.select(
        F.lit("mod").alias("scheme"), "n_keys",
        F.col("moved_mod").alias("n_moved"),
        F.expr("moved_mod * 1000000 div n_keys").alias("moved_ppm"),
    )
    rdv_row = agg.select(
        F.lit("rendezvous").alias("scheme"), "n_keys",
        F.col("moved_rdv").alias("n_moved"),
        F.expr("moved_rdv * 1000000 div n_keys").alias("moved_ppm"),
    )
    return mod_row.unionAll(rdv_row).orderBy("scheme")
