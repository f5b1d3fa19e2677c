"""Driver-contract entries: text analysis, dedup, and embedding search.

These are the training-data-pipeline operators (dedup, language-ID, quality,
token counting, fingerprints, ANN) over the `documents` and `embeddings`
tables. Oracles are exact SQL mirrors where the math is portable; hash-based
signatures (xxhash64 MinHash/SimHash) have no DuckDB equivalent and are
registered without an oracle (driver records the weaker rows-only check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmgraft.contract import q, t
from osmgraft.text.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    shingles,
    shingle_hashes,
    simhash,
    verify_jaccard,
)
from osmgraft.text.quality import (
    LANG_MARKERS,
    STOPWORDS,
    language_id,
    quality_scores,
    text_fingerprint,
    token_counts,
)


# ---------------------------------------------------------------------------
# SQL mirrors of the quality expressions (generated from the same tables the
# Spark implementations use — single source of truth for marker words)
# ---------------------------------------------------------------------------


def _hits_sql(word: str) -> str:
    needle = f" {word} "
    return (
        f"CAST((length(padded) - length(replace(padded, '{needle}', '')))"
        f" / {len(needle)} AS INT)"
    )


def _lang_score_sql(lang: str) -> str:
    return "(" + " + ".join(_hits_sql(w) for w in LANG_MARKERS[lang]) + ")"


_LANG_ID_ORACLE = f"""
WITH p AS (SELECT doc_id,
                  ' ' || replace(lower(text), ' ', '  ') || ' ' AS padded
           FROM documents),
     s AS (SELECT doc_id,
           {', '.join(f'{_lang_score_sql(lg)} AS score_{lg}' for lg in LANG_MARKERS)}
           FROM p),
     g AS (SELECT doc_id, GREATEST({', '.join(f'score_{lg}' for lg in LANG_MARKERS)}) AS best, *
           FROM s)
SELECT doc_id,
       CASE WHEN best <= 0 THEN 'und'
            {' '.join(f"WHEN score_{lg} = best THEN '{lg}'" for lg in LANG_MARKERS)}
       END AS pred_lang,
       best AS marker_hits
FROM g ORDER BY doc_id
"""

_STOP_SQL = " + ".join(_hits_sql(w) for w in STOPWORDS)

_QUALITY_ORACLE = f"""
WITH p AS (SELECT doc_id, text,
                  ' ' || replace(lower(text), ' ', '  ') || ' ' AS padded
           FROM documents),
     b AS (SELECT doc_id,
                  length(text) AS n_chars,
                  len(string_split(text, ' ')) AS n_tokens,
                  ({_STOP_SQL}) AS stop_hits,
                  length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS n_alpha
           FROM p),
     r AS (SELECT *, CASE WHEN n_chars > 0
                          THEN n_alpha / CAST(n_chars AS DOUBLE)
                          ELSE 0.0 END AS alpha FROM b)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(n_chars / n_tokens, 4) AS mean_token_len,
       ROUND(stop_hits / n_tokens, 4) AS stopword_ratio,
       ROUND(alpha, 4) AS alpha_ratio,
       ROUND(LEAST(1.0, n_tokens / 64.0) * 0.4
             + LEAST(1.0, (stop_hits / n_tokens) * 5.0) * 0.2
             + alpha * 0.4, 4) AS quality_score
FROM r ORDER BY doc_id
"""


# ===========================================================================
# text analysis
# ===========================================================================

@q("lang_id", oracle=_LANG_ID_ORACLE)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language identification (JVM expressions only)."""
    return language_id(t(spark, sf_dir, "documents")).orderBy("doc_id")


@q(
    "token_counts",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(CEIL(length(text) / 4.0) AS BIGINT) AS n_bpe_est
    FROM documents ORDER BY doc_id
    """,
)
def token_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-proxy token counting."""
    out = token_counts(t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"), "n_bpe_est"
    ).orderBy("doc_id")


@q("quality_scores", oracle=_QUALITY_ORACLE)
def quality_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/punctuation/stopword quality heuristics."""
    out = quality_scores(t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_token_len", "stopword_ratio", "alpha_ratio", "quality_score",
    ).orderBy("doc_id")


@q(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization fingerprint (md5 of case/whitespace-normalized text)."""
    return text_fingerprint(t(spark, sf_dir, "documents")).select(
        "doc_id", "fingerprint"
    ).orderBy("doc_id")


# ===========================================================================
# dedup
# ===========================================================================

@q(
    "dedup_exact",
    oracle="""
    SELECT doc_id, text_digest, is_duplicate FROM (
      SELECT doc_id, md5(lower(trim(text))) AS text_digest,
             ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                                ORDER BY doc_id) > 1 AS is_duplicate
      FROM documents)
    ORDER BY doc_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy keeps the lowest-id representative."""
    return exact_dedup(t(spark, sf_dir, "documents")).select(
        "doc_id", "text_digest", "is_duplicate"
    ).orderBy("doc_id")


_RARE_MAX = 10
_JACCARD_MIN = 0.25

_NGRAM_PAIRS_SQL = f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
         seq AS (SELECT unnest(generate_series(1,
                   (SELECT MAX(len(arr)) FROM w))) AS i),
         s AS (SELECT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle
               FROM w JOIN seq ON i <= len(arr) - 2),
         sd AS (SELECT DISTINCT doc_id, shingle FROM s),
         rare AS (SELECT shingle FROM sd GROUP BY shingle
                  HAVING COUNT(*) <= {_RARE_MAX}),
         rs AS (SELECT sd.doc_id, sd.shingle FROM sd JOIN rare USING (shingle)),
         sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM rs GROUP BY doc_id),
         ov AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       CAST(COUNT(*) AS BIGINT) AS overlap
                FROM rs a JOIN rs b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY doc_a, doc_b)
    SELECT doc_a, doc_b, overlap,
           ROUND(overlap / (na.n + nb.n - overlap), 4) AS jaccard
    FROM ov JOIN sizes na ON na.doc_id = doc_a
            JOIN sizes nb ON nb.doc_id = doc_b
    WHERE overlap / (na.n + nb.n - overlap) >= {_JACCARD_MIN}
    ORDER BY doc_a, doc_b
    """


@q("ngram_jaccard_pairs", oracle=_NGRAM_PAIRS_SQL)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-shingle-blocked word-3-gram Jaccard near-dup pairs (the exact
    verification stage of the MinHash/LSH path, with LSH-style blocking)."""
    docs = t(spark, sf_dir, "documents")
    sd = shingles(docs, n=3)
    rare = sd.groupBy("shingle").count().where(F.col("count") <= _RARE_MAX).select("shingle")
    rs = sd.join(rare, "shingle")
    sizes = rs.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = rs.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = rs.select(F.col("doc_id").alias("doc_b"), "shingle")
    ov = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("overlap"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("overlap") / (F.col("na") + F.col("nb") - F.col("overlap"))
    return (
        ov.join(na, "doc_a").join(nb, "doc_b")
        .where(jac >= _JACCARD_MIN)
        .select("doc_a", "doc_b", "overlap", F.round(jac, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@q(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pr AS ({_NGRAM_PAIRS_SQL}),
         edges AS (SELECT doc_a AS s, doc_b AS t FROM pr
                   UNION SELECT doc_b, doc_a FROM pr),
         nodes AS (SELECT DISTINCT s AS id FROM edges),
         reach(id, r) AS (
           SELECT id, id FROM nodes
           UNION
           SELECT rr.id, e.t FROM reach rr JOIN edges e ON e.s = rr.r),
         lab AS (SELECT id AS doc_id, MIN(r) AS cluster_id
                 FROM reach GROUP BY id)
    SELECT doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM lab ORDER BY doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERING (round-2): connected components over the
    rare-shingle Jaccard pair graph via distributed min-label propagation
    (text/dedup.py::connected_components — O(diameter) rounds of
    join + partial-agg on 8-byte labels, lineage-cut per round). The step
    every dedup pipeline ends with: one representative per component. The
    oracle recomputes the transitive closure with a recursive CTE —
    equality proves the iterative algorithm reached the true components."""
    from pyspark.sql import Window

    from osmgraft.text.dedup import connected_components

    pairs = ngram_jaccard_pairs(spark, sf_dir)
    cc = connected_components(pairs)
    w = Window.partitionBy("cluster_id")
    return (
        cc.withColumn("cluster_size", F.count("*").over(w).cast("long"))
        .orderBy("doc_id")
    )


@q("minhash_lsh_pairs")  # hash-based: no SQL oracle (rows-only check)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + 8-band LSH candidate pairs, verified with exact Jaccard."""
    docs = t(spark, sf_dir, "documents")
    # hashed shingles: 8-byte keys through every shuffle; shared by the
    # signature and exact-verify stages (Jaccard over hash sets == Jaccard
    # over shingle sets modulo 64-bit collisions — this entry is hash-based
    # and rows-only by design)
    sd = shingle_hashes(docs, n=3)
    pairs = minhash_lsh_candidates(docs, num_hashes=32, bands=8, shingle_df=sd)
    return (
        verify_jaccard(pairs, sd)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@q("simhash_signatures")  # xxhash64-based: rows-only check
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints (bit-majority, pure JVM arithmetic)."""
    return simhash(t(spark, sf_dir, "documents")).orderBy("doc_id")


@q("simhash_neardup_pairs")  # xxhash64-based sigs: rows-only check
def simhash_neardup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs (round-2): banded pigeonhole blocking,
    LOSSLESS within the hamming radius (exactness vs all-pairs popcount
    proven in test_pipeline), exact bit_count refine — equi-join on
    (band, 16-bit key), never all-pairs."""
    from osmgraft.text.dedup import simhash_neardup_pairs

    sigs = simhash(t(spark, sf_dir, "documents"))
    return simhash_neardup_pairs(sigs, max_hamming=3).orderBy("doc_a", "doc_b")


# ===========================================================================
# embedding similarity search
# ===========================================================================

@q(
    "ann_bruteforce_top10",
    oracle="""
    WITH qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0),
         sims AS (SELECT vec_id,
                         ROUND(list_cosine_similarity(embedding::DOUBLE[], q), 5) AS cosine_sim
                  FROM embeddings, qv WHERE vec_id <> 0)
    SELECT vec_id, cosine_sim,
           ROW_NUMBER() OVER (ORDER BY cosine_sim DESC, vec_id) AS rank
    FROM sims ORDER BY rank LIMIT 10
    """,
)
def ann_bruteforce_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 vs vec_id=0 (zip_with/aggregate, JVM-side)."""
    from osmgraft.ann.search import cosine_col

    emb = t(spark, sf_dir, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").head()
    qvec = F.array(*[F.lit(float(v)) for v in qrow[0]])
    vec = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    sims = emb.where(F.col("vec_id") != 0).select(
        "vec_id", F.round(cosine_col(vec, qvec), 5).alias("cosine_sim")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .orderBy("rank")
    )


@q(
    "embedding_norm_stats",
    oracle="""
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))), 4)
             AS avg_norm
    FROM embeddings GROUP BY label ORDER BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math over array columns: per-label L2-norm statistics."""
    emb = t(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, v: acc + v * v))
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg("norm"), 4).alias("avg_norm"))
        .orderBy("label")
    )


_LSH_BITS = 12


def _lsh_oracle_sql() -> str:
    """Full oracle for the hyperplane-LSH path (round-2 upgrade from
    rows-only): the seeded projection matrix is a plan-time constant, so
    it inlines as DOUBLE[] literals (e-notation — the DuckDB decimal
    trap); signatures, the hamming-1 multiprobe set, and the in-bucket
    exact rerank are all recomputed in SQL."""
    from osmgraft.ann.search import make_projections
    from osmgraft.geo.hexgrid import lit_sql

    proj = make_projections(64, _LSH_BITS, seed=42)
    rows = ", ".join(
        "(" + str(b) + ", [" + ", ".join(lit_sql(float(v)) for v in proj[b]) + "]::DOUBLE[])"
        for b in range(_LSH_BITS)
    )
    return f"""
    WITH proj(b, p) AS (VALUES {rows}),
         q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         sig AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
                        CAST(SUM(CASE WHEN list_inner_product(e.embedding::DOUBLE[], p.p) > 0
                                      THEN 1 << p.b ELSE 0 END) AS BIGINT) AS bucket
                 FROM embeddings e CROSS JOIN proj p
                 WHERE e.vec_id <> 0 GROUP BY e.vec_id, v),
         qs AS (SELECT CAST(SUM(CASE WHEN list_inner_product(q.qv, p.p) > 0
                                     THEN 1 << p.b ELSE 0 END) AS BIGINT) AS b0
                FROM q CROSS JOIN proj p),
         probe AS (SELECT b0 AS pb FROM qs
                   UNION ALL
                   SELECT xor(b0, CAST(1 << i AS BIGINT))
                   FROM qs, UNNEST(range(0, {_LSH_BITS})) AS t(i)),
         cand AS (SELECT s.vec_id, s.v FROM sig s
                  WHERE s.bucket IN (SELECT pb FROM probe))
    SELECT c.vec_id, ROUND(list_cosine_similarity(c.v, q.qv), 6) AS cosine_sim
    FROM cand c CROSS JOIN q
    ORDER BY cosine_sim DESC, c.vec_id LIMIT 10
    """


@q("ann_lsh_top10", oracle=_lsh_oracle_sql())
def ann_lsh_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketed ANN (multiprobe hamming-1). Round-2:
    fully oracle-paired — the oracle recomputes signatures from the inlined
    projection literals, the probe set, and the in-bucket exact rerank."""
    from osmgraft.ann.search import lsh_bucket_topk

    emb = t(spark, sf_dir, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").head()
    qvec = [float(v) for v in qrow[0]]
    return lsh_bucket_topk(
        emb.where(F.col("vec_id") != 0), qvec, k=10, n_bits=_LSH_BITS
    )


@q("stratified_sample")  # seeded sampling: engine-specific (rows-only check)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 stratified per-tier sampling via sampleBy with fixed seed."""
    e = t(spark, sf_dir, "events")
    fracs = {k: 0.1 for k in ["click", "view", "purchase", "signup", "error"]}
    return (
        e.sampleBy("event_type", fracs, seed=42)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("event_type")
    )


_BATCH_Q_MOD, _BATCH_K = 101, 5


@q(
    "ann_batch_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id % {_BATCH_Q_MOD} = 0),
         s AS (SELECT q.qid, e.vec_id,
                      ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
                        AS cosine_sim
               FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid)
    SELECT qid, vec_id, cosine_sim FROM s
    QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY cosine_sim DESC, vec_id) <= {_BATCH_K}
    ORDER BY qid, cosine_sim DESC, vec_id
    """,
)
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN serving shape (round-2): top-k for MANY query vectors in
    one pass — broadcast the query set, score the corpus once, rank per
    query with a window. The corpus never shuffles (the window partitions
    by qid over the small scored slice after per-partition top-k
    pre-pruning by Catalyst's WindowGroupLimit). Exact form; the bucketed
    variants (LSH/IVF) are the scale path when |queries| is large."""
    from pyspark.sql import Window

    from osmgraft.ann.search import cosine_col

    emb = t(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    q_side = emb.where(F.col("vec_id") % _BATCH_Q_MOD == 0).select(
        F.col("vec_id").alias("qid"), vec.alias("qv")
    )
    corpus = emb.select("vec_id", vec.alias("cv"))
    scored = (
        corpus.crossJoin(F.broadcast(q_side))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine_col(F.col("cv"), F.col("qv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _BATCH_K)
        .select("qid", "vec_id", "cosine_sim")
        .orderBy("qid", F.col("cosine_sim").desc(), "vec_id")
    )


_IVF_LISTS, _IVF_PROBE = 8, 3
_IVF_ITER = 2


def _ivf_train_cte() -> str:
    from osmgraft.ann.search import ivf_train_sql

    return ivf_train_sql(_IVF_LISTS, n_iter=_IVF_ITER)


@q(
    "ann_ivf_top10",
    oracle=f"""
    WITH {_ivf_train_cte()},
         cb AS (SELECT cid, c AS cvec FROM cb{_IVF_ITER}),
         qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0),
         assign AS (SELECT e.vec_id, cb.cid AS list_id,
                           FLOOR(list_cosine_similarity(e.embedding::DOUBLE[], cb.cvec) * 100000 + 0.5) AS c
                    FROM embeddings e CROSS JOIN cb
                    QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                               ORDER BY c DESC, cb.cid) = 1),
         probe AS (SELECT cid FROM cb CROSS JOIN qv
                   ORDER BY FLOOR(list_cosine_similarity(cvec, q) * 100000 + 0.5) DESC, cid
                   LIMIT {_IVF_PROBE}),
         cand AS (SELECT a.vec_id, a.list_id
                  FROM assign a JOIN probe p ON a.list_id = p.cid
                  WHERE a.vec_id <> 0)
    SELECT c.vec_id, CAST(c.list_id AS BIGINT) AS list_id,
           FLOOR(list_cosine_similarity(e.embedding::DOUBLE[], qv.q) * 100000 + 0.5) / 100000
             AS cosine_sim
    FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id CROSS JOIN qv
    ORDER BY cosine_sim DESC, c.vec_id LIMIT 10
    """,
)
def ann_ivf_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantized ANN with a TRAINED codebook: deterministic
    seeded-sample k-means (2 Lloyd iterations, 5-dp assignment rounding,
    6-dp centroid rounding — ann.search.ivf_train_codebook), one-scan
    greatest-of-structs list assignment, nprobe-pruned exact search (the
    partition-pruned scale path beside LSH). The oracle recomputes the
    ENTIRE pipeline in DuckDB SQL — k-means training included
    (ivf_train_sql: unrolled Lloyd CTEs), then assignment, probe choice,
    and final ranking."""
    from osmgraft.ann.search import cosine_col, ivf_build, ivf_probe, ivf_train_codebook

    emb = t(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    cb = ivf_train_codebook(emb, _IVF_LISTS, n_iter=_IVF_ITER)
    probe = ivf_probe(cb, qvec, _IVF_PROBE)
    assigned = ivf_build(emb, cb)
    q_arr = F.array(*[F.lit(v) for v in qvec])
    vec = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    # floor-half snap, same rule as assignment/probe (tie-mode parity)
    sim = F.floor(cosine_col(vec, q_arr) * 100000 + 0.5) / 100000
    return (
        assigned.where(F.col("list_id").isin(probe) & (F.col("vec_id") != 0))
        .select("vec_id", F.col("list_id").cast("long").alias("list_id"), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(10)
    )
