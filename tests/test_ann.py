"""ANN quality: approximate paths (LSH buckets, IVF lists) measured against
the exact brute-force baseline — structural determinism + recall floors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmgraft.ann.search import (
    brute_force_topk,
    ivf_build,
    ivf_codebook,
    ivf_probe,
    ivf_topk,
    ivf_train_codebook,
    ivf_train_sql,
)
from tests.conftest import SF_CORRECT

K = 10


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(v) for v in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]


def test_ivf_assignment_total_and_deterministic(emb):
    cb = ivf_codebook(emb, n_lists=8)
    assigned = ivf_build(emb, cb)
    n = emb.count()
    assert assigned.count() == n  # total: every vector lands in exactly one list
    assert assigned.where(~F.col("list_id").between(1, 8)).count() == 0
    a = {r["vec_id"]: r["list_id"] for r in assigned.collect()}
    b = {r["vec_id"]: r["list_id"] for r in ivf_build(emb, cb).collect()}
    assert a == b
    # each centroid belongs to its own list (cosine with itself = 1)
    cent_ids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(8).collect()]
    for cid, vid in enumerate(cent_ids, start=1):
        assert a[vid] == cid


def test_ivf_recall_vs_bruteforce(emb, qvec):
    """Round-2 gate (VERDICT r1 item 4): recall@10 of the TRAINED-codebook
    IVF path vs exact brute force."""
    exact = {r["vec_id"] for r in brute_force_topk(emb.where(F.col("vec_id") != 0), qvec, k=K).collect()}
    got = {r["vec_id"] for r in ivf_topk(emb, qvec, k=K, n_lists=8, nprobe=3).collect()}
    got.discard(0)
    recall = len(exact & got) / K
    assert recall >= 0.7, recall  # nprobe=3/8 floor, trained centroids
    # full probe == exact (sanity: pruning is the only approximation)
    full = {r["vec_id"] for r in ivf_topk(emb, qvec, k=K + 1, n_lists=8, nprobe=8).collect()}
    full.discard(0)
    assert exact <= full


def test_ivf_kmeans_training_cross_engine(emb):
    """The numpy trainer and the unrolled-Lloyd DuckDB SQL must produce
    bit-identical centroids (5-dp assignment + 6-dp mean rounding absorb
    summation-order differences)."""
    import duckdb
    import numpy as np

    cb = ivf_train_codebook(emb, 8)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_CORRECT}/embeddings.parquet'"
    )
    sql = "WITH " + ivf_train_sql(8) + " SELECT cid, c FROM cb2 ORDER BY cid"
    rows = con.sql(sql).fetchall()
    assert len(rows) == 8
    for (cid, c), (pcid, pc) in zip(rows, cb):
        assert cid == pcid
        assert np.array_equal(np.array(c), np.array(pc))
    # trained centroids differ from the raw init (training moved them)
    init = ivf_codebook(emb, 8)
    moved = sum(
        not np.allclose(np.array(cv), np.array(tv), atol=1e-9)
        for (_, cv), (_, tv) in zip(init, cb)
    )
    assert moved >= 6


def test_ivf_probe_orders_by_centroid_similarity(emb, qvec):
    cb = ivf_codebook(emb, n_lists=8)
    p1 = ivf_probe(cb, qvec, 1)
    p8 = ivf_probe(cb, qvec, 8)
    assert len(p8) == 8 and len(set(p8)) == 8
    assert p8[0] == p1[0]
    # query vector == centroid 1's vector (vec_id 0) ⇒ its list probes first
    assert p1[0] == 1


def test_lsh_planted_twin_recall(spark):
    """Hyperplane LSH guarantees collision probability (1 - θ/π)^bits — high
    only for genuinely similar vectors. The testdata embeddings are
    near-uniform (max pairwise cosine ≈ 0.51), where bucket pruning
    correctly discards everything; the contract LSH entry is therefore
    exercised here on planted noisy twins (cos ≈ 0.99), which MUST be
    retrieved from the query's bucket neighborhood."""
    import numpy as np

    from osmgraft.ann.search import lsh_bucket_topk

    rng = np.random.default_rng(11)
    dim, n = 16, 400
    base = rng.normal(size=(n, dim))
    twins = base[:20] + rng.normal(scale=0.02, size=(20, dim))  # ids 1000+
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [(1000 + i, [float(x) for x in v]) for i, v in enumerate(twins)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    hits = 0
    for i in range(20):
        q = [float(x) for x in base[i]]
        got = {
            r["vec_id"]
            for r in lsh_bucket_topk(
                df.where(F.col("vec_id") != i), q, k=5, n_bits=12, multiprobe_hamming=1
            ).collect()
        }
        hits += (1000 + i) in got
    assert hits >= 16, hits  # ≥80% twin recall through bucket pruning


def test_lsh_probe_widening_monotone(emb, qvec):
    """More multiprobe bit-flips can only grow the candidate set."""
    from osmgraft.ann.search import lsh_bucket_topk

    base = emb.where(F.col("vec_id") != 0)
    r0 = {r["vec_id"] for r in lsh_bucket_topk(base, qvec, k=50, n_bits=8, multiprobe_hamming=0).collect()}
    r1 = {r["vec_id"] for r in lsh_bucket_topk(base, qvec, k=50, n_bits=8, multiprobe_hamming=1).collect()}
    assert r0 <= r1 or len(r1) == 50


class TestBlockedNeardupPairs:
    """neardup_pairs_blocked must equal the all-pairs result at ANY
    threshold — the blocking is lossless by the triangle inequality on
    angular distance (ann/pairs.py), not probabilistic LSH recall."""

    @pytest.fixture(scope="class")
    def clustered(self, spark):
        # 12 cluster centers in 8 dims, 16 jittered members each: hundreds
        # of true near-dup pairs at 0.9 plus cross-cluster pairs near the
        # 0.5 boundary — exercises band-edge and tie cases
        import numpy as np

        rng = np.random.default_rng(7)
        rows = []
        vid = 0
        for _c in range(12):
            center = rng.standard_normal(8)
            center /= np.linalg.norm(center)
            for _m in range(16):
                v = center + rng.standard_normal(8) * rng.choice([0.02, 0.3, 0.9])
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def _allpairs(self, emb, thr):
        from osmgraft.ann.search import _dot, _norm

        vec = F.transform("embedding", lambda v: v.cast("double"))
        a = emb.select(F.col("vec_id").alias("vec_a"), vec.alias("va"), _norm(vec).alias("na"))
        b = emb.select(F.col("vec_id").alias("vec_b"), vec.alias("vb"), _norm(vec).alias("nb"))
        sim = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        return (
            a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
            .where(sim >= thr)
            .select("vec_a", "vec_b", F.round(sim, 4).alias("cosine_sim"))
        )

    @pytest.mark.parametrize("thr", [0.5, 0.9])
    def test_blocked_equals_allpairs(self, clustered, thr):
        from osmgraft.ann.pairs import neardup_pairs_blocked

        blocked = neardup_pairs_blocked(clustered, threshold=thr)
        ap = self._allpairs(clustered, thr)
        n_ap = ap.count()
        assert n_ap > 50, "fixture must produce a dense pair set"
        assert blocked.exceptAll(ap).count() == 0
        assert ap.exceptAll(blocked).count() == 0

    def test_blocked_plan_is_cell_cogroup(self, clustered):
        """Refine is a cogrouped GEMM: both sides exchange ONCE on the band
        cell key and meet in FlatMapCoGroupsInPandas — no nested-loop or
        cartesian pair expansion anywhere."""
        from osmgraft.ann.pairs import neardup_pairs_blocked

        plan = (
            neardup_pairs_blocked(clustered, threshold=0.5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "FlatMapCoGroupsInPandas" in plan
        assert plan.count("hashpartitioning(_cell") == 2

    def test_blocked_splits_lossless(self, clustered):
        """Hot-cell skew splitting must not change the result set."""
        from osmgraft.ann.pairs import neardup_pairs_blocked

        base = {
            (r.vec_a, r.vec_b, r.cosine_sim)
            for r in neardup_pairs_blocked(clustered, threshold=0.5).collect()
        }
        split = {
            (r.vec_a, r.vec_b, r.cosine_sim)
            for r in neardup_pairs_blocked(
                clustered, threshold=0.5, splits=4
            ).collect()
        }
        assert base == split and len(base) > 50


def test_ivf_training_sample_ceiling(spark):
    """The max_train_rows guard must refuse an oversized training collect
    (round 3): the error names a modulus that would fit."""
    from osmgraft.ann.search import ivf_train_codebook

    df = spark.range(600).select(
        F.col("id").alias("vec_id"),
        F.array(*[ (F.col("id") % (i + 3)).cast("double") for i in range(4) ]).alias("embedding"),
    )
    with pytest.raises(ValueError, match="max_train_rows"):
        ivf_train_codebook(df, n_lists=4, sample_mod=1, max_train_rows=100)
    # and the fitting modulus from the message keeps training usable
    cb = ivf_train_codebook(df, n_lists=4, sample_mod=7, max_train_rows=100)
    assert len(cb) == 4


def test_int8_quant_recall_invariants(spark):
    """Int8 scalar quantization: (a) quantized steps stay in [-127, 127]
    and scaling a vector by any positive constant leaves its quantized
    form unchanged (scale cancels); (b) the audit's recall@10 stays high
    and the within-top-10 cosine error small (64-dim maxabs int8 is a
    ~1e-3-grade approximation)."""
    from osmgraft.contract_text import int8_quant_recall

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    s = F.greatest(F.array_max(F.transform(v, F.abs)), F.lit(1.0e-12))
    qv = F.transform(v, lambda x: F.floor(x * 127.0 / s + 0.5))
    v2 = F.transform(F.col("embedding"), lambda x: x.cast("double") * 3.5)
    s2 = F.greatest(F.array_max(F.transform(v2, F.abs)), F.lit(1.0e-12))
    qv2 = F.transform(v2, lambda x: F.floor(x * 127.0 / s2 + 0.5))
    chk = emb.select(
        F.array_max(F.transform(qv, F.abs)).alias("maxq"),
        (qv == qv2).alias("scale_invariant"),
    ).collect()
    assert all(r["maxq"] <= 127 for r in chk)
    assert all(r["scale_invariant"] for r in chk)

    rows = int8_quant_recall(spark, SF_CORRECT).collect()
    assert rows, "no probe queries"
    avg_recall = sum(r["recall_at10"] for r in rows) / len(rows)
    assert avg_recall >= 0.8, avg_recall
    assert all(r["mean_abs_sim_err"] < 0.01 for r in rows)


class TestProductQuantization:
    def test_codebooks_deterministic_and_shaped(self, spark):
        from osmgraft.ann.pq import PQ_K, PQ_M, pq_train_codebooks
        from tests.conftest import SF_CORRECT

        emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
        b1 = pq_train_codebooks(emb)
        b2 = pq_train_codebooks(emb)
        assert b1 == b2  # no RNG anywhere
        assert len(b1) == PQ_M
        for book in b1:
            assert len(book) == PQ_K
            assert all(len(c) == 64 // PQ_M for c in book)

    def test_training_sample_ceiling_raises(self, spark):
        import pytest as _pytest

        from osmgraft.ann.pq import pq_train_codebooks
        from tests.conftest import SF_CORRECT

        emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
        with _pytest.raises(ValueError, match="max_train_rows"):
            pq_train_codebooks(emb, max_train_rows=10)

    def test_pq_beats_random_ranking_and_reconstruction_reduces_error(
        self, spark
    ):
        """PQ ADC recall@10 must beat the random-ranking expectation by a
        wide margin (random would be ~10/N ≈ 0.02), and reconstruction
        error must be strictly smaller than the zero-vector baseline."""
        import numpy as np

        from osmgraft.ann.pq import pq_encode, pq_train_codebooks
        from osmgraft.contract_text import pq_quant_recall
        from tests.conftest import SF_CORRECT

        rows = pq_quant_recall(spark, SF_CORRECT).collect()
        assert rows
        mean_recall = sum(r["recall_at10"] for r in rows) / len(rows)
        assert mean_recall >= 0.2

        emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
        books = pq_train_codebooks(emb)
        enc = pq_encode(emb, books).select("v", "recon").collect()
        err = 0.0
        base = 0.0
        for r in enc:
            x = np.array(r["v"])
            xh = np.array(r["recon"])
            err += float(((x - xh) ** 2).sum())
            base += float((x ** 2).sum())
        assert err < base * 0.9


def test_mrl_identity_rung_and_monotone_recall(spark):
    """d=64 (full vector) must have recall exactly 1.0 and zero error;
    recall must be non-decreasing in truncation dim."""
    from osmgraft.contract_text import mrl_trunc_recall
    from tests.conftest import SF_CORRECT

    rows = {
        r["trunc_dim"]: r
        for r in mrl_trunc_recall(spark, SF_CORRECT).collect()
    }
    assert set(rows) == {16, 32, 64}
    assert rows[64]["mean_recall_at10"] == 1.0
    assert rows[64]["mean_abs_sim_err"] == 0.0
    assert (
        rows[16]["mean_recall_at10"]
        <= rows[32]["mean_recall_at10"]
        <= rows[64]["mean_recall_at10"]
    )
    assert rows[16]["mean_abs_sim_err"] >= rows[32]["mean_abs_sim_err"]
