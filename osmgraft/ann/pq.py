"""Product quantization (PQ) — the third vector-compression path.

`int8_quant_recall` covers scalar quantization (4×), `ann_ivf_top10`
covers coarse partitioning; PQ is the codebook compression serving
systems layer UNDER both: split each D-dim vector into M subspaces,
k-means each subspace independently, store M small codes per vector
(here 8 codes ≈ 64× smaller than float32), and answer queries with
asymmetric distance (full-precision query against reconstructed codes).

Training mirrors `ivf_train_codebook`'s cross-engine discipline exactly
— deterministic `id % sample_mod` sample, init by lowest ids, L2
assignment on FLOOR(d²·1e5 + 0.5)-snapped distances with lowest-cid tie
break, per-dimension mean updates snapped to 6 dp, empty clusters keep
their centroid — so `pq_train_sql` can recompute identical codebooks in
DuckDB via unrolled Lloyd CTEs per subspace.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PQ_M = 8  # subspaces
PQ_K = 16  # centroids per subspace (8 x 4-bit codes = 32-bit vector)
PQ_ITERS = 2
PQ_SAMPLE_MOD = 3
PQ_MAX_TRAIN_ROWS = 200_000  # same enforced driver-memory ceiling as IVF


def _snap_d2(d2: np.ndarray) -> np.ndarray:
    return np.floor(d2 * 100000 + 0.5)


def pq_train_codebooks(
    embeddings: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    n_iter: int = PQ_ITERS,
    sample_mod: int = PQ_SAMPLE_MOD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_rows: int = PQ_MAX_TRAIN_ROWS,
) -> list[list[list[float]]]:
    """Train M subspace codebooks; returns [m][cid] -> centroid list.

    Sample-bounded collect with the IVF overflow guard (limit ceiling+1
    rides the training collect; an oversized sample raises with the
    modulus that fits)."""
    sample = embeddings.where(F.col(id_col) % sample_mod == 0)
    rows = (
        sample.orderBy(id_col)
        .select(vec_col)
        .limit(max_train_rows + 1)
        .collect()
    )
    if len(rows) > max_train_rows:
        n_sample = sample.count()
        needed = sample_mod * (n_sample // max_train_rows + 1)
        raise ValueError(
            f"PQ training sample is {n_sample} rows (> max_train_rows="
            f"{max_train_rows}); raise sample_mod to ~{needed}"
        )
    X = np.array([[float(v) for v in r[0]] for r in rows], dtype=np.float64)
    if len(X) < k:
        raise ValueError("training sample smaller than k; lower sample_mod")
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books: list[list[list[float]]] = []
    for mi in range(m):
        S = X[:, mi * sub:(mi + 1) * sub]
        C = S[:k].copy()
        for _ in range(n_iter):
            # snapped squared L2 to every centroid; argmin, lowest cid ties
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(_snap_d2(d2), axis=1)  # first min = lowest cid
            newC = C.copy()
            for cid in range(k):
                mask = assign == cid
                if mask.any():
                    mean = S[mask].mean(axis=0)
                    newC[cid] = np.floor(mean * 1e6 + 0.5) / 1e6
            C = newC
        books.append([[float(x) for x in c] for c in C])
    return books


def pq_train_sql(
    m: int = PQ_M,
    k: int = PQ_K,
    n_iter: int = PQ_ITERS,
    sample_mod: int = PQ_SAMPLE_MOD,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> str:
    """DuckDB CTE chain recomputing pq_train_codebooks exactly: per
    subspace, unrolled Lloyd iterations with the snapped-L2 assignment
    (d² expanded as ip(v,v) − 2·ip(v,c) + ip(c,c)) and 6-dp mean
    updates. The final CTE per subspace is ``cb{m}_{n_iter}`` with
    (cid, c). Splice into an oracle WITH-chain."""
    sub = dim // m
    parts = []
    for mi in range(m):
        lo = mi * sub + 1
        hi = (mi + 1) * sub
        parts.append(
            f"tr{mi} AS (SELECT {id_col} AS vid, "
            f"list_slice({vec_col}::DOUBLE[], {lo}, {hi}) AS v "
            f"FROM {table} WHERE {id_col} % {sample_mod} = 0)"
        )
        parts.append(
            f"cb{mi}_0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vid) - 1 AS cid, "
            f"v AS c FROM (SELECT * FROM tr{mi} ORDER BY vid LIMIT {k}))"
        )
        for it in range(1, n_iter + 1):
            prev, cur = f"cb{mi}_{it - 1}", f"cb{mi}_{it}"
            d2 = (
                "list_inner_product(t.v, t.v) "
                "- 2 * list_inner_product(t.v, p.c) "
                "+ list_inner_product(p.c, p.c)"
            )
            parts.append(
                f"a{mi}_{it} AS (SELECT t.vid, t.v, p.cid "
                f"FROM tr{mi} t CROSS JOIN {prev} p "
                f"QUALIFY ROW_NUMBER() OVER (PARTITION BY t.vid ORDER BY "
                f"FLOOR(({d2}) * 100000 + 0.5) ASC, p.cid) = 1)"
            )
            parts.append(
                f"m{mi}_{it} AS (SELECT cid, LIST(mv ORDER BY dim) AS c FROM ("
                f"SELECT cid, dim, FLOOR(AVG(val) * 1000000 + 0.5) / 1000000 "
                f"AS mv FROM (SELECT cid, UNNEST(v) AS val, "
                f"UNNEST(range(1, len(v) + 1)) AS dim FROM a{mi}_{it}) "
                f"GROUP BY cid, dim) GROUP BY cid)"
            )
            parts.append(
                f"{cur} AS (SELECT p.cid, COALESCE(mm.c, p.c) AS c "
                f"FROM {prev} p LEFT JOIN m{mi}_{it} mm USING (cid))"
            )
    return ",\n    ".join(parts)


def pq_encode(
    embeddings: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector its M codes and reconstruction — one scan,
    centroids as ONE nested-array literal per subspace, argmin via
    `array_min` over a transform'd (snapped d², cid) struct array
    (lexicographic min == lowest-cid ties); no join, no shuffle.

    The codebook rides into the plan as a single nested literal and the
    argmin as one higher-order expression: the earlier per-centroid
    Column construction (k·m literal arrays built through py4j) spent
    ~16 s of single-threaded DRIVER time assembling the plan before any
    task ran — plan-build cost, invisible to .explain, fatal to a
    100 TB run only in that it serializes with everything else on the
    driver. Arithmetic is unchanged: same d² expansion, same
    floor-snap, same tie-break, so codes and parity are identical."""
    m = len(books)
    dim = len(books[0][0]) * m
    sub = dim // m
    # cast once in its own projection: inlining transform(embedding)
    # into every distance term repeats the subtree 3·k·m times in the
    # analyzed tree and the analyzer pass dominates plan-build time
    base = embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("v"),
    )
    cols = [F.col(id_col), F.col("v")]
    recon_parts = []
    for mi, book in enumerate(books):
        bk = _book_lit(book)
        sv = F.slice(F.col("v"), mi * sub + 1, sub)
        scored = F.transform(
            F.sequence(F.lit(0), F.lit(len(book) - 1)),
            _pq_score_fn(bk, sv),
        )
        code = F.array_min(scored)["cid"]
        cols.append(code.alias(f"code{mi}"))
        recon_parts.append(
            F.element_at(bk, F.col(f"code{mi}") + 1)
        )
    out = base.select(*cols)
    return out.select(
        id_col, "v", *[f"code{mi}" for mi in range(m)],
        F.concat(*recon_parts).alias("recon"),
    )


def _d2_col(a, b):
    from osmgraft.ann.search import _dot

    return _dot(a, a) - 2 * _dot(a, b) + _dot(b, b)


def _book_lit(book):
    """One subspace codebook as a single nested-array literal built from
    ONE SQL string (one py4j round trip; ``F.lit`` on a nested list still
    issues a py4j call per element). ``repr`` is the shortest exact
    IEEE-754 round trip and string→DOUBLE casts parse exactly, so the
    literal values are bit-identical to the trained floats."""
    return F.expr(
        "array("
        + ", ".join(
            "array("
            + ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in c)
            + ")"
            for c in book
        )
        + ")"
    )


def _pq_score_fn(bk, sv):
    """(snapped d², cid) struct for one centroid id — closure keeps the
    lambda unary (PySpark dispatches higher-order arity by signature)."""
    return lambda cid: F.struct(
        F.floor(
            _d2_col(sv, F.element_at(bk, cid + 1)) * 100000 + 0.5
        ).alias("d"),
        cid.alias("cid"),
    )
