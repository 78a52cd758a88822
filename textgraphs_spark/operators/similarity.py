"""Similarity search over embedding columns (array<float>).

* brute-force top-k cosine — the exactness baseline; one shuffle
  (crossJoin pruned by Catalyst into a broadcast nested loop when the
  query side is small), dot products entirely in JVM higher-order
  functions. Verifiable against DuckDB's list_cosine_similarity.
* LSH-bucketed ANN — random-hyperplane signs bucket vectors; only
  same-bucket (or neighboring-bucket) pairs are scored. The scale path:
  bucket sizes are bounded, the join shuffles on the bucket key.

Hyperplanes are derived deterministically from a seed via md5 — no RNG
state, so executors regenerate identical planes with no broadcast needed.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .scoring import cosine_expr


def _finite(col: str) -> F.Column:
    """Keep only rows with a usable similarity: Spark's descending sort
    places NaN ABOVE every real value, so one corrupt embedding (NaN
    element) would otherwise sit at rank 1 of every query's top-k —
    and in IVF, a NaN assignment poisons the centroid average for its
    whole cell. NULL cosine (zero-norm or NULL vector, via try_divide)
    is "no signal", not a neighbor."""
    return F.col(col).isNotNull() & ~F.isnan(F.col(col))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    q_vec: str = "q_vec",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Tie-break: (cosine desc, corpus id asc) — total order, reproducible.
    """
    joined = queries.crossJoin(corpus)
    scored = joined.withColumn("cosine", cosine_expr(q_vec, c_vec)).filter(
        _finite("cosine")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(q_id).orderBy(F.desc(F.round("cosine", 9)), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes from md5 bytes."""
    planes = []
    for p in range(n_planes):
        vec = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            # two uniform draws -> Box-Muller normal
            u1 = (int(h[:8], 16) + 1) / (2**32 + 2)
            u2 = (int(h[8:16], 16) + 1) / (2**32 + 2)
            vec.append(math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.pi * u2))
        planes.append(vec)
    return planes


def _multi_bucket_udf(planes_tables):
    """Pandas UDF: vec → array of per-table LSH buckets, as ONE numpy
    matmul against every plane of every table.

    The previous formulation — per-plane ``aggregate(zip_with(...))``
    higher-order functions — is evaluated INTERPRETED by Spark (no
    codegen for lambda functions), costing n_tables × n_planes × dim
    interpreted ops per row (≈2 048 at ann defaults); the matmul is one
    BLAS call per Arrow batch. Sign semantics are identical: bit i set
    iff dot(vec, plane_i) >= 0; rows whose vector is NULL or has the
    wrong length get bucket 0 in every table (the null-propagation
    behavior of the old expression).
    """
    import numpy as np

    P = np.asarray(planes_tables, dtype="float64")  # (T, p, dim)
    n_tab, n_pl, dim_ = P.shape
    flat = P.reshape(n_tab * n_pl, dim_)
    weights = (1 << np.arange(n_pl)).astype("int64")

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        import numpy as np

        n = len(vecs)
        ok = np.fromiter(
            (v is not None and len(v) == dim_ for v in vecs),
            dtype=bool, count=n,
        )
        out = np.zeros((n, n_tab), dtype="int64")
        if ok.any():
            x = np.array([np.asarray(v, dtype="float64") for v in vecs[ok]])
            dots = x @ flat.T                        # (m, T*p)
            bits = (dots >= 0).reshape(-1, n_tab, n_pl)
            out[ok] = bits @ weights
        return pd.Series([row.astype("int32").tolist() for row in out])

    return buckets


def lsh_bucket(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Add ``bucket: int`` — sign pattern across random hyperplanes
    (vectorized: one matmul per Arrow batch, see ``_multi_bucket_udf``)."""
    udf = _multi_bucket_udf([_hyperplanes(dim, n_planes, seed)])
    return df.withColumn("bucket", udf(F.col(vec_col)).getItem(0))


def _multi_table_buckets(df: DataFrame, vec_col: str, *, dim: int, n_planes: int, n_tables: int, seed: int) -> DataFrame:
    """Explode each vector into (table_id, bucket) rows across hash tables.

    Multiple independent tables are the standard LSH recall lever: a true
    neighbor missed by one table's cut is caught by another. Candidate
    volume grows linearly with tables, never quadratically with data.

    ONE vectorized UDF pass computes every table's bucket (vs the old
    n_tables interpreted passes unioned together); posexplode fans the
    result out to (table_id, bucket) rows.
    """
    planes_tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]
    udf = _multi_bucket_udf(planes_tables)
    with_b = df.withColumn("_bks", udf(F.col(vec_col)))
    return with_b.select(
        *df.columns, F.posexplode("_bks").alias("table_id", "bucket")
    )


def ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    q_vec: str = "q_vec",
    c_vec: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only pairs sharing a bucket in at least
    one of ``n_tables`` hash tables.

    Recall/cost tradeoff via (n_planes, n_tables). The equi-join on
    (table_id, bucket) replaces the cross join — this is what survives
    10^9 vectors.
    """
    qb = _multi_table_buckets(
        queries.withColumnRenamed(q_vec, "_qv"), "_qv",
        dim=dim, n_planes=n_planes, n_tables=n_tables, seed=seed,
    )
    cb = _multi_table_buckets(corpus, c_vec, dim=dim, n_planes=n_planes, n_tables=n_tables, seed=seed)
    cand = (
        qb.select("table_id", "bucket", q_id, "_qv")
        .join(cb.select("table_id", "bucket", c_id, c_vec), ["table_id", "bucket"])
        .dropDuplicates([q_id, c_id])
    )
    scored = cand.withColumn("cosine", cosine_expr("_qv", c_vec)).filter(
        _finite("cosine")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(q_id).orderBy(F.desc(F.round("cosine", 9)), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate vectors (cosine >= threshold) via LSH buckets."""
    b = lsh_bucket(df, vec_col=vec_col, dim=dim, n_planes=n_planes, seed=seed)
    a = b.select("bucket", F.col(id_col).alias("left_id"), F.col(vec_col).alias("lv"))
    c = b.select("bucket", F.col(id_col).alias("right_id"), F.col(vec_col).alias("rv"))
    return (
        a.join(c, "bucket")
        .filter(F.col("left_id") < F.col("right_id"))
        .withColumn("cosine", cosine_expr("lv", "rv"))
        .filter(F.col("cosine") >= threshold)
        .select("left_id", "right_id", F.round("cosine", 6).alias("cosine"))
        .distinct()
    )


def _planes_values_sql(*, dim: int, n_planes: int, n_tables: int, seed: int) -> str:
    """Inline the deterministic hyperplanes as a SQL VALUES table
    (table_id, plane_id, v DOUBLE[]). repr() round-trips doubles exactly,
    so both engines dot against bit-identical plane vectors."""
    rows = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        for i, p in enumerate(planes):
            vec = "[" + ", ".join(repr(float(x)) for x in p) + "]"
            rows.append(f"({t}, {i}, {vec})")
    return ",\n   ".join(rows)


def _bucket_cte(src: str, id_col: str, vec_col: str, *, n_tables: int) -> str:
    """(id, vec) per table → LSH bucket = sum of sign bits, as in
    ``lsh_bucket``/``_multi_table_buckets``."""
    return f"""(
  SELECT s.{id_col}, p.table_id,
         CAST(sum(CASE WHEN list_dot_product(s.{vec_col}, p.v) >= 0
                       THEN (1 << p.plane_id) ELSE 0 END) AS INT) AS bucket
  FROM {src} s, planes p
  GROUP BY s.{id_col}, p.table_id
)"""


def ann_oracle_sql(
    *,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
    max_q: int = 20,
) -> str:
    """DuckDB SQL reproducing ``ann_topk`` on the embeddings table with
    query vectors ``vec_id < max_q`` — same inlined hyperplanes, same
    multi-table bucket join, same (round(cos,9) DESC, id ASC) ranking."""
    planes = _planes_values_sql(dim=dim, n_planes=n_planes, n_tables=n_tables, seed=seed)
    return f"""
WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q0 AS (SELECT vec_id AS q_id, emb AS qv FROM e0 WHERE vec_id < {max_q}),
planes(table_id, plane_id, v) AS (VALUES
   {planes}
),
cb AS {_bucket_cte('e0', 'vec_id', 'emb', n_tables=n_tables)},
qb AS {_bucket_cte('q0', 'q_id', 'qv', n_tables=n_tables)},
cand AS (
  SELECT DISTINCT qb.q_id, cb.vec_id
  FROM qb JOIN cb ON qb.table_id = cb.table_id AND qb.bucket = cb.bucket
),
scored AS (
  SELECT c.q_id, c.vec_id,
         list_dot_product(q0.qv, e0.emb)
           / (sqrt(list_dot_product(q0.qv, q0.qv)) * sqrt(list_dot_product(e0.emb, e0.emb))) AS cos_raw
  FROM cand c
  JOIN q0 ON q0.q_id = c.q_id
  JOIN e0 ON e0.vec_id = c.vec_id
),
ranked AS (
  SELECT q_id, vec_id, cos_raw,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY round(cos_raw, 9) DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id, vec_id, round(cos_raw, 6) AS cosine, rank
FROM ranked WHERE rank <= {k}
"""


def near_dup_lsh_oracle_sql(
    *,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 6,
    seed: int = 42,
) -> str:
    """DuckDB SQL reproducing ``embedding_near_dup_pairs`` (single-table
    LSH bucketing + cosine threshold)."""
    planes = _planes_values_sql(dim=dim, n_planes=n_planes, n_tables=1, seed=seed)
    return f"""
WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
planes(table_id, plane_id, v) AS (VALUES
   {planes}
),
b AS {_bucket_cte('e0', 'vec_id', 'emb', n_tables=1)},
pairs AS (
  SELECT DISTINCT a.vec_id AS left_id, c.vec_id AS right_id
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
),
scored AS (
  SELECT p.left_id, p.right_id,
         list_dot_product(l.emb, r.emb)
           / (sqrt(list_dot_product(l.emb, l.emb)) * sqrt(list_dot_product(r.emb, r.emb))) AS cos_raw
  FROM pairs p
  JOIN e0 l ON l.vec_id = p.left_id
  JOIN e0 r ON r.vec_id = p.right_id
)
SELECT left_id, right_id, round(cos_raw, 6) AS cosine
FROM scored WHERE cos_raw >= {threshold}
"""


def ivf_oracle_sql(
    *,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    max_q: int = 20,
) -> str:
    """DuckDB SQL reproducing ``ivf_topk`` (kmeans_iters=1) on the
    embeddings table: md5-ordered centroid seed, one unrolled Lloyd
    refinement, nprobe cell probing, exact scoring inside probed cells."""
    cos = (
        "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
        "* sqrt(list_dot_product({b}, {b})))"
    )
    return f"""
WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q0 AS (SELECT vec_id AS q_id, emb AS qv FROM e0 WHERE vec_id < {max_q}),
seed AS (
  SELECT vec_id, emb FROM e0 ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {n_cells}
),
cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cell, emb AS cvec FROM seed
),
assign0 AS (
  SELECT vec_id, cell FROM (
    SELECT e0.vec_id, c.cell,
           row_number() OVER (PARTITION BY e0.vec_id
                              ORDER BY round({cos.format(a='e0.emb', b='c.cvec')}, 9) DESC,
                                       c.cell ASC) AS rn
    FROM e0, cent0 c
  ) WHERE rn = 1
),
cent1 AS (
  SELECT cell, list(m ORDER BY pos) AS cvec FROM (
    SELECT a.cell, CAST(j.j AS INT) AS pos, avg(e0.emb[CAST(j.j AS INT)]) AS m
    FROM assign0 a JOIN e0 ON e0.vec_id = a.vec_id,
         unnest(range(1, {dim} + 1)) AS j(j)
    GROUP BY a.cell, j.j
  ) GROUP BY cell
),
corpus_cells AS (
  SELECT vec_id, cell FROM (
    SELECT e0.vec_id, c.cell,
           row_number() OVER (PARTITION BY e0.vec_id
                              ORDER BY round({cos.format(a='e0.emb', b='c.cvec')}, 9) DESC,
                                       c.cell ASC) AS rn
    FROM e0, cent1 c
  ) WHERE rn = 1
),
query_cells AS (
  SELECT q_id, cell FROM (
    SELECT q0.q_id, c.cell,
           row_number() OVER (PARTITION BY q0.q_id
                              ORDER BY round({cos.format(a='q0.qv', b='c.cvec')}, 9) DESC,
                                       c.cell ASC) AS rn
    FROM q0, cent1 c
  ) WHERE rn <= {nprobe}
),
scored AS (
  SELECT qc.q_id, cc.vec_id,
         {cos.format(a='q0.qv', b='e0.emb')} AS cos_raw
  FROM query_cells qc
  JOIN corpus_cells cc ON cc.cell = qc.cell
  JOIN q0 ON q0.q_id = qc.q_id
  JOIN e0 ON e0.vec_id = cc.vec_id
),
ranked AS (
  SELECT q_id, vec_id, cos_raw,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY round(cos_raw, 9) DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id, vec_id, round(cos_raw, 6) AS cosine, rank
FROM ranked WHERE rank <= {k}
"""


def _assign_cells(vectors: DataFrame, cents: DataFrame, id_col: str,
                  vec_col: str, keep: int) -> DataFrame:
    """argmax-cosine cell assignment against a broadcast centroid frame."""
    from pyspark.sql.window import Window

    scored = vectors.join(F.broadcast(cents), how="cross").withColumn(
        "_cs", cosine_expr(vec_col, "_cvec")
    ).filter(_finite("_cs"))
    w = Window.partitionBy(id_col).orderBy(
        F.desc(F.round("_cs", 9)), F.asc("_cell")
    )
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= keep)
        .drop("_cvec", "_cs", "_r")
    )


def ivf_cell_assignments(
    corpus: DataFrame,
    *,
    n_cells: int = 16,
    kmeans_iters: int = 1,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(corpus_cells, centroids): the IVF coarse quantizer alone —
    md5-ordered deterministic seed, ``kmeans_iters`` Lloyd refinements,
    one cell per corpus vector. SHARED by ivf_topk (probing) and
    semdedup_clusters (within-cell near-dup removal) so both surfaces
    quantize identically.
    """
    from pyspark.sql.window import Window

    centroids = (
        corpus.orderBy(F.md5(F.col(c_id).cast("string").cast("binary")))
        .limit(n_cells)
        .select(
            # unpartitioned window is BOUNDED here: it numbers the
            # already-limit(n_cells)-ed seed frame (<= n_cells rows),
            # never the corpus — the WindowExec single-partition
            # warning it triggers is a fixed-size frame, not a funnel
            F.row_number().over(Window.orderBy(c_id)).alias("_cell"),
            F.col(c_vec).alias("_cvec"),
        )
    ).localCheckpoint()

    for _ in range(kmeans_iters):
        assigned = _assign_cells(corpus, centroids, c_id, c_vec, 1)
        centroids = (
            assigned.select("_cell", F.posexplode(c_vec).alias("_pos", "_v"))
            .groupBy("_cell", "_pos").agg(F.avg("_v").alias("_m"))
            .groupBy("_cell")
            .agg(F.array_sort(F.collect_list(F.struct("_pos", "_m"))).alias("_s"))
            .select("_cell", F.expr("transform(_s, x -> x._m)").alias("_cvec"))
        ).localCheckpoint()

    return _assign_cells(corpus, centroids, c_id, c_vec, 1), centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 1,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    q_vec: str = "q_vec",
    c_vec: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into ``n_cells`` cells,
    probe the ``nprobe`` nearest cells per query, exact-score only there.

    The FAISS-IVF recipe as pure DataFrame ops:

    * centroid init = the ``n_cells`` corpus vectors with the smallest
      ``md5(id)`` — a deterministic uniform sample, no RNG state, and
      reproducible by SQL engines (unlike seeded xxhash64);
    * ``kmeans_iters`` Lloyd refinements: assign (broadcast centroids,
      argmax cosine via one window) -> new centroid = element-wise mean
      (``groupBy(cell)`` + ``posexplode`` average), all JVM-side;
    * search cost per query is ``nprobe/n_cells`` of the corpus instead
      of all of it; the cell join shuffles on the cell id, so cells are
      the unit of parallelism at scale (size n_cells ~ sqrt(N)).
    """
    from pyspark.sql.window import Window

    corpus_cells, centroids = ivf_cell_assignments(
        corpus, n_cells=n_cells, kmeans_iters=kmeans_iters,
        c_id=c_id, c_vec=c_vec,
    )
    query_cells = _assign_cells(queries, centroids, q_id, q_vec, nprobe)

    scored = query_cells.join(corpus_cells, "_cell").withColumn(
        "cosine", cosine_expr(q_vec, c_vec)
    ).filter(_finite("cosine"))
    w = Window.partitionBy(q_id).orderBy(F.desc(F.round("cosine", 9)), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


def topk_recall(
    exact: DataFrame,
    approx: DataFrame,
    method: str,
    *,
    k: int,
    q_id: str = "q_id",
    c_id: str = "vec_id",
) -> DataFrame:
    """Per-query recall@k of an approximate top-k result against the
    exact one — (method, q_id, n_matched, recall). The evaluation
    surface for the exact-vs-ANN tradeoff: run it on a SAMPLED query
    set (queries are the small side by construction) and read off how
    much the bucketed scale path gives up.

    Scale: one left join on (q_id, c_id) between two k-bounded frames —
    both inputs carry k rows per query, so cost is O(|queries| * k)
    regardless of corpus size.
    """
    hits = exact.select(q_id, c_id).join(
        approx.select(q_id, c_id).withColumn("_hit", F.lit(1)),
        [q_id, c_id],
        "left",
    )
    return (
        hits.groupBy(q_id)
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_matched"))
        .select(
            F.lit(method).alias("method"),
            F.col(q_id),
            "n_matched",
            F.round(F.col("n_matched") / float(k), 6).alias("recall"),
        )
    )


def semdedup_clusters(
    corpus: DataFrame,
    *,
    n_cells: int = 8,
    threshold: float = 0.9,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-dup clusters by
    IVF-quantizing the embedding corpus and joining pairs ONLY within
    a cell — (keep_id, n_vecs, member_ids) per cluster of transitively
    cosine->=threshold vectors, keeper = min id. The embedding-space
    sibling of minhash_dedup_clusters: catches paraphrases exact and
    shingle channels cannot.

    Scale: the pairwise join is bounded per cell (cells ~ sqrt(N) at
    proper n_cells), never corpus-wide; closure inherits the
    size-adaptive connected components. The documented approximation
    vs all-pairs: near-dups straddling a cell boundary are missed —
    the standard SemDeDup trade, tunable via n_cells.
    """
    from .components import connected_components

    cells, _ = ivf_cell_assignments(
        corpus, n_cells=n_cells, kmeans_iters=1, c_id=c_id, c_vec=c_vec
    )
    a = cells.select("_cell", F.col(c_id).alias("left_id"),
                     F.col(c_vec).alias("lv"))
    b = cells.select("_cell", F.col(c_id).alias("right_id"),
                     F.col(c_vec).alias("rv"))
    pairs = (
        a.join(b, "_cell")
        .filter(F.col("left_id") < F.col("right_id"))
        .withColumn("_cos", cosine_expr("lv", "rv"))
        .filter(_finite("_cos"))
        .filter(F.round("_cos", 9) >= threshold)
        .select("left_id", "right_id")
    )
    cc = connected_components(
        pairs.select(F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    )
    return (
        cc.groupBy("component")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.concat_ws("|", F.sort_array(F.collect_list("node"))).alias("member_ids"),
        )
        .select(F.col("component").alias("keep_id"), "n_vecs", "member_ids")
        .orderBy("keep_id")
    )


def semdedup_oracle_sql(
    *, n_cells: int = 8, threshold: float = 0.9, dim: int = 64,
) -> str:
    """DuckDB twin of ``semdedup_clusters``: the SAME md5-seeded one-
    Lloyd-iteration cell chain as ivf_oracle_sql, within-cell cosine
    pairs, recursive closure, min-id keeper."""
    cos = (
        "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
        "* sqrt(list_dot_product({b}, {b})))"
    )
    return f"""WITH RECURSIVE
e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
seed AS (
  SELECT vec_id, emb FROM e0 ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {n_cells}
),
cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cell, emb AS cvec FROM seed
),
assign0 AS (
  SELECT vec_id, cell FROM (
    SELECT e0.vec_id, c.cell,
           row_number() OVER (PARTITION BY e0.vec_id
                              ORDER BY round({cos.format(a='e0.emb', b='c.cvec')}, 9) DESC,
                                       c.cell ASC) AS rn
    FROM e0, cent0 c
  ) WHERE rn = 1
),
cent1 AS (
  SELECT cell, list(m ORDER BY pos) AS cvec FROM (
    SELECT a.cell, CAST(j.j AS INT) AS pos, avg(e0.emb[CAST(j.j AS INT)]) AS m
    FROM assign0 a JOIN e0 ON e0.vec_id = a.vec_id,
         unnest(range(1, {dim} + 1)) AS j(j)
    GROUP BY a.cell, j.j
  ) GROUP BY cell
),
corpus_cells AS (
  SELECT vec_id, cell FROM (
    SELECT e0.vec_id, c.cell,
           row_number() OVER (PARTITION BY e0.vec_id
                              ORDER BY round({cos.format(a='e0.emb', b='c.cvec')}, 9) DESC,
                                       c.cell ASC) AS rn
    FROM e0, cent1 c
  ) WHERE rn = 1
),
pairs AS MATERIALIZED (
  SELECT a.vec_id AS l, b.vec_id AS r
  FROM corpus_cells a JOIN corpus_cells b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN e0 ea ON ea.vec_id = a.vec_id
  JOIN e0 eb ON eb.vec_id = b.vec_id
  WHERE round({cos.format(a='ea.emb', b='eb.emb')}, 9) >= {threshold}
),
edges AS (SELECT l AS a, r AS b FROM pairs UNION SELECT r, l FROM pairs),
reach(node, rt) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, x.rt FROM reach x JOIN edges e ON e.a = x.node
),
comp AS (SELECT node, min(rt) AS component FROM reach GROUP BY node)
SELECT component AS keep_id,
       CAST(count(*) AS BIGINT) AS n_vecs,
       array_to_string(list_sort(list(node)), '|') AS member_ids
FROM comp
GROUP BY component
ORDER BY keep_id
"""
