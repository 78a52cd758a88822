"""Fellegi-Sunter probabilistic match weights, estimated by unsupervised
EM — the classical record-linkage scorer the entity-resolution literature
names this problem after (Fellegi & Sunter 1969; the Splink/FastLink
family implements the same model).

The pipeline's JW-threshold scorer (scoring.score_pairs) decides match /
non-match from a single similarity cut. Fellegi-Sunter instead learns,
WITHOUT labels, how much evidence each comparison outcome carries:

* every candidate pair is reduced to a small binary *comparison vector*
  gamma = (g_exact, g_strong, g_last) — exact surface equality, decision
  score >= ``strong``, last-token equality;
* pairs are aggregated to their gamma *pattern* (one hash agg — at most
  ``2**k`` rows regardless of corpus size);
* EM alternates on that tiny pattern table: the E-step scores each
  pattern's match probability under current parameters, the M-step
  re-estimates ``m_k = P(g_k agrees | match)``, ``u_k = P(g_k agrees |
  non-match)`` and the match prevalence ``lambda`` from the weighted
  counts. Everything after the single pattern aggregation is
  vocabulary-free: 5 unrolled iterations over <= 8 rows.

Outputs follow the classical presentation: per-pattern ``match_weight``
(log2 likelihood ratio, the "weight of evidence") and ``posterior``
(P(match | gamma)).

100 TB shape: the ONLY corpus-scale work is the pipeline's own blocking +
scoring pass (shared with every other ER query); the comparison vector is
three codegen'd boolean columns folded into one partially-aggregated
groupBy, so EM's input is <= 2^k rows however many pairs exist. Each EM
iteration is a broadcast cross join of that pattern table against a 1-row
parameter frame plus one global aggregate — no driver loop touches pair
space, and classification joins the <= 2^k posteriors back broadcast-side
(map-only). Reference parity: textgraphs has no probabilistic linkage —
this extends the same candidate set its entity linking dedups
(textgraphs kg.py:530-550 best-alias matching) with a principled scorer.

Every query has a DuckDB oracle: the same blocking/scoring CTE twins used
by plans/er_eval, with the EM recurrence unrolled into per-iteration CTEs
(the same discipline as similarity.py's unrolled Lloyd iterations).
Floating-point parity holds because both engines evaluate the identical
expression tree over the identical <= 8-row pattern table and results are
rounded to 6 decimals (the pagerank-oracle convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURES = ("g_exact", "g_strong", "g_last")
_EPS = 1e-6


# ---------------------------------------------------------------------------
# comparison vectors -> gamma patterns
# ---------------------------------------------------------------------------

def _last_token(col: str):
    # whole-match regexp_extract: identical semantics in Spark (group 0)
    # and DuckDB (default group)
    return F.regexp_extract(F.col(col), "[^ ]+$", 0)


def comparison_patterns(
    entities: DataFrame,
    *,
    max_block_size: int = 200,
    strong: float = 0.95,
    keep_pairs: bool = False,
) -> DataFrame:
    """entities(entity_key, surface, ...) -> gamma-pattern table
    (g_exact, g_strong, g_last, n_pairs) over the pipeline's own
    candidate pairs; ``keep_pairs=True`` returns the per-pair frame
    (left_id, right_id, g_exact, g_strong, g_last) instead."""
    from ..operators import scoring as S
    from .er_pipeline import blocking_pairs

    pairs = blocking_pairs(
        entities.select("entity_key", "surface"), max_block_size=max_block_size
    )
    scored = S.score_pairs(pairs, lean=True)
    feats = scored.select(
        "left_id",
        "right_id",
        (F.col("left_surface") == F.col("right_surface"))
        .cast("int")
        .alias("g_exact"),
        (F.col("score") >= F.lit(float(strong))).cast("int").alias("g_strong"),
        (_last_token("left_surface") == _last_token("right_surface"))
        .cast("int")
        .alias("g_last"),
    )
    if keep_pairs:
        return feats
    return feats.groupBy(*FEATURES).agg(F.count("*").alias("n_pairs"))


# ---------------------------------------------------------------------------
# EM on the pattern table
# ---------------------------------------------------------------------------

def _clamp(x, eps: float = _EPS):
    return F.least(F.greatest(x, F.lit(eps)), F.lit(1.0 - eps))


def _pattern_products(params_prefixed: bool = False):
    """(pm, pu) column expressions: P(gamma | match) and P(gamma |
    non-match) as naive-Bayes products over the feature columns, read
    from parameter columns m1..mk / u1..uk on the same row."""
    pm = F.lit(1.0)
    pu = F.lit(1.0)
    for i, g in enumerate(FEATURES, start=1):
        gc = F.col(g)
        pm = pm * F.when(gc == 1, F.col(f"m{i}")).otherwise(F.lit(1.0) - F.col(f"m{i}"))
        pu = pu * F.when(gc == 1, F.col(f"u{i}")).otherwise(F.lit(1.0) - F.col(f"u{i}"))
    return pm, pu


def em_params(patterns: DataFrame, *, iters: int = 5) -> DataFrame:
    """Unsupervised EM over the gamma-pattern table -> ONE-row parameter
    frame (lam, m1..mk, u1..uk). ``iters`` fixed-count iterations (no
    convergence test: the oracle must unroll the identical recurrence),
    parameters clamped to [1e-6, 1 - 1e-6] so degenerate patterns cannot
    collapse a probability to exactly 0/1."""
    spark = patterns.sparkSession
    k = len(FEATURES)
    params = spark.range(1).select(
        F.lit(0.5).alias("lam"),
        *[F.lit(0.9).alias(f"m{i}") for i in range(1, k + 1)],
        *[F.lit(0.1).alias(f"u{i}") for i in range(1, k + 1)],
    )
    for _ in range(iters):
        j = patterns.crossJoin(F.broadcast(params))
        pm, pu = _pattern_products()
        lam = F.col("lam")
        w = lam * pm / (lam * pm + (F.lit(1.0) - lam) * pu)
        n = F.col("n_pairs").cast("double")
        agg = j.agg(
            F.sum(n).alias("s"),
            F.sum(n * w).alias("sw"),
            *[
                F.sum(n * w * F.col(g)).alias(f"sm{i}")
                for i, g in enumerate(FEATURES, start=1)
            ],
            *[
                F.sum(n * (F.lit(1.0) - w) * F.col(g)).alias(f"su{i}")
                for i, g in enumerate(FEATURES, start=1)
            ],
        )
        params = agg.select(
            _clamp(F.col("sw") / F.col("s")).alias("lam"),
            *[
                _clamp(F.col(f"sm{i}") / F.col("sw")).alias(f"m{i}")
                for i in range(1, k + 1)
            ],
            *[
                _clamp(F.col(f"su{i}") / (F.col("s") - F.col("sw"))).alias(f"u{i}")
                for i in range(1, k + 1)
            ],
        )
    return params


def fs_match_weights(
    entities: DataFrame,
    *,
    max_block_size: int = 200,
    strong: float = 0.95,
    iters: int = 5,
) -> DataFrame:
    """Per-pattern Fellegi-Sunter output: (g_exact, g_strong, g_last,
    n_pairs, match_weight, posterior), ordered by the gamma bits
    descending (strongest evidence first). ``match_weight`` is the log2
    likelihood ratio log2(P(gamma|M) / P(gamma|U)); ``posterior`` is
    P(match | gamma) under the EM-estimated prevalence."""
    patterns = comparison_patterns(
        entities, max_block_size=max_block_size, strong=strong
    )
    # the pattern table is read by every EM iteration AND the final
    # projection: one blocking+scoring pass, not iters+1
    patterns = patterns.localCheckpoint(eager=False)
    params = em_params(patterns, iters=iters)
    j = patterns.crossJoin(F.broadcast(params))
    pm, pu = _pattern_products()
    lam = F.col("lam")
    w = lam * pm / (lam * pm + (F.lit(1.0) - lam) * pu)
    return j.select(
        *FEATURES,
        "n_pairs",
        F.round(F.log2(pm / pu), 6).alias("match_weight"),
        F.round(w, 6).alias("posterior"),
    ).orderBy(*[F.desc(g) for g in FEATURES])


def fs_classified_metrics(
    entities: DataFrame,
    *,
    truth_col: str = "truth_id",
    max_block_size: int = 200,
    strong: float = 0.95,
    iters: int = 5,
    decision: float = 0.5,
) -> DataFrame:
    """End-to-end Fellegi-Sunter classification quality: pairs whose
    EM posterior >= ``decision`` are predicted matches, evaluated against
    labels exactly like er_eval.blocked_pair_metrics (fn counts ALL
    missed true pairs, so recall is end-to-end). Output one row:
    (n_candidates, em_lambda, tp_pairs, fp_pairs, fn_pairs,
    pair_precision, pair_recall, pair_f1).

    100 TB shape: the per-pair frame is scored once (localCheckpoint);
    patterns/EM are vocabulary-free; the posterior joins back via a
    broadcast of the <= 2^k-row pattern table, so classification adds one
    map-only stage to the blocking pass."""
    feats = comparison_patterns(
        entities, max_block_size=max_block_size, strong=strong, keep_pairs=True
    ).localCheckpoint(eager=False)
    patterns = feats.groupBy(*FEATURES).agg(F.count("*").alias("n_pairs"))
    patterns = patterns.localCheckpoint(eager=False)
    params = em_params(patterns, iters=iters)
    pm, pu = _pattern_products()
    lam = F.col("lam")
    w = lam * pm / (lam * pm + (F.lit(1.0) - lam) * pu)
    post = (
        patterns.crossJoin(F.broadcast(params))
        .select(*FEATURES, "lam", w.alias("posterior"))
    )
    truth = entities.select("entity_key", truth_col)
    lab = (
        feats.join(F.broadcast(post), list(FEATURES))
        .join(
            truth.select(
                F.col("entity_key").alias("left_id"), F.col(truth_col).alias("lt")
            ),
            "left_id",
        )
        .join(
            truth.select(
                F.col("entity_key").alias("right_id"), F.col(truth_col).alias("rt")
            ),
            "right_id",
        )
    )
    same = F.col("lt") == F.col("rt")
    match = F.col("posterior") >= F.lit(float(decision))
    cand = lab.agg(
        F.count("*").alias("n_candidates"),
        F.round(F.max("lam"), 6).alias("em_lambda"),
        F.sum((same & match).cast("long")).alias("tp_pairs"),
        F.sum((~same & match).cast("long")).alias("fp_pairs"),
    )
    tot = (
        entities.groupBy(truth_col)
        .agg(F.count("*").alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) DIV 2")).alias("n_true_pairs"))
    )
    tp, fp = F.col("tp_pairs"), F.col("fp_pairs")
    fn = F.col("n_true_pairs") - tp
    return cand.crossJoin(tot).select(
        "n_candidates",
        "em_lambda",
        tp.alias("tp_pairs"),
        "fp_pairs",
        fn.alias("fn_pairs"),
        F.round(tp / (tp + fp), 6).alias("pair_precision"),
        F.round(tp / F.col("n_true_pairs"), 6).alias("pair_recall"),
        F.round(F.lit(2.0) * tp / (F.lit(2.0) * tp + fp + fn), 6).alias("pair_f1"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _feats_ctes(strong: float, *, with_truth: bool) -> str:
    """cands/pair_scores -> ``feats`` (per-pair gamma bits) and ``pat``
    (the gamma-pattern table) — the SQL twin of comparison_patterns."""
    truth = ",\n         le.truth_id = re.truth_id AS same" if with_truth else ""
    return f"""feats AS MATERIALIZED (
  SELECT p.left_id, p.right_id,
         CASE WHEN le.surface = re.surface THEN 1 ELSE 0 END AS g_exact,
         CASE WHEN p.score >= CAST({strong!r} AS DOUBLE) THEN 1 ELSE 0 END AS g_strong,
         CASE WHEN regexp_extract(le.surface, '[^ ]+$') = regexp_extract(re.surface, '[^ ]+$')
              THEN 1 ELSE 0 END AS g_last{truth}
  FROM pair_scores p
  JOIN entities le ON le.entity_key = p.left_id
  JOIN entities re ON re.entity_key = p.right_id
),
pat AS MATERIALIZED (
  SELECT g_exact, g_strong, g_last, CAST(count(*) AS BIGINT) AS n_pairs
  FROM feats GROUP BY 1, 2, 3
)"""


def _em_ctes(iters: int) -> str:
    """Parameter CTEs p0..p{iters}: the EM recurrence unrolled, expression
    tree identical to em_params (same clamp, same product/ratio shapes)."""
    k = len(FEATURES)
    clamp = lambda x: f"least(greatest({x}, CAST({_EPS!r} AS DOUBLE)), CAST({1.0 - _EPS!r} AS DOUBLE))"  # noqa: E731
    parts = [
        "p0 AS (SELECT CAST(0.5 AS DOUBLE) AS lam, "
        + ", ".join(f"CAST(0.9 AS DOUBLE) AS m{i}" for i in range(1, k + 1))
        + ", "
        + ", ".join(f"CAST(0.1 AS DOUBLE) AS u{i}" for i in range(1, k + 1))
        + ")"
    ]
    pm = " * ".join(
        f"(CASE WHEN {g} = 1 THEN m{i} ELSE 1.0 - m{i} END)"
        for i, g in enumerate(FEATURES, start=1)
    )
    pu = " * ".join(
        f"(CASE WHEN {g} = 1 THEN u{i} ELSE 1.0 - u{i} END)"
        for i, g in enumerate(FEATURES, start=1)
    )
    for it in range(1, iters + 1):
        e = (
            f"e{it} AS (SELECT pat.*, CAST(n_pairs AS DOUBLE) AS n,\n"
            f"  lam * {pm} / (lam * {pm} + (1.0 - lam) * {pu}) AS w\n"
            f"  FROM pat, p{it - 1})"
        )
        sums = ", ".join(
            [f"sum(n) AS s", f"sum(n * w) AS sw"]
            + [f"sum(n * w * {g}) AS sm{i}" for i, g in enumerate(FEATURES, start=1)]
            + [
                f"sum(n * (1.0 - w) * {g}) AS su{i}"
                for i, g in enumerate(FEATURES, start=1)
            ]
        )
        upd = ", ".join(
            [clamp("sw / s") + " AS lam"]
            + [clamp(f"sm{i} / sw") + f" AS m{i}" for i in range(1, k + 1)]
            + [clamp(f"su{i} / (s - sw)") + f" AS u{i}" for i in range(1, k + 1)]
        )
        parts.append(e)
        parts.append(f"a{it} AS (SELECT {sums} FROM e{it})")
        parts.append(f"p{it} AS (SELECT {upd} FROM a{it})")
    return ",\n".join(parts)


def fs_match_weights_sql(
    *, n_base: int = 150, n_twin: int = 30, strong: float = 0.95, iters: int = 5
) -> str:
    """Oracle for fs_match_weights over eval_entities."""
    from .er_eval import eval_entities_cte
    from .er_oracle import blocking_ctes, pair_scores_ctes

    pm = " * ".join(
        f"(CASE WHEN {g} = 1 THEN m{i} ELSE 1.0 - m{i} END)"
        for i, g in enumerate(FEATURES, start=1)
    )
    pu = " * ".join(
        f"(CASE WHEN {g} = 1 THEN u{i} ELSE 1.0 - u{i} END)"
        for i, g in enumerate(FEATURES, start=1)
    )
    return f"""WITH
{eval_entities_cte(n_base=n_base, n_twin=n_twin)},
{blocking_ctes('entities')},
{pair_scores_ctes('entities')},
{_feats_ctes(strong, with_truth=False)},
{_em_ctes(iters)}
SELECT g_exact, g_strong, g_last, n_pairs,
       round(log2(({pm}) / ({pu})), 6) AS match_weight,
       round(lam * {pm} / (lam * {pm} + (1.0 - lam) * {pu}), 6) AS posterior
FROM pat, p{iters}
ORDER BY g_exact DESC, g_strong DESC, g_last DESC
"""


def fs_classified_metrics_sql(
    *,
    n_base: int = 150,
    n_twin: int = 30,
    strong: float = 0.95,
    iters: int = 5,
    decision: float = 0.5,
) -> str:
    """Oracle for fs_classified_metrics over eval_entities."""
    from .er_eval import eval_entities_cte
    from .er_oracle import blocking_ctes, pair_scores_ctes

    pm = " * ".join(
        f"(CASE WHEN {g} = 1 THEN m{i} ELSE 1.0 - m{i} END)"
        for i, g in enumerate(FEATURES, start=1)
    )
    pu = " * ".join(
        f"(CASE WHEN {g} = 1 THEN u{i} ELSE 1.0 - u{i} END)"
        for i, g in enumerate(FEATURES, start=1)
    )
    fk = ", ".join(FEATURES)
    return f"""WITH
{eval_entities_cte(n_base=n_base, n_twin=n_twin)},
{blocking_ctes('entities')},
{pair_scores_ctes('entities')},
{_feats_ctes(strong, with_truth=True)},
{_em_ctes(iters)},
post AS (
  SELECT {fk}, lam,
         lam * {pm} / (lam * {pm} + (1.0 - lam) * {pu}) AS posterior
  FROM pat, p{iters}
),
lab AS (
  SELECT f.same, p.posterior >= CAST({decision!r} AS DOUBLE) AS match, p.lam
  FROM feats f JOIN post p USING ({fk})
),
cand AS (
  SELECT CAST(count(*) AS BIGINT) AS n_candidates,
         round(max(lam), 6) AS em_lambda,
         CAST(sum(CASE WHEN same AND match THEN 1 ELSE 0 END) AS BIGINT) AS tp_pairs,
         CAST(sum(CASE WHEN NOT same AND match THEN 1 ELSE 0 END) AS BIGINT) AS fp_pairs
  FROM lab
),
tot AS (
  SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) AS n_true_pairs
  FROM (SELECT count(*) AS n FROM entities GROUP BY truth_id)
)
SELECT n_candidates, em_lambda, tp_pairs, fp_pairs,
       n_true_pairs - tp_pairs AS fn_pairs,
       round(tp_pairs / (tp_pairs + fp_pairs), 6) AS pair_precision,
       round(tp_pairs / n_true_pairs, 6) AS pair_recall,
       round(2.0 * tp_pairs / (2.0 * tp_pairs + fp_pairs + (n_true_pairs - tp_pairs)), 6) AS pair_f1
FROM cand, tot
"""


def fs_cluster_eval(
    entities: DataFrame,
    *,
    truth_col: str = "truth_id",
    max_block_size: int = 200,
    strong: float = 0.95,
    iters: int = 5,
    decision: float = 0.5,
) -> DataFrame:
    """The FS model driving the ACTUAL clustering path: pairs whose EM
    posterior >= ``decision`` become the match edges, transitive closure
    (the pipeline's own components_over_keys — same 128-bit-id CC the
    flagship uses) assigns clusters, and the clustering is scored against
    truth by contingency counting. Output: the clustering_metrics row
    (n_items, n_clusters, n_truths, tp/fp/fn pairs, P/R/F1) — directly
    comparable to er_eval_clusters' JW-threshold pipeline row.

    100 TB shape: identical to the flagship clustering (blocking pass +
    pattern agg + broadcast posterior join + CC on match edges only);
    the evaluation itself never materializes a pair (three
    vocabulary-sized aggregates)."""
    from ..operators import components as C
    from .er_eval import clustering_metrics

    feats = comparison_patterns(
        entities, max_block_size=max_block_size, strong=strong, keep_pairs=True
    ).localCheckpoint(eager=False)
    patterns = (
        feats.groupBy(*FEATURES)
        .agg(F.count("*").alias("n_pairs"))
        .localCheckpoint(eager=False)
    )
    params = em_params(patterns, iters=iters)
    pm, pu = _pattern_products()
    lam = F.col("lam")
    w = lam * pm / (lam * pm + (F.lit(1.0) - lam) * pu)
    post = patterns.crossJoin(F.broadcast(params)).select(
        *FEATURES, w.alias("posterior")
    )
    matches = (
        feats.join(F.broadcast(post), list(FEATURES))
        .filter(F.col("posterior") >= F.lit(float(decision)))
        .select("left_id", "right_id")
    )
    clusters = C.components_over_keys(matches)
    assignments = (
        entities.join(clusters, "entity_key", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("entity_key")))
        .select("entity_key", "cluster_id")
    )
    return clustering_metrics(assignments, entities.select("entity_key", truth_col))


def fs_cluster_eval_sql(
    *,
    n_base: int = 150,
    n_twin: int = 30,
    strong: float = 0.95,
    iters: int = 5,
    decision: float = 0.5,
) -> str:
    """Oracle for fs_cluster_eval over eval_entities: FS matches feed the
    same recursive-CTE closure the flagship clustering oracle uses, then
    contingency metrics."""
    from .er_eval import eval_entities_cte
    from .er_oracle import blocking_ctes, pair_scores_ctes

    pm = " * ".join(
        f"(CASE WHEN {g} = 1 THEN m{i} ELSE 1.0 - m{i} END)"
        for i, g in enumerate(FEATURES, start=1)
    )
    pu = " * ".join(
        f"(CASE WHEN {g} = 1 THEN u{i} ELSE 1.0 - u{i} END)"
        for i, g in enumerate(FEATURES, start=1)
    )
    fk = ", ".join(FEATURES)
    return f"""WITH RECURSIVE
{eval_entities_cte(n_base=n_base, n_twin=n_twin)},
{blocking_ctes('entities')},
{pair_scores_ctes('entities')},
{_feats_ctes(strong, with_truth=False)},
{_em_ctes(iters)},
post AS (
  SELECT {fk},
         lam * {pm} / (lam * {pm} + (1.0 - lam) * {pu}) AS posterior
  FROM pat, p{iters}
),
matches AS MATERIALIZED (
  SELECT f.left_id, f.right_id
  FROM feats f JOIN post p USING ({fk})
  WHERE p.posterior >= CAST({decision!r} AS DOUBLE)
),
edgesu AS MATERIALIZED (
  SELECT left_id AS a, right_id AS b FROM matches
  UNION SELECT right_id, left_id FROM matches
),
reach(node, r) AS (
  SELECT entity_key, entity_key FROM entities
  UNION
  SELECT e.b, x.r FROM reach x JOIN edgesu e ON e.a = x.node
),
comp AS MATERIALIZED (
  SELECT node AS entity_key, min(r) AS cluster_id FROM reach GROUP BY node
),
cells AS (
  SELECT c.cluster_id, e.truth_id, count(*) AS n
  FROM comp c JOIN entities e USING (entity_key)
  GROUP BY 1, 2
),
head AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_items,
         CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
         CAST(count(DISTINCT truth_id) AS BIGINT) AS n_truths,
         CAST(sum(n * (n - 1) // 2) AS BIGINT) AS tp_pairs
  FROM cells
),
pred AS (
  SELECT CAST(sum(s * (s - 1) // 2) AS BIGINT) AS pred_pairs
  FROM (SELECT sum(n) AS s FROM cells GROUP BY cluster_id)
),
tru AS (
  SELECT CAST(sum(s * (s - 1) // 2) AS BIGINT) AS true_pairs
  FROM (SELECT sum(n) AS s FROM cells GROUP BY truth_id)
)
SELECT n_items, n_clusters, n_truths, tp_pairs,
       pred_pairs - tp_pairs AS fp_pairs,
       true_pairs - tp_pairs AS fn_pairs,
       round(tp_pairs / pred_pairs, 6) AS pair_precision,
       round(tp_pairs / true_pairs, 6) AS pair_recall,
       round(2.0 * tp_pairs / (pred_pairs + true_pairs), 6) AS pair_f1
FROM head, pred, tru
"""


def fs_tf_adjustments(
    entities: DataFrame,
    *,
    max_block_size: int = 200,
    strong: float = 0.95,
    iters: int = 5,
) -> DataFrame:
    """Term-frequency adjustment for the exact-surface feature (the
    Splink/FastLink refinement of Fellegi-Sunter): agreeing on a surface
    is evidence inversely proportional to how common that surface is —
    two 'J Smith's are weak evidence, two 'Xerxes Quixote's near-proof.
    The global u1 = P(exact agree | non-match) is replaced per surface
    by its relative frequency tf (the chance two random records share
    THIS surface), shifting the log2 weight by log2(u1 / tf).

    Output, one row per surface that produced at least one
    exact-agreeing candidate pair, ordered by surface: (surface,
    n_entities, tf, n_exact_pairs, tf_adjustment). Positive adjustment
    = rarer than the average agreeing surface -> stronger evidence.

    100 TB shape: surface frequencies are one vocabulary-sized hash agg
    over the entity table (NOT the corpus); exact pairs join their
    left surface and aggregate per surface — both partial-combining;
    u1 arrives as a broadcast 1-row frame off the shared EM chain."""
    feats = comparison_patterns(
        entities, max_block_size=max_block_size, strong=strong, keep_pairs=True
    ).localCheckpoint(eager=False)
    patterns = feats.groupBy(*FEATURES).agg(F.count("*").alias("n_pairs"))
    params = em_params(patterns, iters=iters)

    n_total = entities.agg(F.count("*").alias("_n"))
    sfreq = (
        entities.groupBy("surface")
        .agg(F.count("*").alias("n_entities"))
        .crossJoin(F.broadcast(n_total))
        .select(
            "surface",
            "n_entities",
            (F.col("n_entities") / F.col("_n")).alias("_tf"),
        )
    )
    exact = (
        feats.filter(F.col("g_exact") == 1)
        .join(
            entities.select(
                F.col("entity_key").alias("left_id"), "surface"
            ),
            "left_id",
        )
        .groupBy("surface")
        .agg(F.count("*").alias("n_exact_pairs"))
    )
    return (
        exact.join(sfreq, "surface")
        .crossJoin(F.broadcast(params.select("u1")))
        .select(
            "surface",
            "n_entities",
            F.round(F.col("_tf"), 6).alias("tf"),
            "n_exact_pairs",
            F.round(F.log2(F.col("u1") / F.col("_tf")), 6).alias("tf_adjustment"),
        )
        .orderBy("surface")
    )


def fs_tf_adjustments_sql(
    *, n_base: int = 150, n_twin: int = 30, strong: float = 0.95, iters: int = 5
) -> str:
    """Oracle for fs_tf_adjustments over eval_entities."""
    from .er_eval import eval_entities_cte
    from .er_oracle import blocking_ctes, pair_scores_ctes

    return f"""WITH
{eval_entities_cte(n_base=n_base, n_twin=n_twin)},
{blocking_ctes('entities')},
{pair_scores_ctes('entities')},
{_feats_ctes(strong, with_truth=False)},
{_em_ctes(iters)},
ntot AS (SELECT CAST(count(*) AS BIGINT) AS _n FROM entities),
sfreq AS (
  SELECT surface, CAST(count(*) AS BIGINT) AS n_entities,
         count(*) / (SELECT _n FROM ntot) AS _tf
  FROM entities GROUP BY surface
),
exact AS (
  SELECT e.surface, CAST(count(*) AS BIGINT) AS n_exact_pairs
  FROM feats f JOIN entities e ON e.entity_key = f.left_id
  WHERE f.g_exact = 1
  GROUP BY e.surface
)
SELECT x.surface, s.n_entities, round(s._tf, 6) AS tf, x.n_exact_pairs,
       round(log2(p.u1 / s._tf), 6) AS tf_adjustment
FROM exact x JOIN sfreq s USING (surface), p{iters} p
ORDER BY x.surface
"""


def fs_review_queue(
    entities: DataFrame,
    *,
    max_block_size: int = 200,
    strong: float = 0.95,
    iters: int = 5,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Clerical-review queue (the Fellegi–Sunter THIRD decision class):
    candidate pairs whose EM posterior lands in the gray zone
    [``lo``, ``hi``] (defaults chosen where this model's two
    middle gamma patterns live: strong-only ~0.96 and last-only ~0.07 —
    exactly the chain-evidence pairs a steward should see),
    ranked most-ambiguous-first — (left_id, right_id,
    left_surface, right_surface, g_exact, g_strong, g_last, posterior,
    ambiguity). FS's original framework is three-way — link, non-link,
    and POSSIBLE link routed to human review; every production linkage
    system ships this queue, sized by where the thresholds sit.

    100 TB shape: identical to classification — the pattern/EM side is
    vocabulary-free, the <= 2^k-row posterior table joins back
    broadcast-side, the gray-zone filter is map-only, and surfaces ride
    the pair frame from blocking (no extra corpus join). The queue a
    steward actually reads is a LIMIT over this frame; the full frame
    stays distributed. Boundary compares use round(posterior, 9) so the
    zone edges are engine-identical.
    """
    feats = comparison_patterns(
        entities, max_block_size=max_block_size, strong=strong, keep_pairs=True
    ).localCheckpoint(eager=False)
    patterns = feats.groupBy(*FEATURES).agg(F.count("*").alias("n_pairs"))
    params = em_params(patterns.localCheckpoint(eager=False), iters=iters)
    pm, pu = _pattern_products()
    lam = F.col("lam")
    w = lam * pm / (lam * pm + (F.lit(1.0) - lam) * pu)
    post = (
        patterns.crossJoin(F.broadcast(params))
        .select(*FEATURES, w.alias("posterior"))
    )
    surf = entities.select("entity_key", "surface")
    rp = F.round("posterior", 9)
    return (
        feats.join(F.broadcast(post), list(FEATURES))
        .filter((rp >= lo) & (rp <= hi))
        .join(
            surf.select(F.col("entity_key").alias("left_id"),
                        F.col("surface").alias("left_surface")), "left_id")
        .join(
            surf.select(F.col("entity_key").alias("right_id"),
                        F.col("surface").alias("right_surface")), "right_id")
        .select(
            "left_id", "right_id", "left_surface", "right_surface",
            *FEATURES,
            F.round("posterior", 6).alias("posterior"),
            F.round(F.abs(F.col("posterior") - 0.5), 6).alias("ambiguity"),
        )
        .orderBy("ambiguity", "left_id", "right_id")
    )


def fs_review_queue_sql(
    *, n_base: int = 150, n_twin: int = 30, strong: float = 0.95,
    iters: int = 5, lo: float = 0.01, hi: float = 0.99,
) -> str:
    """Oracle for fs_review_queue: the shared feats/EM chain, posterior
    per pattern, gray-zone filter, surfaces joined back."""
    from .er_eval import eval_entities_cte
    from .er_oracle import blocking_ctes, pair_scores_ctes

    pm = " * ".join(
        f"(CASE WHEN {g} = 1 THEN m{i} ELSE 1.0 - m{i} END)"
        for i, g in enumerate(FEATURES, start=1)
    )
    pu = " * ".join(
        f"(CASE WHEN {g} = 1 THEN u{i} ELSE 1.0 - u{i} END)"
        for i, g in enumerate(FEATURES, start=1)
    )
    return f"""WITH
{eval_entities_cte(n_base=n_base, n_twin=n_twin)},
{blocking_ctes('entities')},
{pair_scores_ctes('entities')},
{_feats_ctes(strong, with_truth=False)},
{_em_ctes(iters)},
post AS (
  SELECT g_exact, g_strong, g_last,
         lam * {pm} / (lam * {pm} + (1.0 - lam) * {pu}) AS posterior
  FROM pat, p{iters}
)
SELECT f.left_id, f.right_id, le.surface AS left_surface,
       re.surface AS right_surface, f.g_exact, f.g_strong, f.g_last,
       round(p.posterior, 6) AS posterior,
       round(abs(p.posterior - 0.5), 6) AS ambiguity
FROM feats f
JOIN post p USING (g_exact, g_strong, g_last)
JOIN entities le ON le.entity_key = f.left_id
JOIN entities re ON re.entity_key = f.right_id
WHERE round(p.posterior, 9) >= {lo} AND round(p.posterior, 9) <= {hi}
ORDER BY ambiguity, left_id, right_id
"""
