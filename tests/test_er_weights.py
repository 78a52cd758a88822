"""Fellegi-Sunter EM match weights (plans/er_weights): numpy-reference
EM parity, hand-built pattern fixtures, classification reconciliation,
and the scale-shape invariants (pattern table bounded by 2^k)."""

import math

import pytest
from pyspark.sql import functions as F

from textgraphs_spark.plans import er_weights as W
from textgraphs_spark.plans.er_eval import eval_entities


def _em_reference(patterns, iters=5, eps=1e-6):
    """Pure-Python EM over [(g1, g2, g3, n), ...] — independent of both
    the Spark and DuckDB formulations (per-pattern loop, not vectorized)."""
    k = 3
    lam, m, u = 0.5, [0.9] * k, [0.1] * k
    clamp = lambda x: min(max(x, eps), 1.0 - eps)  # noqa: E731
    for _ in range(iters):
        s = sw = 0.0
        sm, su = [0.0] * k, [0.0] * k
        for *g, n in patterns:
            pm = pu = 1.0
            for i in range(k):
                pm *= m[i] if g[i] else 1.0 - m[i]
                pu *= u[i] if g[i] else 1.0 - u[i]
            w = lam * pm / (lam * pm + (1.0 - lam) * pu)
            s += n
            sw += n * w
            for i in range(k):
                sm[i] += n * w * g[i]
                su[i] += n * (1.0 - w) * g[i]
        lam = clamp(sw / s)
        m = [clamp(sm[i] / sw) for i in range(k)]
        u = [clamp(su[i] / (s - sw)) for i in range(k)]
    return lam, m, u


FIXTURE = [
    # a separable mixture: matches mostly agree on all bits, non-matches
    # mostly agree on none — EM must recover m >> u per feature
    (1, 1, 1, 80),
    (1, 1, 0, 10),
    (0, 1, 1, 15),
    (0, 0, 1, 40),
    (0, 0, 0, 900),
]


def test_em_params_match_reference(spark):
    pats = spark.createDataFrame(
        FIXTURE, ["g_exact", "g_strong", "g_last", "n_pairs"]
    )
    row = W.em_params(pats).collect()[0]
    lam, m, u = _em_reference(FIXTURE)
    assert row["lam"] == pytest.approx(lam, rel=1e-12)
    for i in range(3):
        assert row[f"m{i + 1}"] == pytest.approx(m[i], rel=1e-12)
        assert row[f"u{i + 1}"] == pytest.approx(u[i], rel=1e-12)
    # the mixture is separable: every feature must carry real evidence
    for i in range(3):
        assert row[f"m{i + 1}"] > row[f"u{i + 1}"]


def test_match_weight_monotone_in_agreement(spark):
    """More agreeing bits never decreases the log-likelihood-ratio weight
    when m_k > u_k for every k (FS theory); the all-agree pattern must be
    strong positive evidence and all-disagree strong negative."""
    ents = eval_entities(spark, n_base=40, n_twin=8)
    out = W.fs_match_weights(ents).collect()
    by_bits = {(r["g_exact"], r["g_strong"], r["g_last"]): r for r in out}
    weights = {k: r["match_weight"] for k, r in by_bits.items()}
    for (a, b, c), w in weights.items():
        for (a2, b2, c2), w2 in weights.items():
            if a2 >= a and b2 >= b and c2 >= c:
                assert w2 >= w - 1e-9
    top = max(weights.items(), key=lambda kv: sum(kv[0]))
    assert top[1] > 0  # all-agree pattern: positive evidence
    assert by_bits[top[0]]["posterior"] > 0.9
    # posteriors consistent with weights: same ordering
    posts = [by_bits[k]["posterior"] for k in sorted(weights, key=weights.get)]
    assert posts == sorted(posts)


def test_pattern_table_bounded_and_counts_total(spark):
    """The EM input is <= 2^k rows and conserves the candidate count —
    the whole scale argument."""
    ents = eval_entities(spark, n_base=40, n_twin=8)
    pairs = W.comparison_patterns(ents, keep_pairs=True)
    pats = W.comparison_patterns(ents)
    n_pairs = pairs.count()
    rows = pats.collect()
    assert len(rows) <= 2 ** len(W.FEATURES)
    assert sum(r["n_pairs"] for r in rows) == n_pairs


def test_classified_metrics_reconcile(spark):
    """fs_classified_metrics must equal a per-pair rederivation: label
    every candidate pair, classify by the pattern posterior, count."""
    ents = eval_entities(spark, n_base=40, n_twin=8)
    row = W.fs_classified_metrics(ents).collect()[0]

    feats = W.comparison_patterns(ents, keep_pairs=True)
    pats = [
        tuple(r)
        for r in feats.groupBy(*W.FEATURES)
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    lam, m, u = _em_reference(pats)
    truth = {
        r["entity_key"]: r["truth_id"]
        for r in ents.select("entity_key", "truth_id").collect()
    }
    tp = fp = 0
    for r in feats.collect():
        g = (r["g_exact"], r["g_strong"], r["g_last"])
        pm = pu = 1.0
        for i in range(3):
            pm *= m[i] if g[i] else 1.0 - m[i]
            pu *= u[i] if g[i] else 1.0 - u[i]
        post = lam * pm / (lam * pm + (1.0 - lam) * pu)
        same = truth[r["left_id"]] == truth[r["right_id"]]
        if post >= 0.5:
            tp += same
            fp += not same
    from collections import Counter

    sizes = Counter(truth.values())
    n_true = sum(n * (n - 1) // 2 for n in sizes.values())
    assert row["tp_pairs"] == tp
    assert row["fp_pairs"] == fp
    assert row["fn_pairs"] == n_true - tp
    assert row["em_lambda"] == pytest.approx(lam, abs=1e-6)
    assert row["pair_f1"] == pytest.approx(
        2 * tp / (2 * tp + fp + (n_true - tp)), abs=1e-6
    )


def test_weights_query_vs_oracle_shapes(spark):
    """The entry queries and their oracles agree on column names (the
    driver hash-compares name-sorted columns); full value parity is the
    driver's check_oracle job."""
    import __spark_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    for name in ("er_fs_weights", "er_fs_classify"):
        assert name in qs and name in sqls
    df = qs["er_fs_weights"](spark, "/unused")
    assert set(df.columns) == {
        "g_exact", "g_strong", "g_last", "n_pairs", "match_weight", "posterior"
    }


def test_em_degenerate_single_pattern_clamps(spark):
    """A corpus where every pair lands in ONE pattern cannot crash or
    emit NaN: clamping keeps every probability in (0, 1)."""
    pats = spark.createDataFrame([(1, 1, 1, 50)], W.FEATURES + ("n_pairs",))
    row = W.em_params(pats).collect()[0]
    vals = [row["lam"]] + [row[f"m{i}"] for i in (1, 2, 3)] + [
        row[f"u{i}"] for i in (1, 2, 3)
    ]
    for v in vals:
        assert 0.0 < v < 1.0 and not math.isnan(v)


def test_fs_cluster_eval_reconciles_with_manual_closure(spark):
    """The FS clustering row must equal a driver-side union-find over
    the posterior-matched pairs, scored by the same contingency math."""
    from collections import Counter

    ents = eval_entities(spark, n_base=40, n_twin=8)
    row = W.fs_cluster_eval(ents).collect()[0]

    feats = W.comparison_patterns(ents, keep_pairs=True).collect()
    pats = [
        tuple(r)
        for r in W.comparison_patterns(ents).collect()
    ]
    lam, m, u = _em_reference([(p[0], p[1], p[2], p[3]) for p in pats])
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    keys = [r["entity_key"] for r in ents.select("entity_key").collect()]
    for k in keys:
        parent[k] = k
    for r in feats:
        g = (r["g_exact"], r["g_strong"], r["g_last"])
        pm = pu = 1.0
        for i in range(3):
            pm *= m[i] if g[i] else 1.0 - m[i]
            pu *= u[i] if g[i] else 1.0 - u[i]
        if lam * pm / (lam * pm + (1.0 - lam) * pu) >= 0.5:
            ra, rb = find(r["left_id"]), find(r["right_id"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    clusters = {k: find(k) for k in keys}
    truth = {
        r["entity_key"]: r["truth_id"]
        for r in ents.select("entity_key", "truth_id").collect()
    }
    cells = Counter((clusters[k], truth[k]) for k in keys)
    tp = sum(n * (n - 1) // 2 for n in cells.values())
    pred = sum(
        n * (n - 1) // 2 for n in Counter(clusters.values()).values()
    )
    true = sum(n * (n - 1) // 2 for n in Counter(truth.values()).values())
    assert row["n_items"] == len(keys)
    assert row["n_clusters"] == len(set(clusters.values()))
    assert (row["tp_pairs"], row["fp_pairs"], row["fn_pairs"]) == (
        tp, pred - tp, true - tp,
    )
    assert row["pair_f1"] == pytest.approx(2 * tp / (pred + true), abs=1e-6)
    # the model must actually resolve entities, not degenerate to all-
    # singletons or one blob
    assert 1 < row["n_clusters"] < len(keys)


def test_tf_adjustments_hand_math_and_direction(spark):
    """tf_adjustment must equal log2(u1 / tf) with u1 from the reference
    EM, and point the right way: the rarest agreeing surfaces carry the
    LARGEST positive shift, surfaces more common than u1 a negative one."""
    ents = eval_entities(spark, n_base=40, n_twin=8)
    rows = W.fs_tf_adjustments(ents).collect()
    assert rows, "eval corpus must produce exact-agreeing pairs"

    pats = [tuple(r) for r in W.comparison_patterns(ents).collect()]
    _, _, u = _em_reference(pats)
    n = ents.count()
    surf_n = {r["surface"]: 0 for r in rows}
    for r in ents.select("surface").collect():
        if r["surface"] in surf_n:
            surf_n[r["surface"]] += 1
    for r in rows:
        tf = surf_n[r["surface"]] / n
        assert r["n_entities"] == surf_n[r["surface"]]
        assert r["tf"] == pytest.approx(tf, abs=1e-6)
        assert r["tf_adjustment"] == pytest.approx(
            math.log2(u[0] / tf), abs=1e-5
        )
    # monotone: rarer surface -> larger adjustment
    by_tf = sorted(rows, key=lambda r: r["tf"])
    adjs = [r["tf_adjustment"] for r in by_tf]
    assert adjs == sorted(adjs, reverse=True)


def test_review_queue_reconciles_with_classification(spark):
    """Queue membership == candidate pairs whose pattern posterior sits
    in the zone; ambiguity ordering is monotone; the zone boundaries
    partition candidates three ways (link / possible / non-link)."""
    from textgraphs_spark.plans.er_eval import eval_entities
    from textgraphs_spark.plans.er_weights import (
        comparison_patterns, fs_match_weights, fs_review_queue,
    )

    ents = eval_entities(spark, n_base=40, n_twin=8)
    lo, hi = 0.01, 0.99
    queue = fs_review_queue(ents, lo=lo, hi=hi).collect()
    weights = {
        (r.g_exact, r.g_strong, r.g_last): r.posterior
        for r in fs_match_weights(ents).collect()
    }
    feats = comparison_patterns(ents, keep_pairs=True).collect()
    expect = {
        (f.left_id, f.right_id)
        for f in feats
        if lo <= weights[(f.g_exact, f.g_strong, f.g_last)] <= hi
    }
    assert {(r.left_id, r.right_id) for r in queue} == expect
    ambs = [r.ambiguity for r in queue]
    assert ambs == sorted(ambs)
    for r in queue:
        assert abs(r.ambiguity - abs(r.posterior - 0.5)) < 1e-6
        assert lo <= r.posterior <= hi
    # three-way partition: some candidates fall outside the zone too
    assert 0 < len(queue) < len(feats)
