"""Entity linking against an offline KG catalog.

The reference links mentions by calling DBPedia Spotlight / DBPedia Search /
Wikidata APIs per mention with memoization caches (reference:
textgraphs/kg.py:444-788, ent_cache/iri_cache kg.py:213-214). At 10^12
documents the cache IS the table: a precomputed ``kg_catalog`` dimension
(surface form → IRI, label, prob) that the mention table broadcast-joins
against — no network, no per-row calls, deterministic.

* ``link_entities``   — J7 (kg.py:986-1065): mention → IRI via normalized
  surface equality, gated by the reference's probability thresholds
  (min_alias 0.8, defaults.py:13).
* ``sameas_edges``    — J8 (kg.py:1068-1142): two catalogs (e.g. dbpedia +
  wikidata namespaces) linking the same mention yield owl:sameAs match
  edges — the transitive-closure feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..nlp import lex

MIN_ALIAS_PROB = 0.8  # reference defaults.py:13

_DBPEDIA_NS = "http://dbpedia.org/resource/"
_WIKIDATA_NS = "http://www.wikidata.org/entity/"


def kg_catalog_from_gazetteer(spark: SparkSession) -> DataFrame:
    """Deterministic synthetic catalog from the NER gazetteers: every known
    surface gets a DBPedia-style and a Wikidata-style IRI (two namespaces →
    exercises the sameAs path)."""
    rows = []
    entries = sorted(lex.GAZETTEER_GPE) + sorted(lex.GAZETTEER_ORG)
    for i, surface in enumerate(entries):
        slug = surface.title().replace(" ", "_")
        rows.append((surface, f"{_DBPEDIA_NS}{slug}", "dbpedia", surface.title(), 1.0))
        rows.append((surface, f"{_WIKIDATA_NS}Q{1000 + i}", "wikidata", surface.title(), 0.95))
    return spark.createDataFrame(
        rows, ["surface_norm", "iri", "namespace", "kg_label", "prob"]
    )


def link_entities(
    entities: DataFrame,
    catalog: DataFrame,
    *,
    surface_col: str = "surface",
    min_prob: float = MIN_ALIAS_PROB,
) -> DataFrame:
    """entities ⟗ broadcast(catalog) on normalized surface → links table
    (entity_key, iri, namespace, prob). Probability gate mirrors the
    reference's alias threshold (kg.py:530-550, 903-912)."""
    # collapse whitespace runs so 'New   York' matches the single-spaced
    # catalog surface_norm (blocking's normalize_names is immune because
    # it splits on ' +'; without this the two channels disagree on
    # surface equality)
    norm = F.lower(F.trim(F.regexp_replace(
        F.regexp_replace(F.col(surface_col), r"[^A-Za-z ]", ""), r" +", " "
    )))
    return (
        entities.withColumn("_norm", norm)
        .join(F.broadcast(catalog), F.col("_norm") == F.col("surface_norm"))
        .filter(F.col("prob") >= min_prob)
        .select("entity_key", "iri", "namespace", "kg_label", "prob")
    )


def link_entities_second_pass(
    entities: DataFrame,
    catalog: DataFrame,
    *,
    surface_col: str = "surface",
    min_prob: float = MIN_ALIAS_PROB,
    min_alias: float = MIN_ALIAS_PROB,
) -> DataFrame:
    """Fallback fuzzy linking for entities the exact pass left UNLINKED —
    the reference's second channel: KG *search* over still-unlinked
    mentions (kg.py:940-983) with best-alias selection by string
    similarity (kg.py:530-550), threshold ``min_alias``
    (defaults.py:13). Spark-first: instead of one search API call per
    unlinked mention, candidates come from two broadcast equi-join
    blocking channels against the catalog —

    * last-token equality   (multi-word aliases with an intact surname/
      head token, abbreviations), and
    * first-initial equality (typo'd single tokens keep their initial);

    then the best alias per entity wins by (JW similarity desc, catalog
    prob desc, iri asc), gated STRICTLY above ``min_alias`` as the
    reference does. JW runs through the vectorized DuckDB-backed kernel
    (scoring.jaro_winkler_udf), so the oracle reproduces scores
    bit-for-bit. Like the reference's search fallback, only the primary
    ('dbpedia') namespace is searched.

    At 10^12 docs the first-initial channel is the recall backstop and
    its candidate volume is |unlinked| x |catalog|/26 — bounded because
    the catalog is a broadcast dimension and the gate runs in the same
    stage (no candidate materialization); swap in a q-gram/LSH channel
    for catalogs beyond broadcast size.

    Output matches ``link_entities`` plus prob = round(best JW, 6).
    """
    from pyspark.sql.window import Window

    from .scoring import jaro_winkler_udf

    linked = link_entities(
        entities, catalog, surface_col=surface_col, min_prob=min_prob
    ).select("entity_key").distinct()
    norm = F.lower(F.trim(F.regexp_replace(
        F.regexp_replace(F.col(surface_col), r"[^A-Za-z ]", ""), r" +", " "
    )))
    unlinked = (
        entities.join(linked, "entity_key", "left_anti")
        .withColumn("_norm", norm)
        .withColumn("_toks", F.split(F.col("_norm"), " "))
        .withColumn("_last", F.element_at("_toks", -1))
        .withColumn("_init", F.substring(F.col("_norm"), 1, 1))
        .select("entity_key", "_norm", "_last", "_init")
    )
    cat = (
        catalog.filter(F.col("namespace") == "dbpedia")
        .withColumn("_ctoks", F.split(F.col("surface_norm"), " "))
        .withColumn("_clast", F.element_at("_ctoks", -1))
        .withColumn("_cinit", F.substring(F.col("surface_norm"), 1, 1))
        .select("surface_norm", "iri", "namespace", "kg_label", "prob",
                "_clast", "_cinit")
    )
    chan_last = unlinked.join(
        F.broadcast(cat), F.col("_last") == F.col("_clast")
    )
    chan_init = unlinked.join(
        F.broadcast(cat), F.col("_init") == F.col("_cinit")
    )
    cands = chan_last.unionByName(chan_init).dropDuplicates(
        ["entity_key", "iri"]
    )
    scored = cands.withColumn(
        "_sim", jaro_winkler_udf(F.col("_norm"), F.col("surface_norm"))
    )
    w = Window.partitionBy("entity_key").orderBy(
        F.desc(F.round("_sim", 9)), F.desc("prob"), F.asc("iri")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") == 1) & (F.col("_sim") > min_alias))
        .select(
            "entity_key", "iri", "namespace", "kg_label",
            F.round("_sim", 6).alias("prob"),
        )
    )


def link_entities_with_fallback(
    entities: DataFrame,
    catalog: DataFrame,
    *,
    surface_col: str = "surface",
    min_prob: float = MIN_ALIAS_PROB,
    min_alias: float = MIN_ALIAS_PROB,
) -> DataFrame:
    """Both linking channels unioned, tagged with ``channel``
    ('exact' | 'search') — the full reference linking flow
    (kg.py:986-1065 exact + 940-983 search fallback); feed this to
    ``sameas_edges``/``iri_match_edges`` for the closure."""
    exact = link_entities(
        entities, catalog, surface_col=surface_col, min_prob=min_prob
    ).withColumn("channel", F.lit("exact"))
    search = link_entities_second_pass(
        entities, catalog, surface_col=surface_col,
        min_prob=min_prob, min_alias=min_alias,
    ).withColumn("channel", F.lit("search"))
    return exact.unionByName(search)


def sameas_edges(links: DataFrame) -> DataFrame:
    """owl:sameAs match edges between IRIs of different namespaces linked
    to the same entity key (kg.py:1127-1134) — ready to union into the
    match-edge set for connected components."""
    a = links.select(F.col("entity_key"), F.col("iri").alias("left_id"), F.col("namespace").alias("ns_a"))
    b = links.select(F.col("entity_key"), F.col("iri").alias("right_id"), F.col("namespace").alias("ns_b"))
    return (
        a.join(b, "entity_key")
        .filter((F.col("ns_a") < F.col("ns_b")))
        .select("left_id", "right_id", F.lit(lex.OWL_SAMEAS).alias("rel"))
        .distinct()
    )


def iri_match_edges(links: DataFrame) -> DataFrame:
    """Entities linked to the SAME IRI are the same entity — the match-edge
    generator equivalent of the reference collapsing mentions into one IRI
    node (kg.py:1021-1035).

    Emits a spanning STAR per IRI (hub = min entity_key), not the O(k²)
    clique: connected components produces identical clusters from either,
    and a popular IRI with 10⁴ linked keys would otherwise blow up to
    ~5·10⁷ pair rows of pure wasted shuffle.
    """
    hubs = links.groupBy("iri").agg(F.min("entity_key").alias("left_id"))
    return (
        links.join(hubs, "iri")
        .filter(F.col("entity_key") != F.col("left_id"))
        .select("left_id", F.col("entity_key").alias("right_id"))
        .distinct()
    )
