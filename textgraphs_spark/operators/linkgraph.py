"""Host-level hyperlink graph: outlink extraction, link-based host
ranking, anchor-text census, and reciprocal-link spam signals.

The reference builds graphs from in-document token adjacency
(textgraphs/doc.py:486-534); a web-scale corpus carries a SECOND graph
the reference never sees — the hyperlink graph between hosts — and a
production curation run needs it for source-level authority weighting
(which domains to over/under-sample) and link-farm detection (mirror
farms interlink; organic sites rarely reciprocate at scale). This module
derives that graph from the raw ``html`` column and keeps everything
host-keyed: at 10^12 documents the PAGE graph has 10^12 nodes, but the
HOST graph is vocabulary-sized (10^7-10^8 registrable domains), so every
aggregate below fits a routine shuffle after one map-only parse pass.

Scale shape, per operator:

* ``extract_outlinks`` — map-only codegen (two ``regexp_extract_all``
  over the html string + ``arrays_zip`` + ``explode``); no shuffle, no
  Python. The regex is pinned to the Java∩RE2 dialect subset so the
  DuckDB oracles parse the SAME bytes with the SAME pattern (the
  pii.py discipline).
* ``host_link_graph`` — one (src_host, dst_host)-keyed hash aggregate
  with map-side partial aggregation; head hosts (every page on
  site0.example linking out) collapse map-side because the pair key is
  fine-grained.
* ``host_link_rank`` — weighted PageRank over the host-pair aggregate
  via the shared iterative-join kernel (operators/pagerank.py); the
  input is the vocabulary-sized host graph, never the page graph.
* ``anchor_text_census`` — (dst_host, anchor) hash agg, then exact
  per-host top-k via rankops.grouped_rank (a hot host's anchors never
  funnel into one window task).
* ``link_reciprocity`` — the host-pair aggregate self-joined on the
  reversed key (both sides pre-aggregated and tiny relative to the
  corpus), then one host-keyed rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .webdata import _host_sql, host_col

# One pattern, two group extractions. Java regex and RE2 (DuckDB) agree
# on every construct used here: literal text, [^..] classes, * and
# capture groups — the same dialect-subset discipline as operators/pii.py.
_LINK_RE = '<a href="https?://([^/"]+)[^"]*">([^<]*)</a>'


def extract_outlinks(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_host, dst_host, anchor) — one row per ``<a href>`` in the
    html, hosts normalized by the shared ``host_col`` rules (scheme and
    ``www.`` stripped, port dropped, lowercased). Map-only: parse, zip,
    explode; rows with NULL url or html carry no signal and are dropped.
    """
    h = F.col(html_col).cast("string")
    hosts = F.regexp_extract_all(h, F.lit(_LINK_RE), 1)
    anchors = F.regexp_extract_all(h, F.lit(_LINK_RE), 2)
    return (
        pages.filter(F.col(url_col).isNotNull() & F.col(html_col).isNotNull())
        .select(
            host_col(url_col).alias("src_host"),
            F.explode(F.arrays_zip(hosts.alias("t"), anchors.alias("a"))).alias("l"),
        )
        .select(
            "src_host",
            # normalize the raw href authority the same way as the page
            # url: lowercase FIRST (href casing is arbitrary in the
            # wild), then strip www. and drop :port
            F.regexp_replace(
                F.split_part(F.lower(F.col("l.t")), F.lit(":"), F.lit(1)),
                "^www\\.", "",
            ).alias("dst_host"),
            F.col("l.a").alias("anchor"),
        )
    )


def host_link_graph(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_host, dst_host, n_links) — the weighted host-level link
    graph, self-links excluded (intra-host navigation is structure, not
    endorsement). One hash aggregate over the exploded outlinks."""
    return (
        extract_outlinks(pages, url_col=url_col, html_col=html_col)
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def host_link_rank(
    pages: DataFrame,
    *,
    url_col: str = "url",
    html_col: str = "html",
    max_iter: int = 20,
) -> DataFrame:
    """(host, rank) — weighted PageRank over the host link graph via the
    shared iterative-join kernel. Ranks rounded to 6 (summation-order
    ulps), ordering handled by callers."""
    from .pagerank import pagerank

    g = host_link_graph(pages, url_col=url_col, html_col=html_col)
    pr = pagerank(
        g.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"),
                 F.col("n_links").alias("weight")),
        max_iter=max_iter,
    )
    return pr.select(F.col("node").alias("host"), F.round("rank", 6).alias("rank"))


def anchor_text_census(
    pages: DataFrame,
    *,
    url_col: str = "url",
    html_col: str = "html",
    top_k: int = 3,
) -> DataFrame:
    """(dst_host, anchor, n_links, rk) — the top-k anchor texts pointing
    AT each host, rk 1..k by (count desc, anchor asc). Anchor text is
    the classic external description of a page/host (how the web refers
    to it) and feeds entity linking as a surface-form prior. Self-links
    excluded; anchors lowercased and whitespace-squeezed so cosmetic
    variants aggregate."""
    from .rankops import grouped_rank

    per = (
        extract_outlinks(pages, url_col=url_col, html_col=html_col)
        .filter(F.col("src_host") != F.col("dst_host"))
        .select(
            "dst_host",
            F.trim(F.regexp_replace(F.lower("anchor"), "\\s+", " ")).alias("anchor"),
        )
        .filter(F.col("anchor") != "")
        .groupBy("dst_host", "anchor")
        .agg(F.count("*").alias("n_links"))
    )
    ranked = grouped_rank(
        per, "dst_host", [F.desc("n_links"), F.asc("anchor")], rank_col="rk"
    )
    return ranked.filter(F.col("rk") <= top_k).select(
        "dst_host", "anchor", "n_links", F.col("rk").cast("int").alias("rk")
    )


def link_reciprocity(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-host link-farm signals — (host, n_out_hosts, n_in_hosts,
    n_reciprocal, reciprocity): how many distinct hosts it links to, how
    many link to it, how many of its out-neighbors link BACK, and the
    reciprocal fraction of its out-neighborhood. Organic sites link out
    far more than they are linked back (reciprocity near 0); link farms
    interlink by construction (reciprocity near 1) — the structural
    signal that survives content rewrites, unlike the text channels in
    dedup.py.

    Shape: the host-pair aggregate (vocabulary-sized) self-joined once
    on the reversed pair key, then one host-keyed rollup.
    """
    g = (
        host_link_graph(pages, url_col=url_col, html_col=html_col)
        .select("src_host", "dst_host")
        .localCheckpoint()  # EAGER: computed once, used three times below
    )
    # NOTE column ORDER: intersect is positional — the reversed frame
    # must present (dst, src) in the (src_host, dst_host) slots
    rev = g.select(
        F.col("dst_host").alias("src_host"), F.col("src_host").alias("dst_host")
    )
    out_d = g.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").alias("n_out_hosts")
    )
    in_d = g.groupBy(F.col("dst_host").alias("host")).agg(
        F.count("*").alias("n_in_hosts")
    )
    recip = (
        g.intersect(rev)
        .groupBy(F.col("src_host").alias("host"))
        .agg(F.count("*").alias("n_reciprocal"))
    )
    return (
        out_d.join(in_d, "host", "full")
        .join(recip, "host", "left")
        .select(
            "host",
            F.coalesce("n_out_hosts", F.lit(0)).alias("n_out_hosts"),
            F.coalesce("n_in_hosts", F.lit(0)).alias("n_in_hosts"),
            F.coalesce("n_reciprocal", F.lit(0)).alias("n_reciprocal"),
            F.when(
                F.coalesce("n_out_hosts", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_reciprocal", F.lit(0))
                    / F.col("n_out_hosts"), 6
                ),
            ).otherwise(F.lit(0.0)).alias("reciprocity"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins — parameterized by the page-source SQL; the link
# regex and host normalization are shared literals so engine and oracle
# cannot drift.

def _outlinks_sql(source_sql: str, *, url_col: str = "url",
                  html_col: str = "html") -> str:
    """CTE body producing (src_host, dst_host, anchor) from the same
    html bytes with the same pattern (DuckDB list group-extraction +
    UNNEST replaces Spark's arrays_zip + explode)."""
    h = _host_sql(url_col)
    return f"""
links AS MATERIALIZED (
  SELECT {h} AS src_host,
         regexp_extract_all({html_col}, '{_LINK_RE}', 1) AS ts,
         regexp_extract_all({html_col}, '{_LINK_RE}', 2) AS asx
  FROM ({source_sql}) WHERE {url_col} IS NOT NULL AND {html_col} IS NOT NULL
),
outlinks AS MATERIALIZED (
  SELECT src_host,
         regexp_replace(split_part(lower(ts[k]), ':', 1), '^www\\.', '') AS dst_host,
         asx[k] AS anchor
  FROM links, UNNEST(range(1, len(ts) + 1)) AS u(k)
)"""


def host_link_graph_sql(source_sql: str, *, url_col: str = "url",
                        html_col: str = "html") -> str:
    return f"""WITH {_outlinks_sql(source_sql, url_col=url_col, html_col=html_col)}
SELECT src_host, dst_host, count(*) AS n_links
FROM outlinks WHERE src_host <> dst_host
GROUP BY src_host, dst_host
"""


def host_link_rank_sql(source_sql: str, *, url_col: str = "url",
                       html_col: str = "html", max_iter: int = 20) -> str:
    # lazy import: plans.er_oracle imports FROM operators; importing it
    # at module scope here would create a cycle
    from ..plans.er_oracle import pagerank_ctes

    pr, final = pagerank_ctes(edges="lg_in", max_iter=max_iter, prefix="lpr")
    return f"""WITH {_outlinks_sql(source_sql, url_col=url_col, html_col=html_col)},
lg AS MATERIALIZED (
  SELECT src_host, dst_host, count(*) AS n_links
  FROM outlinks WHERE src_host <> dst_host
  GROUP BY src_host, dst_host
),
lg_in AS (SELECT src_host AS src, dst_host AS dst, n_links AS w FROM lg),
{pr}
SELECT node AS host, round(rank, 6) AS rank FROM {final}
"""


def anchor_text_census_sql(source_sql: str, *, url_col: str = "url",
                           html_col: str = "html", top_k: int = 3) -> str:
    return f"""WITH {_outlinks_sql(source_sql, url_col=url_col, html_col=html_col)},
per AS MATERIALIZED (
  SELECT dst_host,
         trim(regexp_replace(lower(anchor), '\\s+', ' ', 'g')) AS anchor,
         count(*) AS n_links
  FROM outlinks
  WHERE src_host <> dst_host
    AND trim(regexp_replace(lower(anchor), '\\s+', ' ', 'g')) <> ''
  GROUP BY 1, 2
)
SELECT dst_host, anchor, n_links, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (
    PARTITION BY dst_host ORDER BY n_links DESC, anchor ASC) AS rk
  FROM per
) WHERE rk <= {top_k}
"""


def link_reciprocity_sql(source_sql: str, *, url_col: str = "url",
                         html_col: str = "html") -> str:
    return f"""WITH {_outlinks_sql(source_sql, url_col=url_col, html_col=html_col)},
g AS MATERIALIZED (
  SELECT DISTINCT src_host, dst_host
  FROM outlinks WHERE src_host <> dst_host
),
outd AS (SELECT src_host AS host, count(*) AS n_out_hosts FROM g GROUP BY 1),
ind AS (SELECT dst_host AS host, count(*) AS n_in_hosts FROM g GROUP BY 1),
recip AS (
  SELECT a.src_host AS host, count(*) AS n_reciprocal
  FROM g a JOIN g b ON a.src_host = b.dst_host AND a.dst_host = b.src_host
  GROUP BY 1
)
SELECT coalesce(outd.host, ind.host) AS host,
       coalesce(n_out_hosts, 0) AS n_out_hosts,
       coalesce(n_in_hosts, 0) AS n_in_hosts,
       coalesce(n_reciprocal, 0) AS n_reciprocal,
       CASE WHEN coalesce(n_out_hosts, 0) > 0
            THEN round(coalesce(n_reciprocal, 0) * 1.0 / n_out_hosts, 6)
            ELSE 0.0 END AS reciprocity
FROM outd FULL JOIN ind ON outd.host = ind.host
LEFT JOIN recip ON coalesce(outd.host, ind.host) = recip.host
"""


def host_trustrank(
    pages: DataFrame,
    trusted: list[str],
    *,
    url_col: str = "url",
    html_col: str = "html",
    alpha: float = 0.85,
    max_iter: int = 20,
) -> DataFrame:
    """(host, trust) — TrustRank (Gyöngyi, Garcia-Molina & Pedersen,
    VLDB'04): personalized PageRank over the host link graph with the
    teleport restricted to a hand-audited whitelist of trusted hosts.
    Trust flows forward along links, so spam farms that manufacture
    in-links among themselves (high plain-PageRank, high reciprocity)
    stay near zero unless a trusted host actually links toward them —
    the standard demotion companion to ``link_reciprocity``'s detection.

    Hosts unreachable from every seed score exactly 0. Reuses the shared
    iterative-join PPR kernel (one Spark job per iteration, transition
    edges partitioned once); the seed side is a literal list — driver-
    sized by definition (a human audited it).
    """
    from .pagerank import personalized_pagerank

    g = host_link_graph(pages, url_col=url_col, html_col=html_col)
    spark = pages.sparkSession
    seeds = spark.createDataFrame([(t,) for t in sorted(set(trusted))], "node string")
    pr = personalized_pagerank(
        g.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"),
                 F.col("n_links").alias("weight")),
        seeds, alpha=alpha, max_iter=max_iter,
    )
    return pr.select(F.col("node").alias("host"), F.round("rank", 6).alias("trust"))


def host_trustrank_sql(
    source_sql: str,
    trusted: list[str],
    *,
    url_col: str = "url",
    html_col: str = "html",
    alpha: float = 0.85,
    max_iter: int = 20,
) -> str:
    from ..plans.er_oracle import ppr_ctes

    # seeds CTE named trseedsin (ppr_ctes itself emits a {prefix}_seeds)
    pr, final = ppr_ctes(
        edges="tr_in", seeds="trseedsin", max_iter=max_iter,
        alpha=alpha, prefix="tr",
    )
    seed_rows = " UNION ALL ".join(
        "SELECT '" + t.replace("'", "''") + "' AS node"
        for t in sorted(set(trusted))
    )
    return f"""WITH {_outlinks_sql(source_sql, url_col=url_col, html_col=html_col)},
lg AS MATERIALIZED (
  SELECT src_host, dst_host, count(*) AS n_links
  FROM outlinks WHERE src_host <> dst_host
  GROUP BY src_host, dst_host
),
tr_in AS (SELECT src_host AS src, dst_host AS dst, n_links AS w FROM lg),
trseedsin AS MATERIALIZED ({seed_rows}),
{pr}
SELECT node AS host, round(rank, 6) AS trust FROM {final}
"""


def host_scc(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(host, scc_id) — strongly connected components of the DIRECTED
    host link graph, scc_id = min member host. Mutual-reachability
    rings are the structural link-farm signal ``link_reciprocity``
    approximates pairwise: a farm whose members link in a cycle is ONE
    SCC even when no single pair reciprocates. Rides the generic
    coloring SCC kernel (operators/components.py) over the
    vocabulary-sized host-pair aggregate — the page graph never
    materializes."""
    from .components import strongly_connected_components

    g = host_link_graph(pages, url_col=url_col, html_col=html_col)
    return strongly_connected_components(
        g.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
    ).select(F.col("node").alias("host"), "scc_id")


def host_scc_sql(source_sql: str, *, url_col: str = "url",
                 html_col: str = "html") -> str:
    """DuckDB twin of ``host_scc`` — full transitive closure by
    recursive CTE, then scc_id(v) = min over {v} ∪ {u : v↔u mutually
    reachable}. Quadratic-closure oracle is fixture-sized by design;
    the engine's coloring kernel is the scale path."""
    return f"""WITH RECURSIVE {_outlinks_sql(source_sql, url_col=url_col, html_col=html_col)},
lg AS MATERIALIZED (
  SELECT src_host, dst_host FROM outlinks
  WHERE src_host <> dst_host GROUP BY 1, 2
),
verts AS (SELECT src_host AS v FROM lg UNION SELECT dst_host FROM lg),
reach AS (
  SELECT src_host AS a, dst_host AS b FROM lg
  UNION
  SELECT r.a, e.dst_host AS b FROM reach r JOIN lg e ON r.b = e.src_host
),
mutual AS (
  SELECT r1.a AS v, r1.b AS u
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
  UNION
  SELECT v, v FROM verts
)
SELECT v AS host, min(u) AS scc_id FROM mutual GROUP BY v
"""


def host_condensation(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_scc, dst_scc, n_links) — the condensation DAG of the host
    link graph: contract every strongly connected component of
    ``host_scc`` to one node and aggregate the links crossing
    components. Acyclic by construction, which is what makes it
    processable in topological order (authority flows, crawl
    prioritization by DAG depth) when the raw graph is not. Two
    host-keyed joins against the vocabulary-sized SCC mapping + one
    pair-keyed hash agg."""
    g = host_link_graph(pages, url_col=url_col, html_col=html_col)
    scc = host_scc(pages, url_col=url_col, html_col=html_col)
    return (
        g.join(scc.select(F.col("host").alias("src_host"),
                          F.col("scc_id").alias("src_scc")), "src_host")
        .join(scc.select(F.col("host").alias("dst_host"),
                         F.col("scc_id").alias("dst_scc")), "dst_host")
        .filter(F.col("src_scc") != F.col("dst_scc"))
        .groupBy("src_scc", "dst_scc")
        .agg(F.sum("n_links").alias("n_links"))
    )


def host_condensation_sql(source_sql: str, *, url_col: str = "url",
                          html_col: str = "html") -> str:
    """DuckDB twin of ``host_condensation`` — contracts the same
    recursive-closure SCC mapping over the same lg aggregate."""
    return f"""WITH RECURSIVE {_outlinks_sql(source_sql, url_col=url_col, html_col=html_col)},
lg AS MATERIALIZED (
  SELECT src_host, dst_host, count(*) AS n_links FROM outlinks
  WHERE src_host <> dst_host GROUP BY 1, 2
),
verts AS (SELECT src_host AS v FROM lg UNION SELECT dst_host FROM lg),
reach AS (
  SELECT src_host AS a, dst_host AS b FROM lg
  UNION
  SELECT r.a, e.dst_host AS b FROM reach r JOIN lg e ON r.b = e.src_host
),
mutual AS (
  SELECT r1.a AS v, r1.b AS u
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
  UNION
  SELECT v, v FROM verts
),
scc AS (SELECT v AS host, min(u) AS scc_id FROM mutual GROUP BY v)
SELECT s.scc_id AS src_scc, d.scc_id AS dst_scc,
       CAST(sum(lg.n_links) AS BIGINT) AS n_links
FROM lg
JOIN scc s ON lg.src_host = s.host
JOIN scc d ON lg.dst_host = d.host
WHERE s.scc_id <> d.scc_id
GROUP BY 1, 2
"""


def condensation_depth(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html",
    max_iter: int = 50,
) -> DataFrame:
    """(scc_id, depth) — longest-path layer of each component in the
    condensation DAG: sources (no in-edges) at depth 0, every other
    component at 1 + max depth of its predecessors. THE topological
    prioritization key: processing components in depth order satisfies
    every link-dependency (authority flows, staged recrawl) without a
    topological SORT — emit layer d by filtering ``depth = d``.

    Iterative relaxation over the component DAG (vocabulary-sized):
    each round joins depths to in-edges and takes the max — O(DAG
    depth) rounds, the same bound and localCheckpoint discipline as
    the other iterative kernels; capped and loudly failed. Well-defined
    because the condensation is acyclic by construction.
    """
    cond = host_condensation(
        pages, url_col=url_col, html_col=html_col
    ).select("src_scc", "dst_scc").localCheckpoint()
    scc = host_scc(pages, url_col=url_col, html_col=html_col)
    nodes = scc.select(F.col("scc_id").alias("v")).distinct()
    depth = nodes.select("v", F.lit(0).cast("long").alias("d")).localCheckpoint()
    for _ in range(max_iter):
        inc = (
            cond.join(
                depth.select(F.col("v").alias("src_scc"), F.col("d").alias("pd")),
                "src_scc",
            )
            .groupBy(F.col("dst_scc").alias("v"))
            .agg((F.max("pd") + 1).alias("nd"))
        )
        new = (
            depth.join(inc, "v", "left")
            .select("v", F.greatest("d", F.coalesce("nd", F.col("d"))).alias("d"))
            .localCheckpoint()
        )
        if new.join(depth.withColumnRenamed("d", "d0"), "v").filter(
            F.col("d") != F.col("d0")
        ).isEmpty():
            return new.select(F.col("v").alias("scc_id"), F.col("d").alias("depth"))
        depth = new
    raise RuntimeError(
        f"condensation_depth did not converge in {max_iter} iterations — "
        "raise max_iter (bound is the condensation-DAG depth)"
    )


def condensation_depth_sql(source_sql: str, *, url_col: str = "url",
                           html_col: str = "html") -> str:
    """DuckDB twin of ``condensation_depth`` — one flat CTE chain
    (shared with the scc/condensation twins), then enumerate all DAG
    paths recursively (terminates: acyclic) and take the max length
    ending at each component. Isolated components (no cross edges)
    come from the scc mapping and sit at depth 0, matching the
    engine."""
    return f"""WITH RECURSIVE {_outlinks_sql(source_sql, url_col=url_col, html_col=html_col)},
lg AS MATERIALIZED (
  SELECT src_host, dst_host, count(*) AS n_links FROM outlinks
  WHERE src_host <> dst_host GROUP BY 1, 2
),
verts AS (SELECT src_host AS v FROM lg UNION SELECT dst_host FROM lg),
reach AS (
  SELECT src_host AS a, dst_host AS b FROM lg
  UNION
  SELECT r.a, e.dst_host AS b FROM reach r JOIN lg e ON r.b = e.src_host
),
mutual AS (
  SELECT r1.a AS v, r1.b AS u
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
  UNION
  SELECT v, v FROM verts
),
scc AS MATERIALIZED (SELECT v AS host, min(u) AS scc_id FROM mutual GROUP BY v),
cond AS MATERIALIZED (
  SELECT DISTINCT s.scc_id AS src_scc, d.scc_id AS dst_scc
  FROM lg
  JOIN scc s ON lg.src_host = s.host
  JOIN scc d ON lg.dst_host = d.host
  WHERE s.scc_id <> d.scc_id
),
walk AS (
  SELECT dst_scc AS v, CAST(1 AS BIGINT) AS len FROM cond
  UNION ALL
  SELECT c.dst_scc AS v, w.len + 1 FROM walk w JOIN cond c ON w.v = c.src_scc
)
SELECT n.scc_id,
       coalesce((SELECT max(len) FROM walk WHERE walk.v = n.scc_id), 0)
         AS depth
FROM (SELECT DISTINCT scc_id FROM scc) n
"""


def pld_link_graph(
    pages: DataFrame,
    suffixes: list[str] | None = None,
    *,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src_domain, dst_domain, n_links) — the host link graph
    contracted to registered domains: the SITE-level web graph, the
    unit ranking and spam pipelines actually operate on (a site that
    shards itself across blog./docs./cdn. subdomains is one endorsement
    source, not four — per-host ranks let it vote once per subdomain).

    Contraction rules: both endpoints map through ``registered_domains``
    (PSL longest-match + fallback); intra-site cross-subdomain links
    collapse into self-edges and drop with the same self-edge filter as
    ``host_link_graph``; bare-suffix endpoints carry no site identity
    and drop. Plan shape: the map-only outlink parse + map-only PLD
    extraction (short-array HOFs), then ONE domain-pair hash agg — the
    contraction adds ZERO shuffles over ``host_link_graph``, and the
    aggregate output is smaller (domains ≤ hosts).
    """
    from .webdata import registered_domains

    ol = extract_outlinks(pages, url_col=url_col, html_col=html_col)
    a = registered_domains(ol, suffixes, host_col="src_host").select(
        F.col("reg_domain").alias("src_domain"), "dst_host"
    )
    b = registered_domains(a, suffixes, host_col="dst_host").select(
        "src_domain", F.col("reg_domain").alias("dst_domain")
    )
    return (
        b.filter(
            F.col("src_domain").isNotNull()
            & F.col("dst_domain").isNotNull()
            & (F.col("src_domain") != F.col("dst_domain"))
        )
        .groupBy("src_domain", "dst_domain")
        .agg(F.count("*").alias("n_links"))
    )


def pld_link_graph_sql(
    source_sql: str,
    suffixes: list[str] | None = None,
    *,
    url_col: str = "url",
    html_col: str = "html",
) -> str:
    """DuckDB twin of ``pld_link_graph`` — the shared outlink CTE piped
    through ``registered_domains_select`` once per endpoint (nested-CTE
    subqueries keep each application's internals scoped), same NULL and
    self-edge rules."""
    from .webdata import registered_domains_select

    ol = f"""WITH {_outlinks_sql(source_sql, url_col=url_col, html_col=html_col)}
SELECT src_host, dst_host FROM outlinks"""
    a = f"""SELECT reg_domain AS src_domain, dst_host
FROM ({registered_domains_select(ol, suffixes, host_col='src_host')})"""
    b = f"""SELECT src_domain, reg_domain AS dst_domain
FROM ({registered_domains_select(a, suffixes, host_col='dst_host')})"""
    return f"""
SELECT src_domain, dst_domain, count(*) AS n_links
FROM ({b})
WHERE src_domain IS NOT NULL AND dst_domain IS NOT NULL
  AND src_domain <> dst_domain
GROUP BY src_domain, dst_domain
"""
