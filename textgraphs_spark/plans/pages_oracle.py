"""DuckDB oracles for the pages-based queries (entity_pairs, kg_linking).

These run over ``sources.pages.arith_pages`` — the RNG-free arithmetic
corpus — so the oracle regenerates the input bit-identically from the
same index formulas, then mirrors the full mixed-case extraction path:
tokenize → tag (incl. PROPN) → lemmatize → merge PROPN runs into entity
tokens (spaCy merge_entities parity, nlp/pipeline.py:208-243) → NER
gazetteer labels → dependency arcs → noun chunks → class-IRI links →
per-doc BFS distances / catalog linking.

Preconditions: single-sentence pages, ASCII `[A-Za-z0-9 ]` text (no
initials, so no lookbehind sentence splitting — RE2 engines lack it).

All CTEs are MATERIALIZED: DuckDB inlines plain CTEs per reference, and
the unrolled BFS references the adjacency once per step — un-materialized
that re-derives the whole extraction chain per step (measured 40-60 s vs
~2 s for the same query).
"""

from __future__ import annotations

from ..nlp import lex
from .er_oracle import _inlist, _irregular_case, _verb_lemma_cols, noun_lemma_case, tag_case


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in words) + "]"


def arith_pages_sql(n_pages: int = 150) -> str:
    """CTE regenerating sources.pages.arith_pages(n_pages) — same lists,
    same modular indexing (DuckDB lists are 1-based like element_at)."""
    from ..sources.pages import _arith_lists

    fn, ln, gpe, org = _arith_lists()

    def pick(lst, expr):
        return f"{_sql_list(lst)}[CAST(({expr}) % {len(lst)} + 1 AS INT)]"

    return f"""pages AS (
  SELECT CAST(r.i AS BIGINT) AS doc_id,
         concat_ws(' ',
           {pick(fn, 'r.i')}, {pick(ln, 'r.i')},
           'met',
           {pick(fn, 'r.i * 7 + 3')}, {pick(ln, 'r.i * 5 + 11')},
           'in', {pick(gpe, 'r.i')},
           'near', {pick(org, 'r.i * 3 + 1')},
           'offices') AS text
  FROM range(0, {n_pages}) r(i)
)"""


def _ner_label_case(surface_low: str) -> str:
    """_ner_label (nlp/pipeline.py:161-169): gazetteer lookup on the full
    lowercase surface, defaulting to PERSON."""
    return f"""CASE
      WHEN {surface_low} IN ({_inlist(lex.GAZETTEER_GPE)}) THEN 'GPE'
      WHEN {surface_low} IN ({_inlist(lex.GAZETTEER_ORG)}) THEN 'ORG'
      ELSE 'PERSON' END"""


def _class_iri_case(label: str) -> str:
    whens = "\n      ".join(
        f"WHEN '{k}' THEN '{v[0]}'" for k, v in sorted(lex.NER_MAP.items())
    )
    return f"CASE {label}\n      {whens}\n      ELSE NULL END"


def pages_graph_ctes(n_pages: int = 150) -> str:
    """arith_pages → merged-token lemma graph. Terminal CTEs:
    * ment(doc_id, node_key, surface, label, cnt) — entity nodes
    * alledges(doc_id, a, b) — undirected adjacency (dep + chu + iri)
    """
    stem, fix, rest = _verb_lemma_cols("low")
    stem0, _, _ = _verb_lemma_cols("lower(tok)")
    nominal = "('NOUN', 'PROPN', 'PRON', 'NUM')"
    chainable = "('DET', 'ADJ', 'NOUN', 'PROPN', 'CCONJ')"
    return f"""{arith_pages_sql(n_pages)},
rtok AS MATERIALIZED (
  SELECT doc_id, CAST(r.i AS INT) AS tpos, toks[CAST(r.i AS INT)] AS tok
  FROM (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS toks FROM pages) d,
       unnest(range(1, len(toks) + 1)) AS r(i)
),
rtag AS MATERIALIZED (
  SELECT doc_id, tpos, tok,
    {tag_case('tok', mixed_case=True, sent_initial='tpos = 1')} AS tag
  FROM rtok
),
rlem0 AS MATERIALIZED (
  SELECT doc_id, tpos, tok, tag, lower(tok) AS low,
    {_irregular_case('lower(tok)')} AS _irr,
    {stem0} AS _vstem
  FROM rtag
),
rlem AS MATERIALIZED (
  SELECT doc_id, tpos, tok, tag,
    coalesce(_irr,
      CASE
        WHEN tag IN ('PROPN','PUNCT','NUM','DET','ADP','PRON','CCONJ','SCONJ') THEN low
        WHEN tag IN ('VERB','AUX') THEN coalesce({fix}, {rest})
        ELSE {noun_lemma_case('low')}
      END) AS lemma
  FROM rlem0
),
-- merge maximal PROPN runs into single entity tokens
runs AS MATERIALIZED (
  SELECT *,
         CASE WHEN tag = 'PROPN'
              THEN tpos - row_number() OVER (
                     PARTITION BY doc_id, (tag = 'PROPN') ORDER BY tpos)
              END AS grp
  FROM rlem
),
mtok0 AS MATERIALIZED (
  SELECT doc_id, min(tpos) AS first_tpos,
         string_agg(tok, ' ' ORDER BY tpos) AS text,
         string_agg(lemma, ' ' ORDER BY tpos) AS lemma,
         string_agg(lemma || '.' || tag, '.' ORDER BY tpos) AS pair_str,
         'PROPN' AS tag, count(*) AS n_raw, TRUE AS is_ent
  FROM runs WHERE tag = 'PROPN' GROUP BY doc_id, grp
  UNION ALL
  SELECT doc_id, tpos, tok, lemma, lemma || '.' || tag, tag, 1, FALSE
  FROM runs WHERE tag <> 'PROPN'
),
mtok AS MATERIALIZED (
  SELECT doc_id, first_tpos, text, lemma, pair_str, tag, n_raw, is_ent,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY first_tpos) - 1 AS INT) AS mi,
         CASE WHEN is_ent THEN {_ner_label_case('lower(text)')} END AS ent_label
  FROM mtok0
),
mkey AS MATERIALIZED (
  SELECT *,
         CASE
           WHEN is_ent THEN pair_str
           WHEN tag IN ('NOUN', 'VERB') THEN pair_str
           ELSE CAST(mi AS VARCHAR) || '.' || pair_str
         END AS node_key
  FROM mtok
),
mroot AS (
  SELECT doc_id,
         coalesce(
           min(CASE WHEN tag = 'VERB' THEN mi END),
           min(CASE WHEN tag = 'AUX' THEN mi END),
           min(CASE WHEN tag IN ('NOUN', 'PROPN') THEN mi END),
           0) AS root_mi
  FROM mkey GROUP BY doc_id
),
mdepw AS MATERIALIZED (
  SELECT t.*, r.root_mi,
         max(CASE WHEN tag = 'ADP' THEN mi END)
           OVER (PARTITION BY t.doc_id ORDER BY mi
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_adp,
         max(CASE WHEN tag IN ('NOUN','PROPN','VERB','AUX') THEN mi END)
           OVER (PARTITION BY t.doc_id ORDER BY mi
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_stop,
         min(CASE WHEN tag IN ('NOUN','PROPN') THEN mi END)
           OVER (PARTITION BY t.doc_id ORDER BY mi
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_nom
  FROM mkey t JOIN mroot r ON t.doc_id = r.doc_id
),
mdepg AS MATERIALIZED (
  SELECT *,
         CASE WHEN tag IN {nominal} AND mi <> root_mi
                   AND prev_adp IS NOT NULL
                   AND prev_adp > coalesce(prev_stop, -1)
              THEN prev_adp END AS gov
  FROM mdepw
),
mdeps AS MATERIALIZED (
  SELECT g.*,
         CASE
           WHEN g.mi = g.root_mi THEN g.root_mi
           WHEN g.tag IN ('DET', 'ADJ') THEN coalesce(g.next_nom, g.root_mi)
           WHEN g.tag = 'ADP' THEN coalesce(g.prev_stop, g.root_mi)
           WHEN g.tag IN {nominal} AND g.gov IS NOT NULL THEN g.gov
           ELSE g.root_mi
         END AS head_mi
  FROM mdepg g
),
ment AS MATERIALIZED (
  SELECT doc_id, node_key,
         min_by(text, mi) AS surface,
         min_by(ent_label, mi) AS label,
         count(*) AS cnt
  FROM mkey WHERE is_ent GROUP BY doc_id, node_key
),
misl AS MATERIALIZED (
  SELECT doc_id, mi, tag, pair_str, node_key,
         mi - row_number() OVER (PARTITION BY doc_id ORDER BY mi) AS grp
  FROM mkey WHERE tag IN {chainable}
),
mspans AS MATERIALIZED (
  SELECT doc_id, grp,
         min(CASE WHEN tag <> 'CCONJ' THEN mi END) AS s,
         max(CASE WHEN tag IN ('NOUN', 'PROPN') THEN mi END) AS ln
  FROM misl GROUP BY doc_id, grp
  HAVING min(CASE WHEN tag <> 'CCONJ' THEN mi END) IS NOT NULL
     AND max(CASE WHEN tag IN ('NOUN', 'PROPN') THEN mi END)
         >= min(CASE WHEN tag <> 'CCONJ' THEN mi END)
),
mchunks AS MATERIALIZED (
  SELECT sp.doc_id, sp.s, sp.ln,
         string_agg(t.pair_str, '.' ORDER BY t.mi) AS chunk_key
  FROM mspans sp JOIN mkey t
    ON t.doc_id = sp.doc_id AND t.mi BETWEEN sp.s AND sp.ln
  GROUP BY sp.doc_id, sp.s, sp.ln
),
mchunk_new AS MATERIALIZED (
  SELECT c.* FROM mchunks c
  WHERE NOT EXISTS (
    SELECT 1 FROM mkey t
    WHERE t.doc_id = c.doc_id AND t.node_key = c.chunk_key
  )
),
dep_e AS MATERIALIZED (
  SELECT DISTINCT s.doc_id, s.node_key AS src, h.node_key AS dst
  FROM mdeps s JOIN mdeps h ON h.doc_id = s.doc_id AND h.mi = s.head_mi
  WHERE s.node_key <> h.node_key
),
chu_e AS MATERIALIZED (
  SELECT DISTINCT c.doc_id, c.chunk_key AS src, t.node_key AS dst
  FROM mchunk_new c JOIN mkey t
    ON t.doc_id = c.doc_id AND t.mi BETWEEN c.s AND c.ln
  WHERE c.chunk_key <> t.node_key
),
iri_e AS MATERIALIZED (
  SELECT DISTINCT doc_id, node_key AS src,
         {_class_iri_case('label')} AS dst
  FROM ment WHERE {_class_iri_case('label')} IS NOT NULL
),
alledges AS MATERIALIZED (
  SELECT doc_id, src AS a, dst AS b FROM dep_e
  UNION ALL SELECT doc_id, dst, src FROM dep_e
  UNION ALL SELECT doc_id, src, dst FROM chu_e
  UNION ALL SELECT doc_id, dst, src FROM chu_e
  UNION ALL SELECT doc_id, src, dst FROM iri_e
  UNION ALL SELECT doc_id, dst, src FROM iri_e
)"""


def entity_pairs_sql(n_pages: int = 150, *, max_skip: int = 11) -> str:
    """Oracle for entity_pairs_within_distance(arith_pages): per-doc BFS
    over the lemma graph, emitting ordered entity pairs with shortest
    distance where distance + 1 <= max_skip (path counted in nodes)."""
    steps = []
    for k in range(1, max_skip):
        prev = f"bfs{k - 1}"
        steps.append(f"""bfs{k} AS MATERIALIZED (
  SELECT doc_id, root_key, node, min(dist) AS dist FROM (
    SELECT doc_id, root_key, node, dist FROM {prev}
    UNION ALL
    SELECT p.doc_id, p.root_key, e.b AS node, p.dist + 1 AS dist
    FROM {prev} p JOIN alledges e ON e.doc_id = p.doc_id AND e.a = p.node
  ) GROUP BY doc_id, root_key, node
)""")
    chain = ",\n".join(steps)
    return f"""WITH
{pages_graph_ctes(n_pages)},
bfs0 AS MATERIALIZED (
  SELECT doc_id, node_key AS root_key, node_key AS node, 0 AS dist FROM ment
),
{chain}
SELECT b.doc_id, b.root_key AS src_key, b.node AS dst_key,
       CAST(b.dist AS INT) AS distance
FROM bfs{max_skip - 1} b
JOIN ment m ON m.doc_id = b.doc_id AND m.node_key = b.node
WHERE b.node <> b.root_key AND b.dist + 1 <= {max_skip}
"""


def sameas_edges_sql(n_pages: int = 150, *, min_prob: float = 0.8) -> str:
    """Oracle for sameas_edges(link_entities(...)): IRIs of DIFFERENT
    namespaces linked to the same entity key become owl:sameAs edges."""
    base = kg_linking_sql(n_pages, min_prob=min_prob).rstrip().rstrip("\n")
    base = base[: base.rindex("SELECT n.entity_key")].rstrip()
    return f"""{base},
links AS MATERIALIZED (
  SELECT n.entity_key, c.iri, c.namespace
  FROM normed n JOIN catalog c ON n._norm = c.surface_norm
  WHERE c.prob >= {min_prob}
)
SELECT DISTINCT a.iri AS left_id, b.iri AS right_id,
       'http://www.w3.org/2002/07/owl#sameAs' AS rel
FROM links a JOIN links b
  ON a.entity_key = b.entity_key AND a.namespace < b.namespace
ORDER BY left_id, right_id
"""


def relation_edges_sql(n_pages: int = 150, *, min_prob: float = 0.9) -> str:
    """Oracle for the pattern-based relation extractor + inf_edges over
    arith_pages (operators/relations.py::_pattern_triples, inf_edges):
    adjacent entity mentions with a verb strictly between them yield a
    (src, rel, dst) triple; rel = verb lemma (suffixed with an
    intervening ADP lemma) remapped, then resolved to a property IRI."""
    from ..operators.relations import REL_IRI

    rel_dim = ",\n   ".join(
        f"('{k}', '{v}')" for k, v in sorted(REL_IRI.items())
    )
    return f"""WITH
{pages_graph_ctes(n_pages)},
epairs AS MATERIALIZED (
  SELECT doc_id, mi AS a_mi, node_key AS a_key, text AS a_text,
         lead(mi) OVER (PARTITION BY doc_id ORDER BY mi) AS b_mi,
         lead(node_key) OVER (PARTITION BY doc_id ORDER BY mi) AS b_key
  FROM mkey WHERE is_ent
),
between_toks AS MATERIALIZED (
  SELECT p.doc_id, p.a_mi, p.b_mi, p.a_key, p.b_key,
         min_by(CASE WHEN t.tag = 'VERB' THEN t.lemma END,
                CASE WHEN t.tag = 'VERB' THEN t.mi END) AS verb_lemma,
         min_by(CASE WHEN t.tag = 'ADP' THEN t.lemma END,
                CASE WHEN t.tag = 'ADP' THEN t.mi END) AS adp_lemma
  FROM epairs p
  JOIN mkey t ON t.doc_id = p.doc_id AND t.mi > p.a_mi AND t.mi < p.b_mi
  WHERE p.b_mi IS NOT NULL
  GROUP BY p.doc_id, p.a_mi, p.b_mi, p.a_key, p.b_key
),
triples AS MATERIALIZED (
  SELECT doc_id, a_key AS src_key,
         CASE coalesce(verb_lemma || CASE WHEN adp_lemma IS NOT NULL
                                          THEN '_' || adp_lemma ELSE '' END, '')
           WHEN 'meet' THEN 'met'
           WHEN 'travel_from' THEN 'traveled_from'
           WHEN 'work_with' THEN 'works_with'
           WHEN 'praise' THEN 'praised'
           ELSE verb_lemma || CASE WHEN adp_lemma IS NOT NULL
                                   THEN '_' || adp_lemma ELSE '' END
         END AS rel,
         b_key AS dst_key, 0.95 AS prob
  FROM between_toks
  WHERE verb_lemma IS NOT NULL
),
rel_dim(rel, rel_iri) AS (VALUES
   {rel_dim}
)
SELECT t.src_key, t.dst_key,
       coalesce(d.rel_iri, t.rel) AS rel,
       count(*) AS count, max(t.prob) AS prob, 'inf' AS kind
FROM triples t LEFT JOIN rel_dim d ON t.rel = d.rel
WHERE t.src_key <> t.dst_key AND t.prob >= {min_prob}
GROUP BY t.src_key, t.dst_key, coalesce(d.rel_iri, t.rel)
ORDER BY src_key, dst_key, rel
"""


def kg_linking_sql(n_pages: int = 150, *, min_prob: float = 0.8) -> str:
    """Oracle for kg_linking over arith_pages: corpus entity keys linked
    against the gazetteer catalog (linking.kg_catalog_from_gazetteer,
    regenerated here from the same lists)."""
    rows = []
    entries = sorted(lex.GAZETTEER_GPE) + sorted(lex.GAZETTEER_ORG)
    for i, surface in enumerate(entries):
        slug = surface.title().replace(" ", "_")
        esc = surface.replace("'", "''")
        title = surface.title().replace("'", "''")
        rows.append(
            f"('{esc}', 'http://dbpedia.org/resource/{slug}', 'dbpedia', '{title}', 1.0)"
        )
        rows.append(
            f"('{esc}', 'http://www.wikidata.org/entity/Q{1000 + i}', 'wikidata', '{title}', 0.95)"
        )
    catalog = ",\n   ".join(rows)
    return f"""WITH
{pages_graph_ctes(n_pages)},
ents AS (
  SELECT node_key AS entity_key, min(surface) AS surface
  FROM ment GROUP BY node_key
),
catalog(surface_norm, iri, namespace, kg_label, prob) AS (VALUES
   {catalog}
),
normed AS (
  SELECT entity_key,
         lower(trim(regexp_replace(
           regexp_replace(surface, '[^A-Za-z ]', '', 'g'), ' +', ' ', 'g'))) AS _norm
  FROM ents
)
SELECT n.entity_key, c.iri, c.namespace, c.kg_label, c.prob
FROM normed n JOIN catalog c ON n._norm = c.surface_norm
WHERE c.prob >= {min_prob}
ORDER BY n.entity_key, c.iri
"""
