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


def arith_pages_typos_sql(n_pages: int = 150) -> str:
    """CTE regenerating sources.pages.arith_pages_typos(n_pages): every
    5th page picks its place from the SAME typo-transposed list the
    Spark source builds (typo_surface), inlined here."""
    from ..sources.pages import _arith_lists, typo_surface

    fn, ln, gpe, org = _arith_lists()
    gpe_t = [typo_surface(w) for w in gpe]

    def pick(lst, expr):
        return f"{_sql_list(lst)}[CAST(({expr}) % {len(lst)} + 1 AS INT)]"

    return f"""pages AS (
  SELECT CAST(r.i AS BIGINT) AS doc_id,
         concat_ws(' ',
           {pick(fn, 'r.i')}, {pick(ln, 'r.i')},
           'met',
           {pick(fn, 'r.i * 7 + 3')}, {pick(ln, 'r.i * 5 + 11')},
           'in',
           CASE WHEN r.i % 5 = 0 THEN {pick(gpe_t, 'r.i')}
                ELSE {pick(gpe, 'r.i')} END,
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


def pages_graph_ctes(n_pages: int = 150, *, corpus_sql: str | None = None) -> str:
    """arith_pages → merged-token lemma graph. Terminal CTEs:
    * ment(doc_id, node_key, surface, label, cnt) — entity nodes
    * alledges(doc_id, a, b) — undirected adjacency (dep + chu + iri)

    ``corpus_sql`` overrides the corpus CTE (must be named ``pages``
    with columns doc_id, text) — e.g. ``arith_pages_typos_sql`` for the
    second-pass linking oracle.
    """
    stem, fix, rest = _verb_lemma_cols("low")
    stem0, _, _ = _verb_lemma_cols("lower(tok)")
    nominal = "('NOUN', 'PROPN', 'PRON', 'NUM')"
    chainable = "('DET', 'ADJ', 'NOUN', 'PROPN', 'CCONJ')"
    return f"""{corpus_sql or arith_pages_sql(n_pages)},
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


def _ner_meta_case(label: str, field: int) -> str:
    """NER label → NER_MAP iri/definition/cls_label (field 0/1/2)."""
    whens = "\n      ".join(
        f"WHEN '{k}' THEN '{v[field]}'" for k, v in sorted(lex.NER_MAP.items())
    )
    return f"CASE {label}\n      {whens}\n      ELSE NULL END"


def ranked_phrases_pages_sql(n_pages: int = 150, *, top: int = 5) -> str:
    """Oracle for phrases_table(extract_graphs(arith_pages)) top-``top``:
    unlike the lowercase documents corpus, pages HAVE entities, so this
    exercises the FULL restack (doc.py:796-890 semantics): per-doc
    PageRank → VERB/IRI count redaction → max-normalization → quantile
    striping (np.percentile 'nearest' == sorted value at the
    banker-rounded virtual index) → RMS → entity-over-lemma LP
    coefficients in closed form → stacked weights.
    """
    from .er_oracle import docpr_ctes

    rdf_type = lex.RDF_TYPE.replace("'", "''")
    # per-column quantile + stripe CTEs (c0..c3)
    quant_parts, stripe_cols = [], []
    for c in range(4):
        quant_parts.append(f"""q{c} AS MATERIALIZED (
  SELECT b.doc_id, b.j, v.val AS qv
  FROM bins b
  JOIN (
    SELECT doc_id, c{c} AS val,
           row_number() OVER (PARTITION BY doc_id ORDER BY c{c}) - 1 AS rk
    FROM normedf
  ) v ON v.doc_id = b.doc_id
     AND v.rk = CAST(roundbankers(b.q * (b.n - 1), 0) AS INT)
)""")
        stripe_cols.append(
            f"(SELECT count(CASE WHEN q.qv <= f.c{c} THEN 1 END) - 1\n"
            f"          FROM q{c} q WHERE q.doc_id = f.doc_id) AS s{c}"
        )
    quants = ",\n".join(quant_parts)
    stripes = ",\n         ".join(stripe_cols)
    return f"""WITH
{pages_graph_ctes(n_pages)},
subo AS MATERIALIZED (
  -- sub_obj per merged token: pobj (ADP-governed) or nsubj (pre-root)
  SELECT *,
         (tag IN ('NOUN','PROPN','PRON','NUM') AND mi <> root_mi
          AND (gov IS NOT NULL OR mi < root_mi)) AS sub_flag
  FROM mdeps
),
tok_nodes_p AS MATERIALIZED (
  SELECT doc_id, node_key,
         CASE WHEN bool_or(is_ent) THEN 'ent'
              WHEN min(tag) IN ('NOUN', 'PROPN', 'VERB') THEN 'lem'
              ELSE 'dep' END AS kind,
         min_by(text, mi) AS surface, min(tag) AS pos,
         CASE WHEN bool_or(is_ent) OR min(tag) IN ('NOUN', 'VERB')
              THEN count(*) ELSE 0 END AS count,
         bool_or(sub_flag) AS sub_obj,
         min(mi) AS ord1,
         CASE WHEN bool_or(is_ent)
              THEN {_ner_meta_case('min_by(ent_label, mi)', 0)} END AS label
  FROM subo GROUP BY doc_id, node_key
),
iri_nodes_p AS MATERIALIZED (
  SELECT doc_id, iri AS node_key, 'iri' AS kind,
         {_ner_meta_case('lbl', 1)} AS surface,
         '{rdf_type}' AS pos,
         count(*) AS count, FALSE AS sub_obj,
         min(first_mi) AS ord1,
         {_ner_meta_case('lbl', 2)} AS label
  FROM (
    SELECT doc_id, min_by(ent_label, mi) AS lbl,
           {_ner_meta_case('min_by(ent_label, mi)', 0)} AS iri,
           min(mi) AS first_mi
    FROM subo WHERE is_ent GROUP BY doc_id, node_key
  ) WHERE iri IS NOT NULL
  GROUP BY doc_id, iri, lbl
),
chunk_surf AS MATERIALIZED (
  SELECT c.doc_id, c.s, c.ln, c.chunk_key,
         string_agg(t.text, ' ' ORDER BY t.mi) AS surface
  FROM mchunk_new c JOIN mkey t
    ON t.doc_id = c.doc_id AND t.mi BETWEEN c.s AND c.ln
  GROUP BY c.doc_id, c.s, c.ln, c.chunk_key
),
chu_nodes_p AS MATERIALIZED (
  SELECT doc_id, chunk_key AS node_key, 'chu' AS kind,
         min_by(surface, s) AS surface, 'noun_chunk' AS pos,
         count(*) AS count, FALSE AS sub_obj, min(s) AS ord1,
         CAST(NULL AS VARCHAR) AS label
  FROM chunk_surf GROUP BY doc_id, chunk_key
),
allnodes AS MATERIALIZED (
  SELECT *, 0 AS grp FROM tok_nodes_p
  UNION ALL SELECT *, 1 FROM iri_nodes_p
  UNION ALL SELECT *, 2 FROM chu_nodes_p
),
idn AS MATERIALIZED (
  SELECT doc_id, node_key, kind, surface, pos, count, sub_obj, label,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY grp, ord1) - 1 AS INT) AS node_id
  FROM allnodes
),
-- per-doc weighted edges (dep arcs + chunk membership + class links)
dep_w AS MATERIALIZED (
  SELECT s.doc_id, s.node_key AS src_key, h.node_key AS dst_key,
         count(*) AS w
  FROM mdeps s JOIN mdeps h ON h.doc_id = s.doc_id AND h.mi = s.head_mi
  WHERE s.node_key <> h.node_key
  GROUP BY s.doc_id, s.node_key, h.node_key
),
chu_w AS MATERIALIZED (
  SELECT c.doc_id, c.chunk_key AS src_key, t.node_key AS dst_key,
         count(*) AS w
  FROM mchunk_new c JOIN mkey t
    ON t.doc_id = c.doc_id AND t.mi BETWEEN c.s AND c.ln
  WHERE c.chunk_key <> t.node_key
  GROUP BY c.doc_id, c.chunk_key, t.node_key
),
iri_w AS MATERIALIZED (
  SELECT doc_id, src, dst, 1 AS w FROM iri_e
),
edges_w AS MATERIALIZED (
  SELECT * FROM dep_w UNION ALL SELECT * FROM chu_w UNION ALL SELECT * FROM iri_w
),
dpn AS MATERIALIZED (
  SELECT doc_id, node_id,
         CAST(count(*) OVER (PARTITION BY doc_id) AS DOUBLE) AS n
  FROM idn
),
dpe AS MATERIALIZED (
  SELECT e.doc_id, s.node_id AS src_id, d.node_id AS dst_id,
         CAST(sum(e.w) AS DOUBLE) AS w
  FROM edges_w e
  JOIN idn s ON s.doc_id = e.doc_id AND s.node_key = e.src_key
  JOIN idn d ON d.doc_id = e.doc_id AND d.node_key = e.dst_key
  GROUP BY e.doc_id, s.node_id, d.node_id
),
{docpr_ctes()},
neigh AS MATERIALIZED (
  SELECT doc_id, src_key, count(DISTINCT dst_key) AS nb
  FROM edges_w GROUP BY doc_id, src_key
),
feat AS MATERIALIZED (
  SELECT i.doc_id, i.node_key, i.node_id, i.kind, i.surface, i.pos,
         i.count, i.label,
         CASE WHEN i.pos = 'VERB' OR i.kind = 'iri' THEN 0 ELSE i.count END AS stacked,
         coalesce(nb.nb, 0) AS neighbors,
         CASE WHEN i.sub_obj THEN 1 ELSE 0 END AS subint,
         p.rank
  FROM idn i
  JOIN dp_final p ON p.doc_id = i.doc_id AND p.node_id = i.node_id
  LEFT JOIN neigh nb ON nb.doc_id = i.doc_id AND nb.src_key = i.node_key
),
w0 AS MATERIALIZED (
  SELECT *, CASE WHEN stacked < 1 THEN 0.0 ELSE rank END AS weight0 FROM feat
),
mx AS MATERIALIZED (
  SELECT doc_id, max(weight0) AS mw, max(stacked) AS ms,
         max(neighbors) AS mn, max(subint) AS mo, count(*) AS n
  FROM w0 GROUP BY doc_id
),
normedf AS MATERIALIZED (
  SELECT w.*,
         CASE WHEN m.mw > 0 THEN w.weight0 / m.mw ELSE 0.0 END AS c0,
         CASE WHEN m.ms > 0 THEN w.stacked * 1.0 / m.ms ELSE 0.0 END AS c1,
         CASE WHEN m.mn > 0 THEN w.neighbors * 1.0 / m.mn ELSE 0.0 END AS c2,
         CASE WHEN m.mo > 0 THEN w.subint * 1.0 / m.mo ELSE 0.0 END AS c3,
         m.n
  FROM w0 w JOIN mx m ON w.doc_id = m.doc_id
),
gbins AS MATERIALIZED (
  SELECT doc_id, n,
         greatest(CAST(roundbankers(ln(n) * 4.0, 0) AS INT), 1) AS g
  FROM mx
),
bins AS MATERIALIZED (
  SELECT gb.doc_id, gb.n, CAST(b.i AS INT) AS j,
         CASE WHEN gb.g = 1 THEN 0.0 ELSE b.i * 1.0 / (gb.g - 1) END AS q
  FROM gbins gb, unnest(range(0, gb.g)) AS b(i)
),
{quants},
striped AS MATERIALIZED (
  SELECT f.doc_id, f.node_key, f.node_id, f.kind, f.surface, f.pos,
         f.count, f.label, f.stacked, f.rank,
         {stripes}
  FROM normedf f
),
rms AS MATERIALIZED (
  SELECT *,
         CASE WHEN stacked < 1 THEN 0.0
              ELSE sqrt((s0*s0 + s1*s1 + s2*s2 + s3*s3) / 4.0) END AS rc0
  FROM striped
),
tot AS MATERIALIZED (SELECT doc_id, sum(rc0) AS t FROM rms GROUP BY doc_id),
rcn AS MATERIALIZED (
  SELECT r.*, CASE WHEN t.t > 0 THEN r.rc0 / t.t ELSE r.rc0 END AS rc
  FROM rms r JOIN tot t ON r.doc_id = t.doc_id
),
lp AS MATERIALIZED (
  -- the closed-form restack LP (doclevel/rank.py:76-93) per doc
  SELECT doc_id,
         sum(CASE WHEN kind = 'ent' THEN rc ELSE 0 END) AS sum_e,
         sum(CASE WHEN kind <> 'ent' THEN rc ELSE 0 END) AS sum_l,
         min(CASE WHEN kind = 'ent' AND rc > 0 THEN rc END) AS min_e,
         max(CASE WHEN kind <> 'ent' AND rc > 0 THEN rc END) AS max_l,
         count(CASE WHEN kind = 'ent' AND rc > 0 THEN 1 END) AS n_e,
         count(CASE WHEN kind <> 'ent' AND rc > 0 THEN 1 END) AS n_l
  FROM rcn GROUP BY doc_id
),
coeffs AS MATERIALIZED (
  SELECT doc_id, n_e, n_l,
    CASE
      WHEN max_l > 0 AND sum_e + sum_l * min_e / max_l > 0
           AND 1.0 / (sum_e + sum_l * min_e / max_l)
               >= (1.0 / (sum_e + sum_l * min_e / max_l)) * min_e / max_l
        THEN 1.0 / (sum_e + sum_l * min_e / max_l)
      WHEN sum_e + sum_l + min_e - max_l > 0
           AND (1.0 / (sum_e + sum_l + min_e - max_l)) * (min_e - max_l) >= 0
        THEN 1.0 / (sum_e + sum_l + min_e - max_l)
      ELSE CASE WHEN sum_e > 0 THEN 1.0 / sum_e ELSE 0.0 END
    END AS coef0,
    CASE
      WHEN max_l > 0 AND sum_e + sum_l * min_e / max_l > 0
           AND 1.0 / (sum_e + sum_l * min_e / max_l)
               >= (1.0 / (sum_e + sum_l * min_e / max_l)) * min_e / max_l
        THEN (1.0 / (sum_e + sum_l * min_e / max_l)) * min_e / max_l
      WHEN sum_e + sum_l + min_e - max_l > 0
           AND (1.0 / (sum_e + sum_l + min_e - max_l)) * (min_e - max_l) >= 0
        THEN 1.0 / (sum_e + sum_l + min_e - max_l)
      ELSE 0.0
    END AS coef1
  FROM lp
),
finalw AS MATERIALIZED (
  -- no-entity / no-lemma docs fall back to the RAW PageRank (rank.py:133)
  SELECT r.doc_id, r.node_id, r.surface AS text, r.pos, r.label, r.count,
         CASE WHEN c.n_e < 1 OR c.n_l < 1 THEN r.rank
              WHEN r.kind = 'ent' THEN r.rc * c.coef0
              ELSE r.rc * c.coef1 END AS weight
  FROM rcn r JOIN coeffs c ON r.doc_id = c.doc_id
),
phr AS MATERIALIZED (
  SELECT doc_id, node_id, text, pos, label, count, weight,
         CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY round(weight, 9) DESC, node_id
         ) - 1 AS INT) AS rank_pos
  FROM finalw WHERE weight > 0
)
SELECT doc_id, rank_pos, node_id, text, pos, label,
       CAST(count AS INT) AS count, round(weight, 6) AS weight
FROM phr WHERE rank_pos < {top}
"""


def _catalog_values() -> str:
    """The gazetteer catalog inlined as SQL VALUES rows — the same
    construction as linking.kg_catalog_from_gazetteer."""
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
    return ",\n   ".join(rows)


def kg_linking_second_pass_sql(n_pages: int = 150, *, min_prob: float = 0.8,
                               min_alias: float = 0.8) -> str:
    """Oracle for the two-channel linking flow
    (linking.link_entities_with_fallback) over arith_pages_typos:
    exact-surface links ('exact') plus best-fuzzy-alias links for
    unlinked entities ('search') via the same two blocking channels
    (last token, first initial), the same JW kernel
    (jaro_winkler_similarity), the same (sim, prob, iri) argmax, and
    the same strict > min_alias gate."""
    return f"""WITH
{pages_graph_ctes(n_pages, corpus_sql=arith_pages_typos_sql(n_pages))},
ents AS MATERIALIZED (
  SELECT node_key AS entity_key, min(surface) AS surface
  FROM ment GROUP BY node_key
),
catalog(surface_norm, iri, namespace, kg_label, prob) AS (VALUES
   {_catalog_values()}
),
normed AS MATERIALIZED (
  SELECT entity_key,
         lower(trim(regexp_replace(
           regexp_replace(surface, '[^A-Za-z ]', '', 'g'), ' +', ' ', 'g'))) AS _norm
  FROM ents
),
exact AS MATERIALIZED (
  SELECT n.entity_key, c.iri, c.namespace, c.kg_label, c.prob,
         'exact' AS channel
  FROM normed n JOIN catalog c ON n._norm = c.surface_norm
  WHERE c.prob >= {min_prob}
),
unlinked AS MATERIALIZED (
  SELECT n.entity_key, n._norm,
         string_split(n._norm, ' ')[len(string_split(n._norm, ' '))] AS _last,
         substring(n._norm, 1, 1) AS _init
  FROM normed n
  WHERE n.entity_key NOT IN (SELECT entity_key FROM exact)
),
cat AS (
  SELECT surface_norm, iri, namespace, kg_label, prob,
         string_split(surface_norm, ' ')[len(string_split(surface_norm, ' '))] AS _clast,
         substring(surface_norm, 1, 1) AS _cinit
  FROM catalog WHERE namespace = 'dbpedia'
),
cands AS (
  SELECT DISTINCT u.entity_key, u._norm,
         c.surface_norm, c.iri, c.namespace, c.kg_label, c.prob
  FROM unlinked u JOIN cat c
    ON u._last = c._clast OR u._init = c._cinit
),
scored AS (
  SELECT entity_key, iri, namespace, kg_label, prob AS cat_prob,
         jaro_winkler_similarity(_norm, surface_norm) AS _sim
  FROM cands
),
best AS (
  SELECT entity_key, iri, namespace, kg_label,
         round(_sim, 6) AS prob, 'search' AS channel
  FROM scored
  QUALIFY row_number() OVER (
    PARTITION BY entity_key
    ORDER BY round(_sim, 9) DESC, cat_prob DESC, iri ASC
  ) = 1 AND _sim > {min_alias}
)
SELECT * FROM exact
UNION ALL
SELECT * FROM best
ORDER BY entity_key, iri
"""


def kg_linking_sql(n_pages: int = 150, *, min_prob: float = 0.8) -> str:
    """Oracle for kg_linking over arith_pages: corpus entity keys linked
    against the gazetteer catalog (linking.kg_catalog_from_gazetteer,
    regenerated here from the same lists)."""
    catalog = _catalog_values()
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
