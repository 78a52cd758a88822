"""DuckDB oracle SQL for the flagship ER pipeline.

Generates, from the SAME lex tables the Python tagger uses
(``textgraphs_spark.nlp.lex``), an ANSI-ish SQL reproduction of the whole
chain: tokenize → POS-tag → lemmatize → entity universe → blocking (exact
key + md5-family MinHash bands) → Jaro-Winkler name scoring → transitive
clustering (recursive CTE) → cluster summary. The driver runs it on
DuckDB against the raw ``documents`` table and hash-compares with the
Spark result, making the flagship query value-verified end to end.

Preconditions (asserted by the corpus this oracle is used on, the
driver's synthetic ``documents`` tables — lowercase ``[a-z0-9 ]`` text):

* no uppercase characters → the tagger's PROPN branch, NER merging, and
  sentence-initial special case never fire;
* no sentence punctuation → one sentence per document, so doc-global
  and sentence-local token indices coincide;
* no blocking key exceeds ``max_block_size`` → salting never triggers
  (salt shards use xxhash64, which DuckDB cannot reproduce).

The SQL is generated (IN-lists, CASE cascades, 16 signature columns)
rather than handwritten, so a lex edit changes both engines in lockstep.
"""

from __future__ import annotations

from ..nlp import lex
from ..operators.blocking import minhash_xor_constants


def _inlist(words) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words))


def _irregular_case(col: str) -> str:
    """CASE mapping surface → irregular lemma (lex.IRREGULAR_LEMMA)."""
    whens = "\n      ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in sorted(lex.IRREGULAR_LEMMA.items())
    )
    return f"CASE {col}\n      {whens}\n      ELSE NULL END"


def _verb_s_test(col: str) -> str:
    """SQL for ``lemmatize(tok, 'VERB') in lex.VERB`` where tok ends in
    's' (the only context _tag uses it) — mirrors nlp/pipeline.py:100."""
    verbs = _inlist(lex.VERB)
    irr_verb = [k for k, v in lex.IRREGULAR_LEMMA.items() if v in lex.VERB]
    return f"""(
    CASE
      WHEN {col} IN ({_inlist(irr_verb)}) THEN TRUE
      WHEN {col} LIKE '%ies' AND length({col}) > 4
        THEN substr({col}, 1, length({col}) - 3) || 'y' IN ({verbs})
      WHEN {col} LIKE '%es' AND length({col}) > 3
           AND substr({col}, length({col}) - 2, 1) IN ('s', 'x', 'z', 'o')
        THEN substr({col}, 1, length({col}) - 2) IN ({verbs})
      WHEN {col} LIKE '%s' AND {col} NOT LIKE '%ss'
           AND {col} NOT LIKE '%us' AND {col} NOT LIKE '%is'
           AND length({col}) > 3
        THEN substr({col}, 1, length({col}) - 1) IN ({verbs})
      ELSE {col} IN ({verbs})
    END)"""


def tag_case(col: str) -> str:
    """The full _tag cascade (nlp/pipeline.py:67-103) for lowercase
    tokens — the PROPN branch is omitted per the module preconditions."""
    irr_verb = [k for k, v in lex.IRREGULAR_LEMMA.items() if v in lex.VERB]
    return f"""CASE
      WHEN regexp_matches({col}, '^[0-9]+$') THEN 'NUM'
      WHEN {col} IN ({_inlist(lex.DET)}) THEN 'DET'
      WHEN {col} IN ({_inlist(lex.AUX)}) THEN 'AUX'
      WHEN {col} IN ({_inlist(lex.ADP)}) THEN 'ADP'
      WHEN {col} IN ({_inlist(lex.PRON)}) THEN 'PRON'
      WHEN {col} IN ({_inlist(lex.CCONJ)}) THEN 'CCONJ'
      WHEN {col} IN ({_inlist(lex.SCONJ)}) THEN 'SCONJ'
      WHEN {col} IN ({_inlist(lex.ADV)}) THEN 'ADV'
      WHEN {col} IN ({_inlist(lex.VERB)}) OR {col} IN ({_inlist(irr_verb)}) THEN 'VERB'
      WHEN {col} IN ({_inlist(lex.ADJ)}) THEN 'ADJ'
      WHEN {col} LIKE '%ly' AND length({col}) > 4 THEN 'ADV'
      WHEN ({col} LIKE '%ing' OR {col} LIKE '%ed')
           AND {col} NOT IN ({_inlist(lex.ING_ED_NOUNS)})
           AND length({col}) > 4 THEN 'VERB'
      WHEN ({col} LIKE '%ous' OR {col} LIKE '%ful' OR {col} LIKE '%ive'
            OR {col} LIKE '%able' OR {col} LIKE '%ible')
           AND length({col}) > 5 THEN 'ADJ'
      WHEN {col} LIKE '%s' AND {col} NOT LIKE '%ss' AND {col} NOT LIKE '%us'
           AND {col} NOT LIKE '%is' AND {_verb_s_test(col)} THEN 'VERB'
      ELSE 'NOUN'
    END"""


def noun_lemma_case(col: str) -> str:
    """lemmatize(tok, 'NOUN') (nlp/pipeline.py:107-142): irregular dict
    first, then plural stripping."""
    return f"""coalesce(
      {_irregular_case(col)},
      CASE
        WHEN {col} LIKE '%ies' AND length({col}) > 4
          THEN substr({col}, 1, length({col}) - 3) || 'y'
        WHEN ({col} LIKE '%sses' OR {col} LIKE '%shes' OR {col} LIKE '%ches'
              OR {col} LIKE '%xes' OR {col} LIKE '%zes')
             AND length({col}) > 4
          THEN substr({col}, 1, length({col}) - 2)
        WHEN {col} LIKE '%s' AND {col} NOT LIKE '%ss' AND {col} NOT LIKE '%us'
             AND {col} NOT LIKE '%is' AND length({col}) > 3
          THEN substr({col}, 1, length({col}) - 1)
        ELSE {col}
      END)"""


def entities_ctes(table: str = "documents") -> str:
    """CTE chain documents → entities(entity_key, surface, mention_count,
    doc_freq) — the SQL twin of extract_entities(include_lemmas=True) +
    the ERPipeline entity aggregation (min-surface canonicalization)."""
    return f"""tok AS (
  SELECT doc_id, CAST(r.i AS INT) AS pos, toks[CAST(r.i AS INT)] AS tok
  FROM (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks FROM {table}) d,
       unnest(range(1, len(toks) + 1)) AS r(i)
),
tagged AS (
  SELECT doc_id, pos, tok,
    {tag_case('tok')} AS pos_tag
  FROM tok
),
ent_tok AS (
  SELECT doc_id, pos, tok,
    {noun_lemma_case('tok')} AS lemma
  FROM tagged WHERE pos_tag IN ('NOUN', 'PROPN')
),
doc_ents AS (
  -- per-doc node upsert: surface = FIRST occurrence of the key in the doc
  SELECT doc_id, lemma || '.' || 'NOUN' AS entity_key,
         min_by(tok, pos) AS surface, count(*) AS cnt
  FROM ent_tok GROUP BY doc_id, lemma
),
entities AS (
  SELECT entity_key, min(surface) AS surface,
         CAST(sum(cnt) AS BIGINT) AS mention_count,
         count(*) AS doc_freq
  FROM doc_ents GROUP BY entity_key
)"""


def _minhash_channel(num_hashes: int = 16, bands: int = 4, shingle: int = 3) -> str:
    """Band-key channel over ``norm`` — md5 hash family, same layout as
    blocking.minhash_band_keys / band_keys_from_signatures."""
    consts = minhash_xor_constants(num_hashes)
    rows = num_hashes // bands
    mins = ",\n    ".join(f"min(xor(_hb, {c})) AS h{s}" for s, c in enumerate(consts))
    band_cases = "\n      ".join(
        "WHEN {b} THEN concat_ws('_', {cols})".format(
            b=b, cols=", ".join(f"h{b * rows + r}" for r in range(rows))
        )
        for b in range(bands)
    )
    band_ids = ", ".join(f"({b})" for b in range(bands))
    return f"""esh AS (
  SELECT entity_key, substr(norm, CAST(i.i AS INT), {shingle}) AS _sh
  FROM keyed, unnest(range(1, greatest(length(norm) - {shingle - 1}, 1) + 1)) AS i(i)
),
ehb AS (SELECT entity_key, CAST('0x' || substr(md5(_sh), 1, 15) AS BIGINT) AS _hb FROM esh),
esig AS (
  SELECT entity_key,
    {mins}
  FROM ehb GROUP BY entity_key
),
ebands AS (
  SELECT entity_key, b.band_id,
    CASE b.band_id
      {band_cases}
    END AS band_key
  FROM esig, (VALUES {band_ids}) AS b(band_id)
)"""


def _name_parts_expr(col: str) -> str:
    """_name_parts (scoring.py:86-91): non-alpha → space, split, drop
    empties. Returns a SQL list expression."""
    return (
        f"list_filter(string_split_regex("
        f"regexp_replace(lower({col}), '[^a-z]', ' ', 'g'), ' +'), x -> x <> '')"
    )


def er_clusters_sql(table: str = "documents", *, min_similarity: float = 0.9) -> str:
    """The complete flagship oracle: documents → cluster summary."""
    return f"""WITH RECURSIVE
{entities_ctes(table)},
keyed AS (
  SELECT entity_key, surface,
         lower(regexp_replace(surface, '[^A-Za-z ]', '', 'g')) AS norm
  FROM entities
),
kparts AS (
  SELECT entity_key, surface, norm,
         string_split_regex(trim(norm), ' +') AS toks
  FROM keyed
),
chan_key AS (
  SELECT entity_key,
         concat_ws('|', toks[len(toks)], substr(toks[1], 1, 1)) AS bkey
  FROM kparts
),
{_minhash_channel()},
chan_mh AS (
  SELECT entity_key, concat_ws('|', 'mh', band_id, band_key) AS bkey FROM ebands
),
blocked AS (
  SELECT * FROM chan_key UNION ALL SELECT * FROM chan_mh
),
cands AS (
  SELECT DISTINCT a.entity_key AS left_id, b.entity_key AS right_id
  FROM blocked a JOIN blocked b ON a.bkey = b.bkey AND a.entity_key < b.entity_key
),
scored AS (
  SELECT c.left_id, c.right_id, lp.p AS lp, rp.p AS rp
  FROM cands c
  JOIN (SELECT entity_key, {_name_parts_expr('surface')} AS p FROM entities) lp
    ON lp.entity_key = c.left_id
  JOIN (SELECT entity_key, {_name_parts_expr('surface')} AS p FROM entities) rp
    ON rp.entity_key = c.right_id
),
nm AS (
  SELECT left_id, right_id,
         coalesce(lp[1], '') AS fa, coalesce(lp[len(lp)], '') AS la,
         coalesce(rp[1], '') AS fb, coalesce(rp[len(rp)], '') AS lb
  FROM scored
),
matches AS (
  SELECT left_id, right_id
  FROM nm
  WHERE la <> '' AND lb <> ''
    AND 0.35 * (CASE
                  WHEN fa = fb AND fa <> '' THEN 1.0
                  WHEN fa <> '' AND fb <> ''
                       AND (length(fa) = 1 OR length(fb) = 1)
                       AND substr(fa, 1, 1) = substr(fb, 1, 1) THEN 0.95
                  ELSE jaro_winkler_similarity(fa, fb)
                END)
      + 0.65 * jaro_winkler_similarity(la, lb) >= {min_similarity}
),
edgesu AS (
  SELECT left_id AS a, right_id AS b FROM matches
  UNION SELECT right_id, left_id FROM matches
),
reach(node, r) AS (
  SELECT entity_key, entity_key FROM entities
  UNION
  SELECT e.b, x.r FROM reach x JOIN edgesu e ON e.a = x.node
),
comp AS (
  SELECT node AS entity_key, min(r) AS cluster_id FROM reach GROUP BY node
),
assignments AS (
  SELECT e.entity_key, c.cluster_id, e.surface, e.mention_count
  FROM entities e JOIN comp c ON e.entity_key = c.entity_key
)
SELECT cluster_id,
       count(*) AS n_forms,
       CAST(sum(mention_count) AS BIGINT) AS n_mentions,
       array_to_string(list_sort(list(DISTINCT surface)), '|') AS members,
       max(mention_count) AS max_mentions
FROM assignments
GROUP BY cluster_id
ORDER BY n_mentions DESC, cluster_id
"""
