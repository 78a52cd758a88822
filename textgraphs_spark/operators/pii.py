"""PII detection + redaction signals for web-corpus curation.

The reference (DerwenAI/textgraphs) has no PII surface; this family is
part of the training-data-curation toolkit the graft adds (the
C4/CCNet/Dolma-style preprocessing a 100 TB crawl needs before
training). Everything here is map-only whole-stage-codegen: one
projection of ``regexp_count`` / ``regexp_replace`` columns per corpus
scan, zero shuffles, so at 10^12 documents the cost is exactly one pass
over the text bytes with no exchange at any cluster size.

Pattern discipline: every regex is restricted to the syntax Java regex
(Spark codegen) and RE2 (DuckDB) interpret identically — ASCII classes,
``\\d`` (ASCII-only in both), ``\\b`` word boundaries, bounded repeats,
no backreferences or lookaround — so each operator ships a
byte-reproducible DuckDB twin (``*_select``) shared by the driver
oracle and the engine-parity fuzz test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, pattern, placeholder) — REDACTION ORDER IS CONTRACT: counts are
# taken on the raw text in one projection (the classes are mutually
# non-overlapping by construction: 3-3-4 phones vs 3-2-4 ids vs 4-octet
# IPs vs @-anchored emails), then replacements chain in this order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("id", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_count_cols(text_col: str = "text") -> dict[str, Column]:
    """Per-kind PII occurrence counts as pure codegen columns over one
    text column (NULL text counts as empty). Keys are ``n_email``,
    ``n_ipv4``, ``n_id``, ``n_phone``."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return {
        f"n_{kind}": F.regexp_count(t, F.lit(pat)).cast("long")
        for kind, pat, _ in PII_PATTERNS
    }


def pii_signals(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII census — (id, n_email, n_ipv4, n_id, n_phone,
    n_pii, pii_per_10k_chars). The curation-filter signal: corpora gate
    on the density column (e.g. drop > 5 hits / 10k chars) without ever
    materializing matches. One map-only projection; the density is
    rounded to 6 decimals so both engines hash identically."""
    counts = pii_count_cols(text_col)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    n_chars = F.length(F.coalesce(F.col(text_col), F.lit("")))
    sel = [F.col(id_col)]
    sel += [c.alias(name) for name, c in counts.items()]
    sel.append(total.alias("n_pii"))
    sel.append(
        F.when(n_chars > 0, F.round(total * 10000.0 / n_chars, 6))
        .otherwise(F.lit(0.0))
        .alias("pii_per_10k_chars")
    )
    return docs.select(*sel)


def redact_pii(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII redaction — the ACTION for this family: every match replaced
    by its typed placeholder, counts taken on the raw text in the same
    projection — (id, clean_text, n_email, n_ipv4, n_id, n_phone,
    n_redacted). Replacements chain in ``PII_PATTERNS`` order;
    placeholders contain no digits so later patterns can never re-match
    earlier rewrites. Map-only, no shuffle at any scale."""
    counts = pii_count_cols(text_col)
    clean = F.coalesce(F.col(text_col), F.lit(""))
    total = None
    for (_, pat, repl), c in zip(PII_PATTERNS, counts.values()):
        clean = F.regexp_replace(clean, pat, repl)
        total = c if total is None else total + c
    sel = [F.col(id_col), clean.alias("clean_text")]
    sel += [c.alias(name) for name, c in counts.items()]
    sel.append(total.alias("n_redacted"))
    return docs.select(*sel)


# ---------------------------------------------------------------------------
# DuckDB twins — shared by the driver oracle and the fuzz parity test


def _count_sql(t: str, pat: str) -> str:
    return f"CAST(len(regexp_extract_all({t}, '{pat}')) AS BIGINT)"


def pii_signals_select(
    source_sql: str, *, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`pii_signals` over any (id, text) relation —
    same patterns, same NULL-as-empty convention, same rounded
    density."""
    t = f"coalesce({text_col}, '')"
    counts = {kind: _count_sql(t, pat) for kind, pat, _ in PII_PATTERNS}
    total = " + ".join(counts.values())
    cols = ",\n  ".join(f"{c} AS n_{k}" for k, c in counts.items())
    return f"""
WITH src AS ({source_sql})
SELECT {id_col},
  {cols},
  {total} AS n_pii,
  CASE WHEN length({t}) > 0
       THEN round(({total}) * 10000.0 / length({t}), 6)
       ELSE 0.0 END AS pii_per_10k_chars
FROM src
"""


def pii_redact_select(
    source_sql: str, *, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`redact_pii` — same chained global
    replacements in ``PII_PATTERNS`` order, counts on the raw text."""
    t = f"coalesce({text_col}, '')"
    clean = t
    for _, pat, repl in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    counts = {kind: _count_sql(t, pat) for kind, pat, _ in PII_PATTERNS}
    total = " + ".join(counts.values())
    cols = ",\n  ".join(f"{c} AS n_{k}" for k, c in counts.items())
    return f"""
WITH src AS ({source_sql})
SELECT {id_col},
  {clean} AS clean_text,
  {cols},
  {total} AS n_redacted
FROM src
"""


def k_anonymity_census(
    df: DataFrame,
    qi_cols: list[str],
    *,
    ks: tuple[int, ...] = (2, 5, 10, 25),
) -> DataFrame:
    """Re-identification risk census over a quasi-identifier column set
    (Sweeney's k-anonymity): for each k, how many QI groups — and what
    share of ROWS — sit in groups smaller than k. The release-gate
    number for publishing corpus slices: a row in a group of 1 is
    singled out by its quasi-identifiers alone.

    Output: (k, n_groups, groups_below, rows_below, share_below)
    ordered by k; ``n_groups``/totals repeat per k so each row is
    self-contained.

    Scale: ONE hash agg over the QI key (map-side combining; the group
    table is vocabulary-sized, not corpus-sized), then a tiny
    groups x ks explode and a |ks|-row roll-up. The corpus is scanned
    once, never shuffled by row.
    """
    groups = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count("*").cast("long").alias("m")
    )
    kf = F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("k")
    per = groups.select("m", kf)
    return (
        per.groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum((F.col("m") < F.col("k")).cast("long")).alias("groups_below"),
            F.sum(F.when(F.col("m") < F.col("k"), F.col("m")).otherwise(0))
            .cast("long").alias("rows_below"),
            F.round(
                F.sum(F.when(F.col("m") < F.col("k"), F.col("m")).otherwise(0))
                / F.sum("m"),
                6,
            ).alias("share_below"),
        )
        .orderBy("k")
    )


def k_anonymity_census_select(
    source_sql: str,
    qi_exprs: list[str],
    *,
    ks: tuple[int, ...] = (2, 5, 10, 25),
) -> str:
    """DuckDB twin of ``k_anonymity_census`` — same group table, same
    per-k conditional roll-up. ``qi_exprs`` are SQL expressions (may
    alias computed bands)."""
    qi = ", ".join(qi_exprs)
    kvals = ", ".join(f"({int(k)})" for k in ks)
    return f"""WITH src AS ({source_sql}),
groups AS (
  SELECT count(*) AS m FROM src GROUP BY {qi}
),
ks(k) AS (VALUES {kvals})
SELECT k,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN m < k THEN 1 ELSE 0 END) AS BIGINT) AS groups_below,
       CAST(sum(CASE WHEN m < k THEN m ELSE 0 END) AS BIGINT) AS rows_below,
       round(sum(CASE WHEN m < k THEN m ELSE 0 END) * 1.0 / sum(m), 6)
         AS share_below
FROM groups, ks
GROUP BY k
ORDER BY k
"""
