"""Checkpoint-resumable corpus-curation job: documents → curated
training shard, with per-stage lineage + metrics like the flagship ER
pipeline (plans.staged.StagedPipeline).

    near_dups (MinHash pairs → CC non-canonical members — the expensive
               branch, checkpointed so a resume never re-pairs)
      → verdicts (first-failing-gate ladder over one signal projection
                  + the repetition aggregate + the staged dup flag)
      → kept_docs (the curated corpus: input rows whose verdict is keep)
      → clean_docs (optional: C4-style boilerplate-line removal over the
                    keeps — line df is computed on the KEPT corpus, so a
                    near-dup flood cannot inflate a line over the
                    threshold after it was already discarded)
      → redacted_docs (optional: typed-placeholder PII redaction over the
                       final text — clean_docs when the boilerplate stage
                       ran, else the keeps; map-only, no shuffle)
      → shard (optional: reproducible deterministic_sample of the keeps)

Re-running with the same workdir resumes from the last completed stage;
the verdict/keep semantics are exactly ``webdata.curation_decisions``
(driver-verified by the ``corpus_curation`` oracle), so a staged run and
a one-shot operator call agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import webdata as W
from .staged import StagedPipeline


class CurationPipeline(StagedPipeline):
    def __init__(self, spark: SparkSession, workdir: str | None = None, *,
                 langs: tuple = ("en",),
                 quality_min: float = 0.76,
                 max_dup_word_frac: float = 0.65,
                 max_top_bigram_frac: float = 0.2,
                 max_pii_per_10k: float | None = None,
                 sample_fraction: float | None = None,
                 boilerplate_min_df: int | None = None,
                 redact_pii: bool = False,
                 **minhash_kwargs):
        super().__init__(spark, workdir)
        self.langs = langs
        self.quality_min = quality_min
        self.max_dup_word_frac = max_dup_word_frac
        self.max_top_bigram_frac = max_top_bigram_frac
        self.max_pii_per_10k = max_pii_per_10k
        self.sample_fraction = sample_fraction
        # None = stage off; an int enables remove_boilerplate_lines over
        # the kept corpus at that distinct-doc line-frequency threshold
        self.boilerplate_min_df = boilerplate_min_df
        self.redact_pii = redact_pii
        self.minhash_kwargs = minhash_kwargs

    def run(self, docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> dict[str, DataFrame]:
        near_dups = self._stage("near_dups", lambda: W.near_dup_members(
            docs, text_col=text_col, id_col=id_col, **self.minhash_kwargs
        ))
        verdicts = self._stage("verdicts", lambda: W.curation_decisions(
            docs, id_col=id_col, text_col=text_col,
            langs=self.langs, quality_min=self.quality_min,
            max_dup_word_frac=self.max_dup_word_frac,
            max_top_bigram_frac=self.max_top_bigram_frac,
            max_pii_per_10k=self.max_pii_per_10k,
            dupes=near_dups,
        ))
        keep_ids = verdicts.filter(F.col("keep")).select(id_col)
        # the curated corpus keeps the INPUT columns (text and any
        # passthrough metadata) — a doc_id-keyed join, AQE-broadcastable
        # when the keep set is small
        kept = self._stage("kept_docs", lambda: docs.join(keep_ids, id_col))
        out = {"near_dups": near_dups, "verdicts": verdicts, "kept_docs": kept}
        if self.boilerplate_min_df is not None:
            out["clean_docs"] = self._stage(
                "clean_docs",
                lambda: W.remove_boilerplate_lines(
                    kept, min_df=self.boilerplate_min_df,
                    text_col=text_col, id_col=id_col,
                ),
            )
        if self.redact_pii:
            from ..operators.pii import redact_pii as _redact

            # redact the FINAL text a trainer would see: the boilerplate-
            # stripped corpus when that stage ran, else the raw keeps
            src, tc = (
                (out["clean_docs"], "clean_text")
                if "clean_docs" in out
                else (kept, text_col)
            )
            out["redacted_docs"] = self._stage(
                "redacted_docs",
                lambda: _redact(src, text_col=tc, id_col=id_col),
            )
        if self.sample_fraction is not None:
            shard_ids = W.deterministic_sample(
                kept, self.sample_fraction, id_col=id_col
            ).select(id_col)
            out["shard"] = self._stage(
                "shard", lambda: kept.join(shard_ids, id_col)
            )
        self.write_lineage()
        return out


def training_manifest(
    docs,
    *,
    threshold: float = 0.7,
    val_pct: int = 10,
    test_pct: int = 10,
    target_bytes: int = 1 << 20,
):
    """The end-to-end training-data plan as ONE declarative DataFrame —
    (split, source, shard_idx, n_docs, n_bytes): curation verdict ladder
    → leakage-safe group split → byte-balanced shard assignment →
    manifest rollup. This is the table a training launcher consumes: a
    writer partitioned by (split, source, shard_idx) emits right-sized
    files whose membership is a pure function of the corpus — rerun the
    job tomorrow on different hardware and every document lands in the
    same file.

    Composition, not new machinery: curation_decisions (near-dup
    closure + lang/quality/repetition ladder), leakage_safe_split
    (dup-group-keyed Lehmer split — exact duplicates cannot straddle
    train/val/test), plan_shards over the composite (split|source) key
    (grouped-cumsum anti-funnel kernel, integer arithmetic end to end).
    Every stage is individually oracle-verified; the manifest adds one
    semi-join, one id-keyed join, and one vocabulary-sized rollup.
    """
    from pyspark.sql import functions as F

    from ..operators.webdata import (
        curation_decisions, leakage_safe_split, plan_shards,
    )

    verdicts = curation_decisions(docs, threshold=threshold)
    kept = docs.join(
        verdicts.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )
    sp = leakage_safe_split(kept, val_pct=val_pct, test_pct=test_pct)
    labeled = (
        kept.select("doc_id", "source", "n_chars")
        .join(sp.select("doc_id", "split"), "doc_id")
        .withColumn("_grp", F.concat_ws("|", "split", "source"))
    )
    sh = plan_shards(
        labeled, target_bytes=target_bytes, source_col="_grp"
    )
    return (
        sh.join(labeled.select("doc_id", "split", "source", "n_chars"), "doc_id")
        .groupBy("split", "source", "shard_idx")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_bytes"),
        )
    )
