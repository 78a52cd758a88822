"""Stateful streaming sessionization (applyInPandasWithState)."""

import time
from datetime import datetime, timedelta

from textgraphs_spark.streaming.events import read_events_stream, run_available_now
from textgraphs_spark.streaming.sessions import stream_sessionize

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _write(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(1) \
        .write.mode("append").parquet(path)


def test_stream_sessionize_closes_on_gap_and_timeout(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    # user 1: two sessions split by a 2h in-stream gap; the second session
    # is later closed by the watermark timeout once user 2's far-future
    # event advances event time.
    _write(spark, src, [
        (1, T0),
        (1, T0 + timedelta(minutes=5)),
        (1, T0 + timedelta(hours=2)),
    ])
    time.sleep(1.1)  # distinct mtime => deterministic file order
    _write(spark, src, [(2, T0 + timedelta(hours=12))])

    stream = read_events_stream(
        spark, src, max_files_per_trigger=1
    ).select("user_id", "ts")
    out = stream_sessionize(
        stream, gap_minutes=30, watermark="10 minutes"
    )
    run_available_now(
        out, checkpoint=ckpt, table_name="sessions_out", output_mode="append"
    )
    rows = {
        (r.user_id, r.session_seq): r
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # session 1 closed in-stream by the 2h gap
    s1 = rows[(1, 1)]
    assert s1.n_events == 2
    assert (s1.end_us - s1.start_us) == 5 * 60 * 1_000_000
    # session 2 closed by event-time timeout when the watermark advanced
    s2 = rows[(1, 2)]
    assert s2.n_events == 1
    # user 2's open session is still in state — not emitted
    assert (2, 1) not in rows


def test_stream_dedup_within_watermark(spark, tmp_path):
    from textgraphs_spark.streaming.events import stream_dedup

    src = str(tmp_path / "dups")
    ckpt = str(tmp_path / "dck")
    rows = [(1, T0), (1, T0), (2, T0 + timedelta(minutes=1)), (1, T0)]
    spark.createDataFrame(rows, "event_id long, ts timestamp").coalesce(1) \
        .write.parquet(src)
    stream = read_events_stream(spark, src)
    out = stream_dedup(stream, keys=["event_id"], watermark="10 minutes")
    run_available_now(out, checkpoint=ckpt, table_name="dedup_out")
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert sorted(r.event_id for r in got) == [1, 2]


def test_stream_extract_builds_on_stream(spark, tmp_path):
    """_respread must not force batch planning on a streaming source."""
    from textgraphs_spark.streaming.events import run_available_now
    from textgraphs_spark.streaming.sessions import stream_sessionize  # noqa: F401
    from textgraphs_spark.operators.extract import extract_graphs

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "Werner Herzog met Anna Klein in Germany.")], "doc_id long, text string"
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = extract_graphs(stream)          # must not raise at plan time
    run_available_now(
        out.select("doc_id"), checkpoint=str(tmp_path / "eck"),
        table_name="ext_out",
    )
    assert spark.sql("SELECT * FROM ext_out").count() == 1


def test_stream_sessionize_seq_monotone_after_timeout(spark, tmp_path):
    """session_seq keeps counting after a timeout-closed session."""
    src = str(tmp_path / "seq")
    ckpt = str(tmp_path / "sck")
    _write(spark, src, [(1, T0)])
    time.sleep(1.1)
    _write(spark, src, [(9, T0 + timedelta(hours=12))])   # closes u1 s1
    time.sleep(1.1)
    _write(spark, src, [(1, T0 + timedelta(hours=13))])   # u1 session 2
    time.sleep(1.1)
    _write(spark, src, [(9, T0 + timedelta(hours=48))])   # closes u1 s2
    stream = read_events_stream(spark, src, max_files_per_trigger=1) \
        .select("user_id", "ts")
    out = stream_sessionize(stream, gap_minutes=30, watermark="10 minutes")
    run_available_now(out, checkpoint=ckpt, table_name="seq_out")
    got = {
        (r.user_id, r.session_seq)
        for r in spark.sql("SELECT * FROM seq_out").collect()
    }
    assert (1, 1) in got and (1, 2) in got


def test_stream_sessionize_late_event_no_regression(spark, tmp_path):
    """A late-but-within-watermark event never regresses boundaries."""
    src = str(tmp_path / "late")
    ckpt = str(tmp_path / "lck")
    _write(spark, src, [(1, T0)])                              # 12:00
    time.sleep(1.1)
    # late 11:30 (within 2h watermark) + 12:40 (gap > 30m closes session)
    _write(spark, src, [
        (1, T0 - timedelta(minutes=30)), (1, T0 + timedelta(minutes=40)),
    ])
    time.sleep(1.1)
    _write(spark, src, [(9, T0 + timedelta(hours=12))])        # flush
    stream = read_events_stream(spark, src, max_files_per_trigger=1) \
        .select("user_id", "ts")
    out = stream_sessionize(stream, gap_minutes=30, watermark="2 hours")
    run_available_now(out, checkpoint=ckpt, table_name="late_out")
    rows = spark.sql("SELECT * FROM late_out WHERE user_id = 1").collect()
    assert rows, "no session emitted"
    for r in rows:
        assert r.end_us >= r.start_us
    first = next(r for r in rows if r.session_seq == 1)
    assert first.n_events == 2     # 12:00 + the late 11:30 straggler


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Closed sessions from the stream == batch sessionize on the same
    events (for every session the watermark has passed)."""
    import random

    from pyspark.sql import functions as F

    from textgraphs_spark.operators.analytics import session_stats

    rng = random.Random(23)
    rows = [
        (u, T0 + timedelta(minutes=rng.randint(0, 300)))
        for u in range(1, 5) for _ in range(12)
    ]
    src = str(tmp_path / "eq")
    _write(spark, src, rows)
    time.sleep(1.1)
    flush = [(99, T0 + timedelta(days=2))]   # advances the watermark
    _write(spark, src, flush)

    stream = read_events_stream(spark, src, max_files_per_trigger=1) \
        .select("user_id", "ts")
    out = stream_sessionize(stream, gap_minutes=30, watermark="10 minutes")
    run_available_now(out, checkpoint=str(tmp_path / "eqck"), table_name="eq_out")
    streamed = {
        (r.user_id, r.session_seq, r.n_events, r.start_us, r.end_us)
        for r in spark.sql("SELECT * FROM eq_out").collect()
    }

    ev = spark.createDataFrame(
        [(i, u, ts) for i, (u, ts) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp",
    )
    batch = {
        (r.user_id, r.session_seq, r.n_events, r.start_us, r.end_us)
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    assert streamed == batch


def test_simhash_col_matches_batch_kernel(spark):
    """The stateless per-row SimHash expression is bit-identical to the
    groupBy aggregation kernel."""
    from pyspark.sql import functions as F

    from textgraphs_spark.operators.dedup import simhash, simhash_col

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 3} shared tail words") for i in range(20)]
        + [(100, ""), (101, "one")],
        "doc_id long, text string",
    )
    batch = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    exprv = {
        r.doc_id: r.fp
        for r in docs.select("doc_id", simhash_col("text").alias("fp")).collect()
    }
    # the aggregation kernel emits no row for token-less docs; the
    # stateless expression gives them fingerprint 0 (all sums 0)
    assert exprv.pop(100) == 0
    assert batch == exprv


def test_stream_near_dup_candidates(spark, tmp_path):
    """Near-identical docs arriving within the lag window are flagged by
    the band self-join; the result matches the batch near-dup operator."""
    import pandas as pd
    from pyspark.sql import functions as F

    from textgraphs_spark.operators.dedup import simhash_near_dup_pairs
    from textgraphs_spark.streaming.events import (
        run_available_now, stream_near_dup_candidates,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(6):
        # three near-dup pairs (i, i+100) + unrelated docs
        rows.append((i, base + f" tail {i}", f"2024-01-01 10:0{i}:00"))
        rows.append((i + 100, base + f" tail {i} extra", f"2024-01-01 10:0{i}:30"))
        rows.append((i + 200, f"completely different text number {i} about "
                              f"unrelated topic {i * 7}", f"2024-01-01 10:0{i}:15"))
    src = tmp_path / "neardup_src"
    src.mkdir()
    pd.DataFrame(rows, columns=["doc_id", "text", "ts"]).to_parquet(
        src / "part0.parquet"
    )

    schema = "doc_id long, text string, ts string"
    stream = (
        spark.readStream.schema(schema).parquet(str(src))
    )
    out = stream_near_dup_candidates(stream, watermark="10 minutes",
                                     max_lag="10 minutes", max_hamming=8)
    run_available_now(out, checkpoint=str(tmp_path / "ck"), table_name="nd_out")
    got = {
        frozenset((r.left_id, r.right_id))
        for r in spark.sql("SELECT DISTINCT left_id, right_id FROM nd_out").collect()
    }
    # streamed left/right is time-ordered; batch is id-ordered — compare
    # the unordered pair sets
    batch_docs = spark.createDataFrame(
        [(d, t) for d, t, _ in rows], "doc_id long, text string"
    )
    want = {
        frozenset((r.left_id, r.right_id))
        for r in simhash_near_dup_pairs(batch_docs, max_hamming=8).collect()
    }
    assert want, "fixture must contain near-dups"
    assert got == want


def test_stream_contamination_matches_batch(spark, tmp_path):
    """Streaming decontamination (inlined eval grams, stateless) must
    emit exactly the batch operator's rows over the same corpus."""
    import pandas as pd

    from textgraphs_spark.operators.webdata import contaminated_docs
    from textgraphs_spark.streaming.events import stream_contamination

    eval_rows = [(100, "the exact benchmark answer string here")]
    corpus_rows = [
        (0, "prefix words the exact benchmark answer string here suffix"),
        (1, "entirely unrelated corpus document with different words"),
        (2, "answer string here exact benchmark the"),
        (3, "more filler the exact benchmark answer string here again"),
    ]
    src = tmp_path / "contam_src"
    src.mkdir()
    pd.DataFrame(corpus_rows, columns=["doc_id", "text"]).to_parquet(
        src / "part0.parquet"
    )
    eval_docs = spark.createDataFrame(eval_rows, "doc_id long, text string")

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    out = stream_contamination(stream, eval_docs, n=4)
    assert out.isStreaming
    run_available_now(out, checkpoint=str(tmp_path / "cck"), table_name="contam_out")
    got = {
        tuple(r) for r in spark.sql(
            "SELECT doc_id, n_grams, n_matched, overlap_frac FROM contam_out"
        ).collect()
    }
    batch_docs = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    want = {tuple(r) for r in contaminated_docs(batch_docs, eval_docs, n=4).collect()}
    assert want, "fixture must contain contaminated docs"
    assert got == want


def test_stream_quality_signals_match_batch(spark, tmp_path):
    """Stateless streaming quality/lang signals must emit exactly the
    batch operators' values over the same corpus."""
    import pandas as pd

    from textgraphs_spark.operators.textquality import lang_id, quality_score
    from textgraphs_spark.streaming.events import stream_quality_signals

    rows = [
        (0, "the quiet analyst wrote careful notes about spark plans"),
        (1, "der schnelle braune fuchs springt und ist nicht mit auf dem feld"),
        (2, "el rapido zorro es en la casa con una pluma por las tardes"),
        (3, "x!!!"),
        (4, ""),
    ]
    src = tmp_path / "q_src"
    src.mkdir()
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(src / "p.parquet")

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    out = stream_quality_signals(stream)
    assert out.isStreaming
    run_available_now(out, checkpoint=str(tmp_path / "qck"), table_name="quality_out")
    got = {
        r["doc_id"]: (r["pred_lang"], r["quality"], r["n_words"])
        for r in spark.sql("SELECT * FROM quality_out").collect()
    }
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    lang = {r["doc_id"]: r["pred_lang"] for r in lang_id(batch).collect()}
    qual = {r["doc_id"]: (r["quality"], r["n_words"]) for r in quality_score(batch).collect()}
    assert len(got) == 5
    for d, (pl, q, n) in got.items():
        assert pl == lang[d] and (q, n) == qual[d]
    assert got[1][0] == "de" and got[2][0] == "es"  # fixture exercises non-en


def test_stream_er_matches_batch_and_skips_replay(spark, tmp_path):
    """Streaming incremental ER (foreachBatch -> run()/update() folds):
    after draining 3 micro-batches the committed assignments must equal a
    one-shot batch run over the union, and a replayed batch id must be
    skipped by the committed high-water mark (update() is not
    idempotent)."""
    from pyspark.sql import functions as F

    from textgraphs_spark.plans.er_pipeline import ERPipeline
    from textgraphs_spark.sources.pages import synth_pages
    from textgraphs_spark.streaming.er import (
        committed, er_fold_batch, read_current, stream_er_updates,
    )

    docs = synth_pages(spark, 240).select(
        F.xxhash64("url").alias("doc_id"), "text"
    ).cache()
    src = tmp_path / "er_src"
    src.mkdir()
    for part in range(3):  # 3 files => 3 deterministic micro-batches
        docs.filter(F.pmod("doc_id", F.lit(3)) == part).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    wd = str(tmp_path / "er_wd")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_er_updates(stream, wd, checkpoint=str(tmp_path / "er_ck"))
    q.awaitTermination()

    got = sorted(map(tuple, read_current(spark, wd).collect()))
    want = sorted(map(tuple, ERPipeline(spark).run_lean(docs).collect()))
    assert got == want
    assert len(got) > 0
    assert committed(spark, wd) == (2, 2)  # 3 folds -> snapshots v0..v2

    # replaying an already-folded batch id is a no-op
    dup = docs.filter(F.pmod("doc_id", F.lit(3)) == 0)
    assert er_fold_batch(dup, 0, wd) is False
    assert sorted(map(tuple, read_current(spark, wd).collect())) == got

    # a genuinely new batch id still folds (the stream can resume)
    assert er_fold_batch(dup.limit(0), 99, wd) is True
    # empty fold changes nothing but commits a new snapshot
    assert sorted(map(tuple, read_current(spark, wd).collect())) == got
    assert committed(spark, wd) == (3, 99)


def test_stream_er_crash_before_commit_recovers_exactly_once(spark, tmp_path, monkeypatch):
    """The fold's crash window: state stages written but the commit
    marker not yet renamed. Readers must keep resolving the prior
    snapshot (no partial state visible), and the foreachBatch REPLAY of
    the same batch id must fold it exactly once — final clustering
    bit-equal to a never-crashed run (an in-place overwrite + separate
    high-water mark would double mention counts here)."""
    from pyspark.sql import functions as F

    from textgraphs_spark.sources.pages import synth_pages
    from textgraphs_spark.streaming import er as ER

    docs = synth_pages(spark, 160).select(
        F.xxhash64("url").alias("doc_id"), "text"
    ).cache()
    b0 = docs.filter(F.pmod("doc_id", F.lit(2)) == 0)
    b1 = docs.filter(F.pmod("doc_id", F.lit(2)) == 1)

    wd = str(tmp_path / "er_crash_wd")
    assert ER.er_fold_batch(b0, 0, wd) is True
    v0 = sorted(map(tuple, ER.read_current(spark, wd).collect()))

    # crash INSIDE the commit: v1 state dirs fully written, marker absent
    real_commit = ER._commit

    def boom(*a, **k):
        raise RuntimeError("simulated crash before snapshot commit")

    monkeypatch.setattr(ER, "_commit", boom)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="simulated crash"):
        ER.er_fold_batch(b1, 1, wd)
    monkeypatch.setattr(ER, "_commit", real_commit)

    # reader isolation: the orphan v1 dir is invisible
    assert ER.committed(spark, wd) == (0, 0)
    assert sorted(map(tuple, ER.read_current(spark, wd).collect())) == v0

    # replay folds the batch exactly once
    assert ER.er_fold_batch(b1, 1, wd) is True
    got = sorted(map(tuple, ER.read_current(spark, wd).collect()))

    # reference: the same two folds without any crash
    wd2 = str(tmp_path / "er_clean_wd")
    ER.er_fold_batch(b0, 0, wd2)
    ER.er_fold_batch(b1, 1, wd2)
    want = sorted(map(tuple, ER.read_current(spark, wd2).collect()))
    assert got == want


def test_stream_er_snapshot_pruning(spark, tmp_path):
    """Snapshot expiry: only the ``keep_last`` newest snapshot dirs
    survive a sequence of folds; the committed reader never breaks."""
    import os

    from pyspark.sql import functions as F

    from textgraphs_spark.sources.pages import synth_pages
    from textgraphs_spark.streaming import er as ER

    docs = synth_pages(spark, 120).select(
        F.xxhash64("url").alias("doc_id"), "text"
    ).cache()
    wd = str(tmp_path / "er_prune_wd")
    for b in range(3):
        batch = docs.filter(F.pmod("doc_id", F.lit(3)) == b)
        assert ER.er_fold_batch(batch, b, wd, keep_last=1) is True

    assert ER.committed(spark, wd) == (2, 2)
    assert not os.path.exists(os.path.join(wd, "v0"))
    assert not os.path.exists(os.path.join(wd, "v1"))
    assert ER.read_current(spark, wd).count() > 0
    # commit history markers survive expiry (the audit trail)
    markers = [n for n in os.listdir(os.path.join(wd, "commits"))
               if not n.startswith(".")]  # Hadoop local-FS .crc sidecars
    assert sorted(markers) == ["v0-b0.json", "v1-b1.json", "v2-b2.json"]


def test_stream_winnow_matches_batch(spark, tmp_path):
    """Shared-fingerprint tallies from the stream == batch
    winnow_near_dup_pairs on the same corpus, with the hot-fingerprint
    cut composed from a batch mining pass (stop_fps)."""
    from pyspark.sql import functions as F

    from textgraphs_spark.operators.dedup import (
        winnow_fingerprints, winnow_near_dup_pairs,
    )
    from textgraphs_spark.streaming.events import stream_winnow_matches

    boiler = "copyright header identical on every page of this site "
    rows = [
        (i, boiler + f"page body text {i} with enough distinct words "
         + "to fingerprint reliably across the corpus", T0 + timedelta(minutes=i))
        for i in range(4)
    ]
    dup = ("page body text 1 with enough distinct words to fingerprint "
           "reliably across the corpus")
    rows += [(9, boiler + dup, T0 + timedelta(minutes=9))]
    src = str(tmp_path / "wdocs")
    spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    ).coalesce(1).write.parquet(src)

    batch_docs = spark.read.parquet(src)
    max_df = 3
    fps = winnow_fingerprints(batch_docs).select("doc_id", "fp").distinct()
    hot = fps.groupBy("fp").count().filter(F.col("count") > max_df).select("fp")

    stream = spark.readStream.schema(batch_docs.schema).parquet(src)
    out = stream_winnow_matches(
        stream, watermark="10 minutes", max_lag="1 hour", stop_fps=hot,
    )
    from textgraphs_spark.streaming.events import run_available_now
    run_available_now(out, checkpoint=str(tmp_path / "wck"), table_name="wm_out")
    streamed = {
        (r.left_id, r.right_id): r.shared
        for r in spark.sql(
            "SELECT left_id, right_id, count(DISTINCT fp) AS shared "
            "FROM wm_out GROUP BY 1, 2"
        ).collect()
    }
    batch = {
        (r.left_id, r.right_id): r.shared
        for r in winnow_near_dup_pairs(
            batch_docs, min_shared=1, max_df=max_df
        ).collect()
    }
    assert streamed == batch and (1, 9) in batch


def test_stream_redact_pii_matches_batch(spark, tmp_path):
    """Stateless streaming PII redaction must emit exactly the batch
    operator's values — scrub-on-arrival before any stateful stage."""
    import pandas as pd

    from textgraphs_spark.operators.pii import redact_pii
    from textgraphs_spark.streaming.events import stream_redact_pii

    rows = [
        (0, "reach me at jo@mail.co or 555-123-4567"),
        (1, "hosts 192.168.0.1, ssn 987-65-4321"),
        (2, "user@localhost and v1.2.3 stay put"),
        (3, ""),
        (4, None),
    ]
    src = tmp_path / "pii_src"
    src.mkdir()
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(src / "p.parquet")

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    out = stream_redact_pii(stream)
    assert out.isStreaming
    run_available_now(out, checkpoint=str(tmp_path / "pck"), table_name="pii_out")
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in spark.sql("SELECT * FROM pii_out").collect()
    }
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    want = {r["doc_id"]: tuple(r)[1:] for r in redact_pii(batch).collect()}
    assert got == want and len(got) == 5
    assert got[0][0] == "reach me at <EMAIL> or <PHONE>"
    assert got[2][0] == rows[2][1]  # decoys untouched


def test_stream_c4_clean_matches_batch(spark, tmp_path):
    """Stateless streaming C4 cleaning must emit exactly the batch
    operator's rows (kept counts, gates, cleaned-text md5) over the
    same dirty corpus."""
    from textgraphs_spark.operators.textquality import c4_line_filter
    from textgraphs_spark.sources.pages import c4_pages
    from textgraphs_spark.streaming.events import run_available_now, stream_c4_clean

    src = tmp_path / "c4_src"
    c4_pages(spark, n_pages=44).write.parquet(str(src))

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    out = stream_c4_clean(stream)
    assert out.isStreaming
    run_available_now(out, checkpoint=str(tmp_path / "c4ck"), table_name="c4_out")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["n_sentences"],
                      r["keep"], r["clean_md5"])
        for r in spark.sql("SELECT * FROM c4_out").collect()
    }
    want = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["n_sentences"],
                      r["keep"], r["clean_md5"])
        for r in c4_line_filter(c4_pages(spark, n_pages=44)).collect()
    }
    assert got == want and len(got) == 44
