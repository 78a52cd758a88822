"""Serialization sinks/sources: node-link JSON round-trip (the reference's
tests/test_load.py pattern), RDF N3 export, KuzuDB CSV export, InGram."""

import json
import os

import pytest
from pyspark.sql import functions as F

from textgraphs_spark.operators.extract import (
    corpus_edges, corpus_nodes, edges_table, extract_graphs, nodes_table,
)
from textgraphs_spark.sources.nodelink import (
    dump_node_link_doc, load_node_link_doc,
)
from textgraphs_spark.sources.rdf import export_rdf_triples, normalize_prefix_col, write_n3
from textgraphs_spark.sources.kuzu import export_kuzu


@pytest.fixture(scope="module")
def graph(spark):
    docs = spark.createDataFrame(
        [(0, "See Spot run."), (1, "Werner Herzog lives in Germany. The filmmaker shot a documentary.")],
        ["doc_id", "text"],
    )
    ex = extract_graphs(docs).cache()
    return {
        "extracted": ex,
        "nodes": corpus_nodes(ex).withColumn("node_id", F.xxhash64("node_key"))
                 .withColumn("neighbors", F.lit(0)).withColumn("weight", F.lit(0.0))
                 .withColumn("annotated", F.lit(False)),
        "edges": corpus_edges(ex),
    }


def test_node_link_doc_roundtrip_fixed_point(graph):
    """dump → load → dump is a fixed point (reference tests/test_load.py:44-66)."""
    nodes = [r.asDict() for r in nodes_table(graph["extracted"]).filter("doc_id = 0").collect()]
    edges = [r.asDict() for r in edges_table(graph["extracted"]).filter("doc_id = 0").collect()]
    s1 = dump_node_link_doc(nodes, edges)
    n2, e2 = load_node_link_doc(s1)
    s2 = dump_node_link_doc(n2, e2)
    assert s1 == s2
    dat = json.loads(s1)
    assert dat["directed"] is True and dat["multigraph"] is True
    assert set(dat) == {"directed", "multigraph", "nodes", "links", "graph"}


def test_rdf_export(graph, spark, tmp_path):
    triples = export_rdf_triples(graph["nodes"], graph["edges"])
    rows = triples.collect()
    assert len(rows) > 0
    preds = {r["pred"] for r in rows}
    assert "<http://www.w3.org/2004/02/skos/core#prefLabel>" in preds
    assert "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>" in preds
    # unlinked lemmas get owl:Thing (doc.py:558-560)
    objs = {r["obj"] for r in rows}
    assert "<http://www.w3.org/2002/07/owl#Thing>" in objs
    out = str(tmp_path / "n3")
    write_n3(triples, out)
    files = [f for f in os.listdir(out) if f.startswith("part-")]
    assert files


def test_rdf_export_escapes_hostile_surfaces(spark):
    """Surfaces carrying IRI-breaking or literal-breaking characters
    (angle brackets, quotes, backslashes, newlines) must serialize to
    valid single-line N3: IRIs contain no forbidden chars, literals no
    raw newlines or unescaped backslashes, and an inf edge's subject
    IRI matches the label triple's subject for the same surface."""
    nodes = spark.createDataFrame(
        [
            ("k1", "ent", 'Dr. "Evil" <boss>', "NOUN", "http://example.org/T", 3, 1, True, 1),
            ("k2", "ent", "line\nbreak\\end", "NOUN", "unlinked", 2, 1, True, 1),
        ],
        "node_key string, kind string, surface string, pos string, "
        "label string, length int, count int, sub_obj boolean, doc_freq int",
    )
    edges = spark.createDataFrame(
        [("k1", "k2", "inf", "http://example.org/rel", 1, 0.9)],
        "src_key string, dst_key string, kind string, rel string, count int, prob double",
    )
    rows = export_rdf_triples(nodes, edges).collect()
    label_subj = {r["subj"] for r in rows if "prefLabel" in r["pred"]}
    for r in rows:
        for term in (r["subj"], r["pred"], r["obj"]):
            assert "\n" not in term and "\r" not in term, r
            if term.startswith("<"):
                assert not any(c in term[1:-1] for c in '<>"{}|`\\ '), r
    edge = next(r for r in rows if r["pred"] == "<http://example.org/rel>")
    assert edge["subj"] in label_subj and edge["obj"] in label_subj


def test_prefix_normalization(spark):
    df = spark.createDataFrame(
        [("http://dbpedia.org/ontology/Person",), ("http://dbpedia.org/resource/Money",), ("http://example.com/x",)],
        ["iri"],
    )
    got = [r["c"] for r in df.select(normalize_prefix_col(F.col("iri")).alias("c")).collect()]
    assert got == ["dbo:Person", "dbr:Money", "http://example.com/x"]


def test_kuzu_export(graph, tmp_path):
    path = str(tmp_path / "kuzu")
    export_kuzu(graph["nodes"], graph["edges"], path)
    assert os.path.exists(os.path.join(path, "schema.ddl"))
    assert any(f.startswith("part-") for f in os.listdir(os.path.join(path, "nodes")))
    assert any(f.startswith("part-") for f in os.listdir(os.path.join(path, "edges")))


def test_ingram_source(spark, tmp_path):
    from textgraphs_spark.sources.ingram import load_ingram

    fixture = {
        "rels": ["A", "B"],
        "ents": {"x": [["A", "y"], ["B", "z"]], "y": [["B", "z"]]},
        "scores": [[0, 1, 0.5]],
    }
    p = tmp_path / "ingram.json"
    p.write_text(json.dumps(fixture))
    out = load_ingram(spark, str(p))
    assert out["rels"] == ["A", "B"]
    assert out["triples"].count() == 3
    assert out["expected"].collect()[0]["expected"] == 0.5


def test_er_pipeline_resume(spark, tmp_path):
    """Stage-checkpoint resume: second run reuses parquet stage outputs
    (the north rule's 'resumable from checkpoint')."""
    from textgraphs_spark.plans.er_pipeline import ERPipeline

    docs = spark.createDataFrame(
        [(i, f"Werner Herzog met Anna Klein in Germany on trip {i}.") for i in range(20)],
        ["doc_id", "text"],
    )
    wd = str(tmp_path / "er")
    p1 = ERPipeline(spark, workdir=wd)
    out1 = p1.run(docs)
    n1 = out1["clusters"].count()
    assert os.path.exists(os.path.join(wd, "extracted", "_SUCCESS"))
    assert os.path.exists(os.path.join(wd, "lineage"))
    assert os.path.exists(os.path.join(wd, "metrics"))

    # per-partition metrics must reconcile with the per-stage lineage
    lineage = {r["stage"]: r for r in spark.read.parquet(os.path.join(wd, "lineage")).collect()}
    metrics = spark.read.parquet(os.path.join(wd, "metrics"))
    per_stage = {
        r["stage"]: r["total"]
        for r in metrics.groupBy("stage").agg(F.sum("rows").alias("total")).collect()
    }
    for stage, row in lineage.items():
        assert per_stage[stage] == row["rows"], stage
        assert row["skew"] >= 0.999 or row["rows"] == 0

    # resume: stages are read back, not recomputed (pass empty docs to
    # prove the parquet is the source of truth)
    empty = docs.limit(0)
    p2 = ERPipeline(spark, workdir=wd)
    out2 = p2.run(empty)
    assert out2["clusters"].count() == n1


def test_run_lean_matches_run(spark):
    """The lean throughput path and the checkpointed path produce the
    same cluster assignment."""
    from textgraphs_spark.plans.er_pipeline import ERPipeline
    from textgraphs_spark.sources.pages import synth_pages

    pages = synth_pages(spark, 80)
    docs = pages.select(F.xxhash64("url").alias("doc_id"), "text")
    full = ERPipeline(spark).run(docs)["clusters"]
    lean = ERPipeline(spark).run_lean(docs)

    def canon(df):
        return {
            tuple(sorted(r["members"]))
            for r in df.groupBy("cluster_id").agg(
                F.collect_set("entity_key").alias("members")
            ).collect()
        }

    assert canon(full) == canon(lean)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Tables co-bucketed on the join key join without any shuffle."""
    import shutil

    from textgraphs_spark.sources.tables import write_bucketed

    for t in ("bk_a", "bk_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(
            os.path.join(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), t),
            ignore_errors=True,
        )
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bk_a", "k", 8, sort_col="k")
    write_bucketed(b, "bk_b", "k", 8, sort_col="k")
    # force sort-merge (a broadcast join would trivially avoid the shuffle
    # without exercising bucketing); collect() executes THIS Dataset's own
    # QueryExecution, so executedPlan afterwards is the AQE-final plan —
    # count() would build and run a different (aggregated) plan
    joined = spark.table("bk_a").hint("merge").join(spark.table("bk_b"), "k")
    assert len(joined.collect()) == 1000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_table_format_seam(spark, tmp_path, monkeypatch):
    """The storage seam: parquet round-trips through read/write/exists;
    requesting Iceberg without the runtime fails LOUDLY with a setup
    message (this sandbox ships no Iceberg jar), never a ClassNotFound
    five stages into a run."""
    import pytest as _pytest

    from textgraphs_spark.sources import tables as TBL

    df = spark.range(5).withColumnRenamed("id", "x")
    p = str(tmp_path / "t1")
    assert not TBL.stage_exists(spark, p)
    TBL.write_table(df, p)
    assert TBL.stage_exists(spark, p)
    assert TBL.read_table(spark, p).count() == 5
    TBL.drop_stage(spark, p)
    assert not TBL.stage_exists(spark, p)

    monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "iceberg")
    if TBL.iceberg_available(spark):  # pragma: no cover - not in sandbox
        _pytest.skip("Iceberg runtime present; seam would really write")
    with _pytest.raises(RuntimeError, match="Iceberg runtime"):
        TBL.write_table(df, str(tmp_path / "t2"))
    with _pytest.raises(RuntimeError, match="Iceberg runtime"):
        TBL.read_table(spark, str(tmp_path / "t2"))
