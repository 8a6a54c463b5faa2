"""PipelineConfig knobs: clean_html (S2 placement) and max_chunks (P10)."""

from pyspark.sql import functions as F

from knowledge_graph_creation_from_text_with_llms_spark.plans.pipeline import (
    KGPipeline,
    PipelineConfig,
)
from knowledge_graph_creation_from_text_with_llms_spark.sources.catalog import (
    ParquetCatalog,
)
from knowledge_graph_creation_from_text_with_llms_spark.sources.corpus import (
    with_ingest_columns,
)


def _html_source(spark):
    rows = [
        ("r1", f"p{i}.html", "c" * 40, "html",
         f"<p>alpha beta gamma doc{i}.</p>"
         "<table><tr><td><p>table noise dropped</p></td></tr></table>"
         f'<p>delta epsilon<sup class="reference">[1]</sup> zeta doc{i}.</p>')
        for i in range(4)
    ]
    return with_ingest_columns(
        spark.createDataFrame(
            rows,
            "repo string, path string, commit string, lang string, content string",
        )
    )


def test_clean_html_stage(spark, tmp_path):
    src = _html_source(spark)
    cfg = PipelineConfig(chunk_size=500, clean_html=True)
    cat = ParquetCatalog(str(tmp_path / "cat"), spark)
    KGPipeline(spark, cat, cfg).run(src)
    chunks = cat.read("chunks")
    texts = [r.text for r in chunks.collect()]
    assert texts, "cleaner must not drop all content"
    joined = " ".join(texts)
    assert "table noise" not in joined
    assert "[1]" not in joined
    assert "<p>" not in joined
    # the two paragraph texts survive, space-joined
    assert "alpha beta gamma doc0. delta epsilon zeta doc0." in joined


def test_clean_html_off_keeps_markup(spark, tmp_path):
    src = _html_source(spark)
    cat = ParquetCatalog(str(tmp_path / "cat"), spark)
    KGPipeline(spark, cat, PipelineConfig(chunk_size=500)).run(src)
    texts = " ".join(r.text for r in cat.read("chunks").collect())
    assert "<p>" in texts  # untouched without the flag


def test_max_chunks_cap(spark, tmp_path):
    rows = [
        ("r1", "f.txt", "c" * 40, "text",
         " ".join(f"word{j} sentence{j}." for j in range(40)))
    ]
    src = with_ingest_columns(
        spark.createDataFrame(
            rows,
            "repo string, path string, commit string, lang string, content string",
        )
    )
    cat_all = ParquetCatalog(str(tmp_path / "all"), spark)
    KGPipeline(spark, cat_all, PipelineConfig(chunk_size=60)).run(src)
    n_all = cat_all.read("chunks").count()
    assert n_all > 2

    cat_cap = ParquetCatalog(str(tmp_path / "cap"), spark)
    KGPipeline(spark, cat_cap, PipelineConfig(chunk_size=60, max_chunks=2)).run(src)
    capped = cat_cap.read("chunks")
    assert capped.count() == 2
    assert capped.agg(F.max("chunk_id")).collect()[0][0] == 2
