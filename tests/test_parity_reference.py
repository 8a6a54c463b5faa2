"""Parity against the reference's committed artifacts (BASELINE.md:
triple P/R >= 0.95 vs reference extractor outputs).

Three layers:
1. parser parity — the reference's 280 committed LLM raw responses
   (Experiments_Results/*/chunk_N_response.txt) pushed through our
   parse_responses + format_triple_line must reproduce the committed
   chunk_N_triples.txt files (expected: exact, P=R=1.0).
2. reader-grammar parity — every committed *_triples.txt line parsed
   by the native regex path and by the exact char-scan replica must
   agree (the two grammars of SURVEY.md §2.2 P5/P6).
3. end-to-end replay — source table from the reference's chunk texts,
   extraction replayed from its recorded responses, full DAG; emitted
   triple set P/R >= 0.95 vs the committed triples.
"""

from __future__ import annotations

import glob
import os
import re

import pytest
from pyspark.sql import functions as F

from knowledge_graph_creation_from_text_with_llms_spark.operators import (
    extractor,
    metrics,
    parser,
)

REF = "/root/reference"
EXPERIMENTS = sorted(glob.glob(f"{REF}/Experiments_Results/Phi-3.5-mini/*/[AL]*/"))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not available"
)


def _pairs():
    """(response_path, triples_path) for every committed pair."""
    out = []
    for d in EXPERIMENTS:
        for rp in sorted(glob.glob(os.path.join(d, "chunk_*_response.txt"))):
            tp = rp.replace("_response.txt", "_triples.txt")
            if os.path.exists(tp):
                out.append((rp, tp))
    return out


def test_corpus_present():
    assert len(_pairs()) >= 200


def test_parser_parity_all_committed_responses(spark):
    """Our writer-side parse of every committed raw response must
    reproduce the committed triples file exactly (P=R=1.0 >= 0.95)."""
    pairs = _pairs()
    rows = []
    expected = []
    for i, (rp, tp) in enumerate(pairs):
        with open(rp, encoding="utf-8") as f:
            rows.append((str(i), 0, f.read(), ""))
        with open(tp, encoding="utf-8") as f:
            for line in f.read().splitlines():
                if line.strip():
                    expected.append((str(i), line))
    resp = spark.createDataFrame(
        rows, "doc_id string, chunk_id int, response string, content_sha256 string"
    )
    parsed = parser.parse_responses(resp)
    formatted = parsed.select(
        "doc_id",
        parser.format_triple_line(F.col("subj"), F.col("pred"), F.col("obj")).alias(
            "line"
        ),
    )
    got = {(r.doc_id, r.line) for r in formatted.collect()}
    want = set(expected)
    tp_ = len(got & want)
    precision = tp_ / len(got) if got else 0.0
    recall = tp_ / len(want) if want else 0.0
    assert precision >= 0.95, f"precision {precision:.4f} (|got|={len(got)})"
    assert recall >= 0.95, f"recall {recall:.4f} (|want|={len(want)})"


def test_reader_grammar_regex_vs_exact(spark):
    """Native regex reader vs verbatim char-scan reader on every
    committed triples line: identical output triples."""
    lines = []
    seen_files = 0
    for _, tp in _pairs():
        seen_files += 1
        with open(tp, encoding="utf-8") as f:
            lines.extend((l,) for l in f.read().splitlines() if l.strip())
    df = spark.createDataFrame(lines, "line string")
    fast = parser.parse_triple_lines(df, carry_cols=()).collect()
    exact = parser.parse_triple_lines(df, carry_cols=(), exact=True).collect()
    fast_set = {(r.subj, r.pred, r.obj) for r in fast}
    exact_set = {(r.subj, r.pred, r.obj) for r in exact}
    # the grammar legitimately rejects a handful of pathological
    # "Note:" lines with unbalanced embedded quotes — both paths must
    # agree row-for-row, and nearly all lines must parse
    assert len(fast) == len(exact)
    assert fast_set == exact_set
    assert len(fast) >= 0.99 * len(lines)


def _corpus_docs(corpus_dir: str) -> list[tuple[str, str]]:
    out = []
    for p in sorted(
        glob.glob(os.path.join(corpus_dir, "chunk_*.txt")),
        key=lambda p: int(re.search(r"chunk_(\d+)", p).group(1)),
    ):
        with open(p, encoding="utf-8") as f:
            out.append((os.path.basename(p), f.read()))
    return out


def test_e2e_replay_pipeline(spark, tmp_path):
    """Full DAG on the reference corpus with the recorded-LLM replay
    backend; emitted triples P/R >= 0.95 vs committed outputs."""
    exp = f"{REF}/Experiments_Results/Phi-3.5-mini/3"
    corpora = {
        "AI": f"{REF}/tests/data/Datasets_Generator/AI",
        "LeBron": f"{REF}/tests/data/Datasets_Generator/LeBron",
    }
    # replay table keyed by whitespace-normalized chunk text
    responses_by_text: dict[str, str] = {}
    expected = []
    rows = []
    for name, cdir in corpora.items():
        for fname, text in _corpus_docs(cdir):
            idx = re.search(r"chunk_(\d+)", fname).group(1)
            rp = os.path.join(exp, name, f"chunk_{idx}_response.txt")
            tpath = os.path.join(exp, name, f"chunk_{idx}_triples.txt")
            if not (os.path.exists(rp) and os.path.exists(tpath)):
                continue
            with open(rp, encoding="utf-8") as f:
                responses_by_text[" ".join(text.split())] = f.read()
            with open(tpath, encoding="utf-8") as f:
                expected.extend(
                    (l,) for l in f.read().splitlines() if l.strip()
                )
            rows.append((f"corpus/{name.lower()}", f"raw/{fname}", "c" * 40, "text", text))

    source = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    from knowledge_graph_creation_from_text_with_llms_spark.sources.corpus import (
        with_ingest_columns,
    )
    from knowledge_graph_creation_from_text_with_llms_spark.sources.catalog import (
        ParquetCatalog,
    )
    from knowledge_graph_creation_from_text_with_llms_spark.plans.pipeline import (
        KGPipeline,
        PipelineConfig,
    )

    source = with_ingest_columns(source)

    def backend_factory(resp=responses_by_text):
        class _Replay(extractor.Backend):
            def generate(self, texts):
                return texts.map(lambda t: resp.get(" ".join(t.split()), ""))

        return _Replay()

    cat = ParquetCatalog(str(tmp_path / "cat"), spark)
    pipe = KGPipeline(
        spark,
        cat,
        PipelineConfig(chunk_size=10_000, backend_factory=backend_factory),
    )
    pipe.run(source)
    assert pipe.verify_invariant()

    got_df = cat.read("triples_raw").select(
        parser.format_triple_line(F.col("subj"), F.col("pred"), F.col("obj")).alias(
            "line"
        )
    )
    gt_df = spark.createDataFrame(expected, "line string")
    got = parser.parse_triple_lines(got_df, carry_cols=())
    want = parser.parse_triple_lines(gt_df, carry_cols=())
    m = metrics.strict_metrics(got, want).collect()[0]
    assert m.precision >= 0.95, f"precision {m.precision:.4f}"
    assert m.recall >= 0.95, f"recall {m.recall:.4f}"
