"""Parse grammar edge cases (FIXTURES.md §7; TripleGenerator.py:148-164
and Integrator.py:156-218)."""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_creation_from_text_with_llms_spark.operators import parser


def _parse_resp(spark, response):
    df = spark.createDataFrame(
        [("d", 1, response, "h")],
        "doc_id string, chunk_id int, response string, content_sha256 string",
    )
    return [
        (r.subj, r.pred, r.obj)
        for r in parser.parse_responses(df).collect()
    ]


def test_writer_grammar_basics(spark):
    out = _parse_resp(spark, "1. (a, b, c)\n2. (d, e, f)")
    assert out == [("a", "b", "c"), ("d", "e", "f")]


def test_writer_grammar_drops_bad_arity(spark):
    assert _parse_resp(spark, "(one, two)\n(a, b, c, d)\n\nnothing here") == []


def test_writer_grammar_double_parens_and_numbers(spark):
    assert _parse_resp(spark, "12. ((x, y, z))") == [("x", "y", "z")]


def test_writer_grammar_lstrip_charset(spark):
    # lstrip("0123456789. ") eats digits/dots/spaces anywhere in the prefix
    assert _parse_resp(spark, "3.14  15(q, w, e)") == [("q", "w", "e")]


def _parse_lines(spark, lines, exact=False):
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    return sorted(
        (r.subj, r.pred, r.obj)
        for r in parser.parse_triple_lines(df, carry_cols=(), exact=exact).collect()
    )


EDGE_LINES = [
    '("Artificial intelligence (AI)", "instance of", "intelligence")',
    '("James, Sr.", "born in", "Akron");',
    "(plain, unquoted, triple)",
    "(a, b)",  # arity 2 → dropped
    "# a comment",
    "",
    '("Nicknamed "King James"", "is", "great");',  # embedded quotes
    '("trailing", "comma", "case"),',  # trailing comma outside quotes
    "((double, paren, line));",
]


def test_reader_grammar_edges_fast_equals_exact(spark):
    fast = _parse_lines(spark, EDGE_LINES)
    exact = _parse_lines(spark, EDGE_LINES, exact=True)
    assert fast == exact


def test_reader_grammar_quoted_comma(spark):
    out = _parse_lines(spark, ['("James, Sr.", "born in", "Akron");'])
    assert out == [("James, Sr.", "born in", "Akron")]


def test_reader_grammar_unquoted(spark):
    assert _parse_lines(spark, ["(plain, unquoted, triple)"]) == [
        ("plain", "unquoted", "triple")
    ]


def test_format_roundtrip(spark):
    df = spark.createDataFrame(
        [("s, with comma", "p", "o")], "subj string, pred string, obj string"
    )
    line = df.select(
        parser.format_triple_line(F.col("subj"), F.col("pred"), F.col("obj")).alias("line")
    )
    back = parser.parse_triple_lines(line, carry_cols=()).collect()[0]
    assert (back.subj, back.pred, back.obj) == ("s, with comma", "p", "o")
