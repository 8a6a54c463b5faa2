"""Property-based tests (hypothesis) for the parser and chunker
contracts — randomized inputs, invariants instead of examples.

Spark jobs per example would be too slow, so properties run against
the pure-Python reference implementations and one batched Spark run
compares the full example set at once.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from knowledge_graph_creation_from_text_with_llms_spark.operators.chunker import (
    greedy_pack,
    split_sentences,
)

# tokens that survive the triple-line grammar unambiguously
_field = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
    min_size=1,
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_field, min_size=1, max_size=30), st.integers(min_value=3, max_value=60))
def test_greedy_pack_invariants(units, size):
    chunks = greedy_pack(units, size)
    # no unit lost or reordered: concatenation round-trips
    assert " ".join(chunks).split(" ") == units
    # every chunk except possibly single-oversized-unit ones fits
    for c in chunks:
        assert len(c) <= size or " " not in c
    # no empty chunks escape
    assert all(c for c in chunks)


@settings(max_examples=200, deadline=None)
@given(st.lists(_field, min_size=1, max_size=30), st.integers(min_value=3, max_value=60))
def test_greedy_pack_is_greedy(units, size):
    """A chunk boundary only appears when the next unit truly did not
    fit (the defining property of the reference fold)."""
    chunks = greedy_pack(units, size)
    idx = 0
    for ci, c in enumerate(chunks[:-1]):
        n = len(c.split(" "))
        idx += n
        nxt = units[idx]
        assert len(c) + len(nxt) + 1 > size


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(["Hello there.", "Ok!", "Why?", "No end"]), min_size=1, max_size=8))
def test_split_sentences_preserves_content(parts):
    text = " ".join(parts)
    sents = split_sentences(text)
    assert "".join(s.replace(" ", "") for s in sents) == text.replace(" ", "")


def _py_writer_parse(response: str):
    """Independent replica of TripleGenerator._parse_and_save_triples."""
    out = []
    for line in response.strip().split("\n"):
        line = line.lstrip("0123456789. ")
        parts = line.strip("()").split(", ")
        if len(parts) == 3:
            out.append(tuple(p.strip() for p in parts))
    return out


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(_field, _field, _field).map(lambda t: f"1. ({t[0]}, {t[1]}, {t[2]})"),
        min_size=0,
        max_size=10,
    )
)
def test_writer_parse_accepts_all_wellformed(lines):
    got = _py_writer_parse("\n".join(lines))
    assert len(got) == len(lines)


def test_spark_writer_parse_matches_python_on_random_corpus(spark):
    """One batched Spark comparison over a seeded random corpus of
    mixed well-formed / malformed / quoted lines."""
    import random

    rng = random.Random(42)
    vocab = ["alpha", "beta", "g8mm4", "x", "Longer token", "with, comma"]

    def rand_line():
        kind = rng.randrange(5)
        a, b, c = (rng.choice(vocab) for _ in range(3))
        if kind == 0:
            return f"{rng.randrange(100)}. ({a}, {b}, {c})"
        if kind == 1:
            return f"({a}, {b})"
        if kind == 2:
            return f'("{a}", "{b}", "{c}");'
        if kind == 3:
            return "noise " * rng.randrange(3)
        return f"(({a}, {b}, {c}))"

    responses = ["\n".join(rand_line() for _ in range(rng.randrange(1, 12))) for _ in range(60)]
    want = []
    for i, resp in enumerate(responses):
        want.extend((str(i),) + t for t in _py_writer_parse(resp))

    from knowledge_graph_creation_from_text_with_llms_spark.operators import parser

    df = spark.createDataFrame(
        [(str(i), 0, r, "") for i, r in enumerate(responses)],
        "doc_id string, chunk_id int, response string, content_sha256 string",
    )
    got = [
        (r.doc_id, r.subj, r.pred, r.obj)
        for r in parser.parse_responses(df).collect()
    ]
    assert sorted(got) == sorted(want)


def test_group_percentiles_exact_vs_numpy_disc(spark):
    """group_percentiles == discrete percentile (smallest value with
    cume rank >= p) on random multisets with heavy ties."""
    import numpy as np

    from knowledge_graph_creation_from_text_with_llms_spark.operators import textstats

    rng = np.random.default_rng(11)
    rows = [
        ("g1", int(v)) for v in rng.integers(0, 20, size=173)
    ] + [("g2", int(v)) for v in rng.integers(0, 5, size=57)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r.source: r for r in textstats.group_percentiles(df, "n_chars", "source").collect()}
    for g in ("g1", "g2"):
        vals = sorted(v for s, v in rows if s == g)
        n = len(vals)
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            import math

            expect = vals[math.ceil(p * n) - 1]
            assert got[g][col] == expect, (g, p)
        assert got[g]["n_rows"] == n


def test_asof_join_matches_bruteforce_on_random_data(spark):
    """One batched Spark run over a deterministic pseudo-random
    dataset: the union+window as-of join must equal the per-row
    brute-force definition (latest right.ts <= left.ts per key)."""
    import hashlib

    from knowledge_graph_creation_from_text_with_llms_spark.operators import events

    def h(i, salt):
        return int(hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8], 16)

    left_rows = [
        (i, h(i, "lk") % 7, h(i, "lt") % 50) for i in range(300)
    ]
    right_rows = list({
        (h(i, "rk") % 7, h(i, "rt") % 50): i for i in range(120)
    }.items())  # unique per (key, ts) by construction
    right_rows = [(k, t, v) for (k, t), v in right_rows]

    left = spark.createDataFrame(left_rows, "event_id long, k long, ts long")
    right = spark.createDataFrame(right_rows, "k long, ts long, state long")
    got = {
        r.event_id: r.state
        for r in events.asof_join(left, right, ["k"], "ts").collect()
    }
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, t, v in right_rows:
        by_key.setdefault(k, []).append((t, v))
    for eid, k, t in left_rows:
        cands = [(rt, v) for rt, v in by_key.get(k, []) if rt <= t]
        want = max(cands)[1] if cands else None
        assert got[eid] == want, (eid, k, t, got[eid], want)


def test_stratified_split_counts_exact_on_random_fractions(spark):
    """floor-cut exactness holds for arbitrary fraction pairs and
    stratum sizes (one batched run, several configs)."""
    import math

    from knowledge_graph_creation_from_text_with_llms_spark.operators import sampling

    rows = [
        (i, f"s{i % 5}", "x") for i in range(523)
    ]  # uneven strata: 105/105/105/104/104
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    for fr in ({"a": 0.5, "b": 0.5}, {"a": 0.73, "b": 0.2, "c": 0.07},
               {"a": 0.9, "b": 0.1}):
        out = sampling.stratified_split(docs, "source", fr).collect()
        from collections import Counter

        n_by_stratum = Counter(r.source for r in out)
        c = Counter((r.source, r.split) for r in out)
        names = list(fr)
        for s, n in n_by_stratum.items():
            cum = 0.0
            prev_cut = 0
            for name in names[:-1]:
                cum += fr[name]
                cut = math.floor(cum * n)
                assert c[(s, name)] == cut - prev_cut, (fr, s, name)
                prev_cut = cut
            assert c[(s, names[-1])] == n - prev_cut
