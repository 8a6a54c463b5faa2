"""Text analysis operators."""

from knowledge_graph_creation_from_text_with_llms_spark.operators import textstats


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick fox is one of the best, and a fine fox!"),
            (2, "el perro y la casa de los que"),
            (3, "xyzzy plugh"),
            (4, ""),
        ],
        "doc_id long, text string",
    )


def test_language_id(spark):
    out = {r.doc_id: r for r in textstats.language_id(_docs(spark)).collect()}
    assert out[1].predicted_lang == "en"
    assert out[2].predicted_lang == "es"
    assert out[3].predicted_lang == "und"
    assert out[3].marker_hits == 0
    assert out[4].predicted_lang == "und"


def test_quality_scores(spark):
    out = {r.doc_id: r for r in textstats.quality_scores(_docs(spark)).collect()}
    assert out[1].n_punct == 2  # ',' and '!'
    assert out[1].n_tokens == 12
    assert 0.0 <= out[1].quality_score <= 1.0
    assert out[4].n_tokens == 0 and out[4].distinct_ratio == 0.0


def test_token_counts(spark):
    out = {r.doc_id: r for r in textstats.token_counts(_docs(spark)).collect()}
    assert out[3].ws_tokens == 2
    assert out[3].bpe_tokens == 2
    assert out[1].bpe_tokens == out[1].ws_tokens + 2  # ','/'!' count alone
    assert out[4].ws_tokens == 0


def test_fingerprints(spark):
    docs = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz" * 3), (2, "abcdefghijklmnopqrstuvwxyz" * 3)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textstats.fingerprints(docs).collect()}
    # identical docs → identical fingerprint sketches
    assert out[1].n_fingerprints == out[2].n_fingerprints
    assert out[1].min_fingerprint == out[2].min_fingerprint
    assert out[1].n_fingerprints >= 1


def test_corpus_filter_decisions_and_reasons(spark):
    from knowledge_graph_creation_from_text_with_llms_spark.operators import textstats

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog is in the house of friends " * 3),
            (2, "el la de que y los gatos duermen bien hoy aqui mismo senor"),
            (3, "tiny"),
            (4, "spam " * 12 + "the of and to in is a"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textstats.corpus_filter(docs).collect()}
    assert out[1].keep and out[1].drop_reasons == ""
    assert not out[2].keep and "lang" in out[2].drop_reasons
    assert not out[3].keep and "too_short" in out[3].drop_reasons
    assert not out[4].keep and "repetitive" in out[4].drop_reasons
    # reasons are ordered rule-order and comma-joined
    assert out[3].drop_reasons.split(",")[0] in ("lang", "too_short")


def test_corpus_filter_is_single_stage(spark):
    """The composed filter must stay a shuffle-free projection."""
    from knowledge_graph_creation_from_text_with_llms_spark.operators import textstats

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = textstats.corpus_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_top_ngrams_per_group(spark):
    from knowledge_graph_creation_from_text_with_llms_spark.operators import textstats

    docs = spark.createDataFrame(
        [
            (1, "a", "x y x y z"),
            (2, "a", "x y q"),
            (3, "b", "solo"),
        ],
        "doc_id long, source string, text string",
    )
    out = [
        (r.source, r.gram, r.n_occurrences, r.rank)
        for r in textstats.top_ngrams_per_group(docs, "source", n=2, k=2)
        .orderBy("source", "rank")
        .collect()
    ]
    # "x y" occurs 3x in source a ("x y x y z" has x y twice: pos1,3)
    assert out[0] == ("a", "x y", 3, 1)
    assert out[1][0] == "a" and out[1][3] == 2
    assert all(s != "b" for s, *_ in out)  # <2 tokens → no bigrams


def test_gopher_rules_flags(spark):
    from knowledge_graph_creation_from_text_with_llms_spark.operators import textstats

    good = " ".join(
        ["the quick brown fox jumps over and under that lazy dog to be with it"]
        * 5
    )  # 70 words, everyday stopwords, normal lengths
    bullets = "\n".join(f"- item {i}" for i in range(20))
    symbols = "# word " * 60  # 60 words, 60 hashes -> ratio 1.0
    short = "too short"
    docs = spark.createDataFrame(
        [(1, good), (2, bullets), (3, symbols), (4, short)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textstats.gopher_rules(docs).collect()}
    assert out[1].keep
    assert not out[2].pass_bullet_lines and not out[2].keep
    assert not out[3].pass_symbol_ratio and not out[3].keep
    assert not out[4].pass_word_count and not out[4].keep
    # audit columns explain the drop
    assert out[2].bullet_frac == 1.0
    assert out[1].n_stop_hits >= 2
