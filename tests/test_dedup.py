"""Dedup family on handmade near-duplicate documents."""

from knowledge_graph_creation_from_text_with_llms_spark.operators import dedup

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"
OTHER = "completely different words about spark shuffles and broadcast joins"


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a", BASE),
            (2, "a", BASE),          # exact dup of 1
            (3, "a", NEAR),          # near dup of 1
            (4, "b", OTHER),
            (5, "b", OTHER + " x"),  # near dup of 4
        ],
        "doc_id long, source string, text string",
    )


def test_exact_duplicates(spark):
    out = {r.content_md5: r for r in dedup.exact_duplicates(_docs(spark)).collect()}
    groups = sorted((r.survivor_id, r.dup_count) for r in out.values())
    assert (1, 2) in groups  # docs 1+2 collapsed, survivor = min id
    assert len(out) == 4


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(_docs(spark), jaccard_threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert all(a != 4 and b != 4 or (a, b) == (4, 5) for a, b in pairs)


def test_simhash_near_dups_close(spark):
    sh = {r.doc_id: r.simhash for r in dedup.simhash16(_docs(spark)).collect()}
    assert sh[1] == sh[2]  # identical text → identical simhash
    ham_near = bin(sh[1] ^ sh[3]).count("1")
    ham_far = bin(sh[1] ^ sh[4]).count("1")
    assert ham_near <= ham_far
    assert all(0 <= v < 2 ** 16 for v in sh.values())


def test_ngram_jaccard_blocked(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            _docs(spark), block_col="source", threshold=0.3
        ).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (4, 5) in pairs
    # cross-block pairs never compared
    assert not any({a, b} == {1, 4} for a, b in pairs)


def test_embedding_neardup(spark):
    vecs = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0, 0.0]),
            (2, 0, [0.99, 0.01, 0.0]),
            (3, 0, [0.0, 1.0, 0.0]),
            (4, 1, [1.0, 0.0, 0.0]),  # different block — never paired with 1
        ],
        "vec_id long, label int, embedding array<float>",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_neardup_pairs(
            vecs, block_col="label", threshold=0.9
        ).collect()
    }
    assert pairs == {(1, 2)}
