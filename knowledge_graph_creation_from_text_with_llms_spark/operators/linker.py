"""Entity/property linking: surface forms → ontology IDs.

The reference resolves each surface form via per-row Wikidata API calls
with an in-memory memo cache (/root/reference/src/core/Integrator/
Matcher.py:44-172). The Spark-native design replaces that with:

  distinct surface forms  →  broadcast join against an alias dictionary
  (preference: exact label [rank 0] > alias [rank 1], ties broken by
  smallest id — mirroring Matcher.py:75-92's exact-label-first scan)
  →  re-join results onto the fact rows.

`distinct()` before the join reproduces the reference's lookup-once-
per-label cache semantics while keeping the expensive path off the
fact table. The dictionary side is always broadcast (it is the small
side by construction); the fact side never shuffles for the lookup.

Property linking supports the reference's three methods
(Matcher.py:100-172): "exact" (the offline stand-in for its API path),
"cos_similarity" (top-k cosine against label/alias embeddings,
Matcher.py:174-256), and "mixed" (exact first, cosine fallback for the
unmatched remainder — anti-join then union, Matcher.py:149-166).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr


def best_match_per_label(
    labels: DataFrame,
    dictionary: DataFrame,
    label_col: str,
    id_col: str,
) -> DataFrame:
    """labels(label_col) × dictionary(alias, rank, id_col) →
    (label_col, id_col) picking the best candidate per label by
    (rank asc, id asc). Case-insensitive trimmed equality, like the
    reference's .lower() comparisons (Matcher.py:75-87)."""
    d = dictionary.select(
        F.lower(F.trim(F.col("alias"))).alias("_k"),
        F.col("rank").alias("_rank"),
        F.col(id_col),
    )
    joined = labels.join(
        F.broadcast(d),
        F.lower(F.trim(F.col(label_col))) == F.col("_k"),
        "left",
    )
    w = Window.partitionBy(label_col).orderBy(
        F.col("_rank").asc_nulls_last(), F.col(id_col).asc_nulls_last()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(label_col, id_col)
    )


def resolve_labels(dictionary: DataFrame, id_col: str = "entity_id") -> DataFrame:
    """(_k, id_col): the best dictionary candidate per normalized alias
    key — min by (rank, id) among rows sharing lower(trim(alias)).
    Factored out of link_labels so callers that link SEVERAL label
    columns against the SAME dictionary (subj+obj in link_triples /
    gate._linked_triples) can compute — and localCheckpoint — the
    ranked table once instead of re-running the dictionary pipeline
    per linked column (the dictionary is often derived from a corpus
    scan, so each re-evaluation repeats that scan)."""
    w = Window.partitionBy("_k").orderBy(
        F.col("_rank").asc_nulls_last(), F.col(id_col).asc_nulls_last()
    )
    return (
        dictionary.select(
            F.lower(F.trim(F.col("alias"))).alias("_k"),
            F.col("rank").alias("_rank"),
            F.col(id_col),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("_k", id_col)
    )


def link_labels(
    facts: DataFrame,
    dictionary: DataFrame,
    label_col: str,
    out_col: str,
    id_col: str = "entity_id",
    resolved: DataFrame | None = None,
) -> DataFrame:
    """Attach out_col = linked id (or NULL) to every fact row.

    The best candidate per surface form depends only on the dictionary
    (min by (rank, id) among rows sharing the normalized alias key), so
    the ranked window runs over the dictionary alone and the result is
    broadcast onto facts in ONE left join. The facts subtree is neither
    duplicated nor shuffled — the earlier distinct-labels-then-rejoin
    form evaluated the facts pipeline twice per call (once under the
    distinct, once as the join probe), which compounded per linked
    column. Lookup-once-per-label cache semantics (Matcher.py:55-56)
    are preserved: every fact row with the same label gets the same id.

    `resolved` (from resolve_labels, possibly checkpointed) skips the
    ranking so multi-column callers pay the dictionary pipeline once.
    """
    if resolved is None:
        resolved = resolve_labels(dictionary, id_col=id_col)
    return facts.join(
        F.broadcast(resolved.select("_k", F.col(id_col).alias(out_col))),
        F.lower(F.trim(F.col(label_col))) == F.col("_k"),
        "left",
    ).drop("_k")


def rank_topk(
    per_prop: DataFrame, pred_col: str = "pred", k: int = 10
) -> DataFrame:
    """Deterministic ranking tail shared by topk_properties and the
    committed-matches parity tests (Matcher.py:258-285 writes ranks in
    score order): (similarity desc, prop_id asc) window, cut at k."""
    w = Window.partitionBy(pred_col).orderBy(
        F.desc("similarity"), F.asc("prop_id")
    )
    return per_prop.withColumn("rank_pos", F.row_number().over(w)).where(
        F.col("rank_pos") <= k
    )


def topk_properties(
    predicates: DataFrame,
    property_dict: DataFrame,
    pred_col: str = "pred",
    pred_emb_col: str = "pred_embedding",
    k: int = 10,
) -> DataFrame:
    """Cosine top-k properties per distinct predicate
    (Matcher.py:188-256 semantics: score = max over label+alias
    embeddings per property; best_match_text = the alias that won if it
    beat the label). Returns (pred, prop_id, label, best_match_text,
    similarity, rank_pos).

    Scale shape: |distinct preds| × |property alias rows| via broadcast
    nested-loop on the tiny dictionary — never a shuffle of the facts.
    For dictionaries too big to cross (not the case here), swap in an
    LSH blocking join; the interface stays the same.
    """
    d = F.broadcast(
        property_dict.select(
            "prop_id",
            F.col("label").alias("_plabel"),
            "alias",
            F.col("rank").alias("_prank"),
            F.col("embedding").alias("_pemb"),
        )
    )
    scored = predicates.crossJoin(d).withColumn(
        "_sim", cosine_expr(F.col(pred_emb_col), F.col("_pemb"))
    )
    # per (pred, prop): best similarity over label+aliases; alias text
    # wins only when strictly greater than the label similarity
    # (Matcher.py:228-234)
    per_prop = (
        scored.groupBy(pred_col, "prop_id")
        .agg(
            F.max("_sim").alias("similarity"),
            # _plabel is constant within a prop_id group
            F.max("_plabel").alias("label"),
            # tie-break fully deterministic: similarity, then
            # label-beats-alias, then the alias string itself (two
            # aliases tying at the same similarity always resolve the
            # same way across runs)
            F.max_by(
                "alias",
                F.struct(
                    F.col("_sim"),
                    F.when(F.col("_prank") == 0, 1).otherwise(0),
                    F.col("alias"),
                ),
            ).alias("best_match_text"),
        )
    )
    return rank_topk(per_prop, pred_col=pred_col, k=k)


def link_predicates(
    facts: DataFrame,
    property_dict: DataFrame,
    method: str = "exact",
    pred_col: str = "pred",
    out_col: str = "pred_id",
    pred_embeddings: DataFrame | None = None,
) -> DataFrame:
    """Predicate linking with the reference's three strategies."""
    if method == "exact":
        return link_labels(facts, property_dict, pred_col, out_col, id_col="prop_id")
    if method not in ("cos_similarity", "mixed"):
        raise ValueError(f"Invalid method: {method}. Use 'exact', 'cos_similarity', or 'mixed'.")
    if pred_embeddings is None:
        # default encoder: the deterministic hash embedding (the
        # model-free stand-in; see functions.embeddings) over the
        # distinct predicates — pass pred_embeddings explicitly to use
        # a real encoder's vectors
        from ..functions.embeddings import hash_embedding_expr

        pred_embeddings = (
            facts.select(pred_col)
            .distinct()
            .withColumn("pred_embedding", hash_embedding_expr(F.col(pred_col)))
        )
    top1 = (
        topk_properties(pred_embeddings, property_dict, pred_col=pred_col, k=1)
        .select(pred_col, F.col("prop_id").alias("_cos_id"))
    )
    if method == "cos_similarity":
        return facts.join(F.broadcast(top1), on=pred_col, how="left").withColumnRenamed(
            "_cos_id", out_col
        )
    # mixed: exact first, cosine only for the unmatched remainder
    exact = link_labels(facts, property_dict, pred_col, out_col, id_col="prop_id")
    return (
        exact.join(F.broadcast(top1), on=pred_col, how="left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.col("_cos_id")))
        .drop("_cos_id")
    )


def link_triples(
    triples_raw: DataFrame,
    entity_dict: DataFrame,
    property_dict: DataFrame,
    method: str = "exact",
    pred_embeddings: DataFrame | None = None,
) -> DataFrame:
    """triples_raw → triples_linked. Unlinked ids stay NULL;
    is_literal = object not linked (Integrator.py:145-150)."""
    out = link_labels(triples_raw, entity_dict, "subj", "subj_id")
    out = link_labels(out, entity_dict, "obj", "obj_id")
    out = link_predicates(out, property_dict, method, pred_embeddings=pred_embeddings)
    return out.withColumn("is_literal", F.col("obj_id").isNull())
