"""Canonicalization: merge coreferent mentions into stable surrogate IDs.

The reference has no canonicalization beyond its exact/alias preference
order; the north_rule mandates one for the rebuild: a normalize-key
reduce with *skew salting* for hub entities (a handful of entities —
"LeBron James", "AI" — dominate mention counts, which at 100 TB means
one straggler reducer unless the key is salted).

Pattern: two-phase aggregation. Phase 1 groups by (key, salt) where
salt = pmod(xxhash64(doc_id), S) — S-way fan-out of every hot key —
computing partial aggregates; phase 2 merges the S partials per key.
Commutative+associative aggregates only (counts, sums, min, set-unions
capped), so the result is identical to a single-phase groupBy. AQE's
skew handling complements this but cannot split a single hot *key*;
salting can.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonical_key_expr(col: str | Column) -> Column:
    """Normalization that merges coreferent surface forms:
    lowercase → strip non-word/space chars → collapse whitespace to a
    single space → trim. (Same normalizer family as the reference's
    metric normalization, metrics.py:28-31, plus space-collapsing.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[^\w\s]", ""), r"\s+", " "
        )
    )


def surrogate_id_expr(key: Column, prefix: str = "E") -> Column:
    """Stable surrogate node id from the canonical key (md5-based so it
    is reproducible across engines and runs)."""
    return F.concat(F.lit(prefix), F.substring(F.md5(key), 1, 16))


def salted_mention_counts(
    mentions: DataFrame,
    label_col: str = "label",
    salt_col_source: str = "doc_id",
    num_salts: int = 16,
    hash_doc_keys: bool = False,
    materialize: str | None = None,
) -> DataFrame:
    """mentions(label, doc_id, …) → (canonical_key, node_id,
    n_mentions, n_docs, aliases) via salted two-phase reduce.

    n_docs uses per-salt distinct doc sets merged at phase 2 — exact
    because the salt is derived from doc_id, so a doc never spans two
    salt buckets of the same key.
    """
    # hash_doc_keys narrows the shuffled doc key to 64 bits (documents
    # carry long sha256-hex ids); n_docs then counts distinct hashes —
    # collision odds are (per-key docs)^2 / 2^65, immaterial even at
    # 10^12 rows, and it roughly halves shuffle bytes in phases 0-1.
    doc_key = (
        F.xxhash64(F.col(salt_col_source))
        if hash_doc_keys
        else F.col(salt_col_source)
    )
    keyed = mentions.select(
        canonical_key_expr(label_col).alias("canonical_key"),
        F.col(label_col).alias("_surface"),
        doc_key.alias("_doc"),
    ).where(F.col("canonical_key") != "")
    # Round-4 restructure ("two_scan", default): the round-3 form
    # funneled BOTH output paths through one materialized
    # (key, surface, doc) aggregation — one full-width shuffle plus a
    # localCheckpoint write+read of the same bytes. The round-4
    # scaling campaigns showed that stage pinned at ~22 s at BOTH 2
    # and 8 pinned cores: on a single box, shuffle and block-manager
    # bandwidth are shared resources that do NOT scale with cores,
    # while map-side scan/regex work DOES. So the two paths now scan
    # the (cheap, codegen, core-scaling) mention map twice and each
    # shuffles only what it needs:
    #   - counts path: (key, doc) with map-side combine — no surface
    #     strings in the exchange (~40% fewer bytes than phase 0);
    #   - aliases path: distinct raw surfaces FIRST (codegen string
    #     hash-agg, map-side partial dedup to vocabulary size), then
    #     the normalize regex once per distinct surface — the second
    #     scan never pays mention-scale regex.
    # No materialization at all: nothing is written to the block
    # manager. materialize="checkpoint" / "persist" keep the
    # single-scan forms for comparison, and "fold" keeps the fork-free
    # set-union form — measured WORSE (same-window A/B at 800k docs:
    # nodes 192.7 s vs two_scan 81.0 s at 2 cores, 49.5 vs 28.3 s at
    # 8): mention-scale collect_set plans as ObjectHashAggregate,
    # which loses to codegen-count-plus-rescan by ~2.4×. Kept as a
    # selectable mode so the negative result stays reproducible.
    if materialize is None:
        import os

        # env-tunable default so A/B harnesses (scaling_child) can
        # flip the plan without code edits
        materialize = os.environ.get("KG_NODES_MATERIALIZE", "two_scan")
    if materialize not in ("fold", "two_scan", "checkpoint", "persist"):
        raise ValueError(
            "materialize must be 'fold', 'two_scan', 'persist' or "
            f"'checkpoint', got {materialize!r}"
        )
    if materialize == "fold":
        # The fork-free form: aliases ride THROUGH the salted count
        # phases as set-union aggregates (commutative+associative, so
        # phase-2 merge stays exact), so counts and aliases share ONE
        # lineage — one scan (no duplicated regex map), one
        # mention-scale exchange (map-side partial collect_set), no
        # materialization, and no final join. Buffer bound: per
        # (key, doc) the surface set is per-doc tiny; per (key, salt)
        # and per key it is the vocabulary the output's aliases array
        # must hold anyway.
        per_doc = keyed.groupBy("canonical_key", "_doc").agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.collect_set("_surface").alias("_surfs"),
        )
        salted = per_doc.withColumn(
            "_salt", F.pmod(F.xxhash64("_doc"), F.lit(num_salts))
        )
        partial = salted.groupBy("canonical_key", "_salt").agg(
            F.sum("_cnt").alias("_cnt"),
            F.count(F.lit(1)).alias("_docs"),
            F.array_distinct(F.flatten(F.collect_list("_surfs"))).alias(
                "_surfs"
            ),
        )
        merged = partial.groupBy("canonical_key").agg(
            F.sum("_cnt").alias("n_mentions"),
            F.sum("_docs").alias("n_docs"),
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("_surfs")))
            ).alias("aliases"),
        )
        return merged.select(
            "canonical_key",
            surrogate_id_expr(F.col("canonical_key")).alias("node_id"),
            "n_mentions",
            "n_docs",
            "aliases",
        )
    if materialize == "two_scan":
        per_doc = keyed.groupBy("canonical_key", "_doc").agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        # distinct-then-key: the alias path's regex runs on DISTINCT
        # surfaces (vocabulary scale), not per mention row — the
        # second scan is a codegen string hash-agg, and the normalize
        # regex (the N-side serial cost) runs once per surface form.
        # Valid because canonical_key is a pure function of the
        # surface, so distinct-surface → (key, surface) pairs are
        # already distinct.
        alias_src = (
            mentions.select(F.col(label_col).alias("_surface"))
            .distinct()
            .select(
                canonical_key_expr("_surface").alias("canonical_key"),
                "_surface",
            )
            .where(F.col("canonical_key") != "")
        )
    else:
        per_doc_surface = keyed.groupBy(
            "canonical_key", "_surface", "_doc"
        ).agg(F.count(F.lit(1)).alias("_cnt"))
        if materialize == "persist":
            from pyspark import StorageLevel

            per_doc_surface = per_doc_surface.persist(
                StorageLevel.MEMORY_AND_DISK
            )
        else:
            per_doc_surface = per_doc_surface.localCheckpoint(eager=True)
        per_doc = per_doc_surface.groupBy("canonical_key", "_doc").agg(
            F.sum("_cnt").alias("_cnt")
        )
        alias_src = per_doc_surface.select(
            "canonical_key", "_surface"
        ).distinct()
    # phase 1 merges per (key, salt); phase 2 merges the S partials.
    salted = per_doc.withColumn(
        "_salt", F.pmod(F.xxhash64("_doc"), F.lit(num_salts))
    )
    partial = salted.groupBy("canonical_key", "_salt").agg(
        F.sum("_cnt").alias("_cnt"),
        F.count(F.lit(1)).alias("_docs"),
    )
    counts = partial.groupBy("canonical_key").agg(
        F.sum("_cnt").alias("n_mentions"),
        F.sum("_docs").alias("n_docs"),
    )
    # aliases — vocabulary-sized by the time it shuffles; collects
    # once per key
    aliases = alias_src.groupBy("canonical_key").agg(
        F.array_sort(F.collect_set("_surface")).alias("aliases")
    )
    merged = counts.join(aliases, "canonical_key")
    return merged.select(
        "canonical_key",
        surrogate_id_expr(F.col("canonical_key")).alias("node_id"),
        "n_mentions",
        "n_docs",
        "aliases",
    )
