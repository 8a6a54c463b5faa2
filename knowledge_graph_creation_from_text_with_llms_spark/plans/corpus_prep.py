"""Training-corpus preparation plan: the composed cleaning DAG a
100 TB pretraining pipeline runs before anything else touches the
data.

    docs
      →(corpus_filter)   keep/drop + reasons     (map-only projection)
      →(exact dedup)     one survivor per byte-identical text
      →(MinHash-LSH)     near-dup candidate pairs (banded, capped)
      →(components)      duplicate clusters, canonical = min id
      →(survivors)       kept docs minus non-canonical cluster members

Every stage is the already-gated operator; this plan only wires them
and keeps the audit trail (per-stage counts + drop reasons), so a
dropped terabyte is always attributable to a rule.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup, textstats


@dataclass
class CorpusPrepConfig:
    allowed_langs: tuple[str, ...] = ("en",)
    min_tokens: int = 5
    min_quality: float = 0.5
    max_top_bigram: float = 0.5
    jaccard_threshold: float = 0.5
    lsh_max_bucket: int | None = 500
    audit: dict[str, int] = field(default_factory=dict)


def prepare_corpus(
    docs: DataFrame,
    config: CorpusPrepConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs → surviving docs (same schema), after quality filtering,
    exact dedup, and near-dup cluster collapse. Deterministic: the
    survivor of any duplicate set is its minimum id. Per-stage counts
    land in config.audit (driver-side scalars only)."""
    cfg = config or CorpusPrepConfig()
    cfg.audit["input"] = docs.count()

    decisions = textstats.corpus_filter(
        docs,
        id_col=id_col,
        text_col=text_col,
        allowed_langs=cfg.allowed_langs,
        min_tokens=cfg.min_tokens,
        min_quality=cfg.min_quality,
        max_top_bigram=cfg.max_top_bigram,
    )
    kept = docs.join(
        decisions.where(F.col("keep")).select(id_col), id_col, "semi"
    )
    cfg.audit["after_quality_filter"] = kept.count()

    exact = dedup.exact_duplicates(kept, id_col=id_col, text_col=text_col)
    kept = kept.join(
        exact.select(F.col("survivor_id").alias(id_col)), id_col, "semi"
    )
    cfg.audit["after_exact_dedup"] = kept.count()

    pairs = dedup.minhash_lsh_pairs(
        kept,
        id_col=id_col,
        text_col=text_col,
        jaccard_threshold=cfg.jaccard_threshold,
        max_bucket_size=cfg.lsh_max_bucket,
    )
    comp = dedup.connected_components(pairs)
    non_canonical = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    survivors = kept.join(non_canonical, id_col, "left_anti")
    cfg.audit["after_neardup_collapse"] = survivors.count()
    return survivors
