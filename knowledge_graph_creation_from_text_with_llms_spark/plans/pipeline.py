"""The end-to-end KG construction DAG with checkpoint/resume.

source →(chunk)→ chunks →(extract)→ raw_responses →(parse)→ triples_raw
→(link)→ triples_linked →(canonicalize)→ nodes →(materialize)→
edges / adjacency

Each stage is a DataFrame→DataFrame function that commits one catalog
snapshot plus a manifest row. `run` skips stages whose outputs are
already committed (resume-from-kill idempotence: re-running after a
crash re-executes only uncommitted stages and produces byte-identical
final tables — tested in tests/test_pipeline_resume.py).

The per-row invariant (content sha256 carried from source through every
row-preserving stage) is asserted by `verify_invariant`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import chunker, extractor, parser, linker, canonicalizer, graph
from ..sources.catalog import ParquetCatalog


@dataclass
class PipelineConfig:
    chunk_size: int = 500
    chunk_unit: str = "sentence"
    property_method: str = "exact"  # exact | cos_similarity | mixed
    num_salts: int = 16
    backend_factory: Callable = extractor.RuleBasedBackend
    edges_partitions: int | None = None


STAGES = ("chunks", "raw_responses", "triples_raw", "triples_linked",
          "nodes", "edges", "adjacency")


class KGPipeline:
    def __init__(
        self,
        spark: SparkSession,
        catalog: ParquetCatalog,
        config: PipelineConfig | None = None,
        entity_dict: DataFrame | None = None,
        property_dict: DataFrame | None = None,
    ):
        self.spark = spark
        self.catalog = catalog
        self.config = config or PipelineConfig()
        self.entity_dict = entity_dict
        self.property_dict = property_dict

    # -- individual stages -------------------------------------------------
    def stage_chunks(self, source: DataFrame) -> DataFrame:
        return chunker.chunk_documents(
            source, self.config.chunk_size, self.config.chunk_unit
        )

    def stage_responses(self, chunks: DataFrame) -> DataFrame:
        return extractor.extract_responses(chunks, self.config.backend_factory)

    def stage_triples_raw(self, responses: DataFrame) -> DataFrame:
        return parser.parse_responses(responses)

    def stage_triples_linked(self, triples_raw: DataFrame) -> DataFrame:
        if self.entity_dict is None or self.property_dict is None:
            # dictionary-less mode: everything stays a surface form
            return (
                triples_raw.withColumn("subj_id", F.lit(None).cast("string"))
                .withColumn("pred_id", F.lit(None).cast("string"))
                .withColumn("obj_id", F.lit(None).cast("string"))
                .withColumn("is_literal", F.lit(True))
            )
        return linker.link_triples(
            triples_raw,
            self.entity_dict,
            self.property_dict,
            method=self.config.property_method,
        )

    def stage_nodes(self, triples_linked: DataFrame) -> DataFrame:
        mentions = triples_linked.select(
            F.col("subj").alias("label"), "doc_id"
        ).unionAll(
            triples_linked.where(~F.col("is_literal")).select(
                F.col("obj").alias("label"), "doc_id"
            )
        )
        return canonicalizer.salted_mention_counts(
            mentions, num_salts=self.config.num_salts, hash_doc_keys=True
        )

    def stage_edges(self, triples_linked: DataFrame) -> DataFrame:
        return graph.build_edges(triples_linked)

    def stage_adjacency(self, edges: DataFrame) -> DataFrame:
        return graph.build_adjacency(edges)

    # -- orchestration -------------------------------------------------------
    def run(self, source: DataFrame, resume: bool = True) -> dict[str, int]:
        """Run all stages, skipping already-committed ones when
        resume=True. Returns {stage: rows_out}."""
        cat = self.catalog
        done = cat.committed_stages() if resume else set()
        counts: dict[str, int] = {}

        if "source" in done and cat.exists("source"):
            counts["source"] = -1  # skipped (resumed)
        else:
            counts["source"] = cat.write(source, "source", stage="source").rows

        plan = [
            ("chunks", lambda: self.stage_chunks(cat.read("source"))),
            ("raw_responses", lambda: self.stage_responses(cat.read("chunks"))),
            ("triples_raw", lambda: self.stage_triples_raw(cat.read("raw_responses"))),
            ("triples_linked", lambda: self.stage_triples_linked(cat.read("triples_raw"))),
            ("nodes", lambda: self.stage_nodes(cat.read("triples_linked"))),
            ("edges", lambda: self.stage_edges(cat.read("triples_linked"))),
            ("adjacency", lambda: self.stage_adjacency(cat.read("edges"))),
        ]
        for name, thunk in plan:
            if name in done and cat.exists(name):
                counts[name] = -1  # skipped (resumed)
                continue
            df = thunk()
            repart = "src_id" if name == "edges" else None
            counts[name] = cat.write(
                df, name, stage=name,
                repartition_by=repart,
                num_partitions=self.config.edges_partitions,
            ).rows
        return counts

    # -- invariants ------------------------------------------------------------
    def verify_invariant(self) -> bool:
        """content_sha256 carried through chunk/extract/parse stages
        matches the source exactly (per doc_id)."""
        cat = self.catalog
        src = cat.read("source").select("doc_id", "content_sha256").distinct()
        for t in ("chunks", "raw_responses", "triples_raw"):
            got = cat.read(t).select("doc_id", "content_sha256").distinct()
            bad = got.join(src, ["doc_id", "content_sha256"], "left_anti").count()
            if bad:
                return False
        return True
