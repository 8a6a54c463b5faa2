"""Docs must state the real gate-registry totals — round-4 verdict
flagged COVERAGE.md drifting (65/64 vs the registry's 68/67). This
pins every documented count to len(gate.QUERIES)/len(gate.ORACLES) so
adding a gate without updating the docs fails locally."""

from pathlib import Path

from knowledge_graph_creation_from_text_with_llms_spark import gate

ROOT = Path(__file__).resolve().parent.parent


def test_coverage_md_gate_totals_match_registry():
    nq, no = len(gate.QUERIES), len(gate.ORACLES)
    cov = (ROOT / "COVERAGE.md").read_text(encoding="utf-8")
    assert f"{nq} `queries()` entries, {no} DuckDB oracles" in cov


def test_readme_gate_totals_match_registry():
    nq, no = len(gate.QUERIES), len(gate.ORACLES)
    readme = (ROOT / "README.md").read_text(encoding="utf-8")
    assert f"{no} of the {nq} gate queries" in readme


def test_bench_covers_every_gate():
    """bench.py must time every registered gate query (plus the e2e
    flagship and the index-build split) — round-5 rule so a new gate
    can't land without a bench entry."""
    src = (ROOT / "bench.py").read_text(encoding="utf-8")
    missing = [q for q in gate.QUERIES if f'"{q}"' not in src]
    assert not missing, missing
