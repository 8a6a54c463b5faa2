"""Replica of the driver's correctness gate: every __spark_entry__
queries() entry must match its oracle_sql() in DuckDB — row count,
column set, and exact values (order-insensitive).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

import os
SF_DIR = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    # NO dtype coercion: the driver's value hash is typed (round 2's
    # kg_pagerank failed on DuckDB HUGEINT vs Spark BIGINT with equal
    # values — a coercing replica cannot predict that). Dtypes are
    # asserted equal in the comparison instead.
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True)


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        df = q(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    got = _canon(q(spark, SF_DIR).toPandas())
    con = _duck()
    want = _canon(con.execute(oracles[name]).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        assert got[c].dtype == want[c].dtype, (
            f"{name}.{c}: spark dtype {got[c].dtype} != oracle dtype "
            f"{want[c].dtype} — driver's typed hash would reject "
            f"(cast the oracle, e.g. DuckDB sum() widens BIGINT->HUGEINT)"
        )
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(a.dtype, np.floating):
            exact = np.array_equal(a, b, equal_nan=True)
            if not exact:
                close = np.allclose(a, b, rtol=0, atol=1e-12, equal_nan=True)
                diff = np.nanmax(np.abs(a - b)) if len(a) else 0.0
                assert close, f"{name}.{c}: max abs diff {diff}"
                pytest.fail(
                    f"{name}.{c}: values within 1e-12 but not bit-identical "
                    f"(max diff {diff}) — driver hash may reject"
                )
        else:
            mism = (pd.Series(a).astype(object) != pd.Series(b).astype(object))
            both_na = pd.Series(a).isna() & pd.Series(b).isna()
            mism = mism & ~both_na
            assert not mism.any(), (
                f"{name}.{c}: {int(mism.sum())} mismatches, first at row "
                f"{int(np.argmax(mism.to_numpy()))}: "
                f"{a[np.argmax(mism.to_numpy())]!r} != {b[np.argmax(mism.to_numpy())]!r}"
            )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0
