"""Every registered query hash-matches its DuckDB oracle at sf0.001 —
the same comparison the driver's correctness gate performs (the gate
itself runs at sf0.01; this is the fast in-repo replica).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from gmall_211027_flink_spark.catalog import TABLES
from gmall_211027_flink_spark.registry import ORACLES, QUERIES, load_all

from tests.conftest import SF_DIR

load_all()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t)), \
        [cols[i] for i in order]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    df = QUERIES[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only check (no oracle)")
    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert len(spark_rows) == len(duck_rows), "row count mismatch"
    s_rows, s_cols = _normalize(spark_rows, df.columns)
    d_rows, d_cols = _normalize(duck_rows, duck_cols)
    assert s_cols == d_cols, "column names mismatch"
    for sr, dr in zip(s_rows, d_rows):
        for c, a, b in zip(s_cols, sr, dr):
            if isinstance(a, float) and isinstance(b, float) \
                    and math.isnan(a) and math.isnan(b):
                continue
            assert a == b, f"value mismatch in {c}: {a!r} != {b!r}"
