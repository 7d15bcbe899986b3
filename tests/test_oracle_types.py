"""Registry-wide oracle output-type lint (VERDICT r10 item 2a).

Root cause of the only driver-red in r9/r10 (stats_cramers_v): a DuckDB
window-SUM output column typed HUGEINT, which pandas/arrow materializes
as float64 (60000.0) while Spark emits bigint 60000 — the driver's
value-hash over the fetched frames differs even though every value is
numerically identical.  fetchall() normalizes HUGEINT to Python int, so
the local gate replica was blind to the class for two rounds.

This test DESCRIBEs every registered oracle against the sf0.01 views
(plan-only — nothing executes) and asserts that no output column has a
pandas-lossy type:

- HUGEINT / UHUGEINT: materialize as float64 (the cramers_v bug).
- UBIGINT/UINTEGER/USMALLINT/UTINYINT: materialize as unsigned numpy
  dtypes; Spark has no unsigned integers, so the frames hash apart.

Every aggregate that can widen past BIGINT (SUM over BIGINT, COUNT
window sums, integer // chains) must CAST back to BIGINT (or DOUBLE,
deliberately) in the oracle's final projection — the repo convention,
e.g. ``CAST(n AS BIGINT) AS n_pairs``.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from gmall_211027_flink_spark.catalog import TABLES
from gmall_211027_flink_spark.registry import ORACLES, load_all

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.01")

LOSSY = {"HUGEINT", "UHUGEINT",
         "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}


@pytest.fixture(scope="module")
def con():
    load_all()
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_pandas_lossy_oracle_output_types(con):
    assert len(ORACLES) > 400, "registry failed to load"
    offenders = []
    for name, sql in sorted(ORACLES.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except duckdb.Error as e:  # pragma: no cover - defensive
            offenders.append((name, f"DESCRIBE failed: {e}"))
            continue
        for col, typ, *_ in desc:
            base = typ.split("(")[0].strip().upper()
            if base in LOSSY:
                offenders.append((name, f"{col}: {typ}"))
    assert not offenders, (
        "pandas-lossy oracle output columns (cast to BIGINT/DOUBLE in "
        f"the final projection): {offenders}")
