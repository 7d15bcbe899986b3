"""Hilbert-curve 2-D indexing core (r14) — the locality-preserving
companion to the proven z-order layout family
(`operators/bucketing.py layout_zorder_locality`).

Why it earns a place: unlike Morton/z-order, CONSECUTIVE Hilbert
indices are always 4-adjacent in the plane (Manhattan distance 1 — no
diagonal jumps across half the key space), so range scans over a
Hilbert-clustered layout touch strictly fewer file/bucket boundaries.
Both halves of the family are live: the AUDIT query
(`layout_hilbert_locality`, driver-proven in CORRECTNESS_r14)
measures exactly that against the z-order and linear twins on the
(part-bucket, supplier-bucket) grid, and the WRITE path
(`operators/bucketing.py hilbert_write_path`, r15) clusters a table
by the curve key through one range exchange — per-file key-span and
single-exchange plan pinned by tests/test_bucketing.py +
tests/test_plan_quality.py.

Design for the oracle gate: the xy -> d transform is a FIXED
``order``-level bit machine (the classic public construction:
per-level quadrant extraction, Gray-ish quadrant offset
d += s^2 * (3*rx XOR ry), then reflect+swap), so ONE generator emits
the identical unrolled expression chain for BOTH engines — DuckDB SQL
(lateral column aliases, ``xor()``) and Spark SQL (lateral column
aliases, ``^``) — the ``_hw_step``/ADPCM-oracle discipline: no hand
-maintained twin expressions.  Everything is integer; no UDFs — the
Spark side stays JVM-side whole-stage codegen.

Reference parity anchor: the reference has no layout optimizer at
all; this extends the beyond-reference lake-layout family
(layout_zorder_locality, lake_clustering_depth_audit).
"""

from __future__ import annotations

HILBERT_ORDER = 8          # 2^8 x 2^8 grid: matches the bucket grids
                           # the z-order audit uses; 16 levels would
                           # work identically, 8 keeps plans readable


def hilbert_index(x: int, y: int, order: int = HILBERT_ORDER) -> int:
    """xy -> distance along the order-``order`` Hilbert curve (the
    standard public algorithm: quadrant offset + reflect/swap)."""
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:                      # reflect (if rx) then swap
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_point(d: int, order: int = HILBERT_ORDER) -> tuple[int, int]:
    """distance -> (x, y): the exact inverse walk, for tests."""
    x = y = 0
    t = d
    s = 1
    while s < (1 << order):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def hilbert_level_selects(xcol: str, ycol: str, dialect: str,
                          order: int = HILBERT_ORDER) -> list[list[str]]:
    """The unrolled xy -> d machine as per-LEVEL lists of SELECT-list
    fragments (each level appended to a ``SELECT *`` of the previous
    one), ending with the final ``hd`` alias level — ONE text
    generator for both engines (``dialect`` in {'duckdb', 'spark'};
    they differ only in the XOR spelling).  The engine side folds the
    levels as chained ``selectExpr("*", *level)`` calls; the oracle
    side nests them as subqueries (:func:`hilbert_sql`) — same
    fragments, so the two engines cannot drift.

    Structure matters: one PROJECTION BOUNDARY per level, with only
    the level-local rx/ry as lateral aliases.  A single flat lateral
    chain is semantically identical but binds each alias by textual
    inlining, so expression size compounds ~5x per level — measured
    ~170 s for a 168-row grid at order 8 in DuckDB; per-level
    boundaries keep binding linear (same grid: 0.04 s).  Both DuckDB
    (>= 0.10) and Spark (>= 3.4) resolve the level-local aliases."""
    if dialect == "duckdb":
        def xor(a: str, b: str) -> str:
            return f"xor({a}, {b})"
    elif dialect == "spark":
        def xor(a: str, b: str) -> str:
            return f"({a} ^ {b})"
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    levels = [[f"CAST(0 AS BIGINT) AS d0",
               f"CAST({xcol} AS BIGINT) AS x0",
               f"CAST({ycol} AS BIGINT) AS y0"]]
    k = 0
    s = 1 << (order - 1)
    while s > 0:
        k += 1
        p, c = k - 1, k
        levels.append([
            f"(CASE WHEN (x{p} & {s}) > 0 THEN 1 ELSE 0 END) AS rx{c}",
            f"(CASE WHEN (y{p} & {s}) > 0 THEN 1 ELSE 0 END) AS ry{c}",
            f"d{p} + {s * s} * " + xor(f"(3 * rx{c})", f"ry{c}")
            + f" AS d{c}",
            # if ry=0: x' = (rx ? s-1-y : y), y' = (rx ? s-1-x : x)
            f"CASE WHEN ry{c} = 0 THEN (CASE WHEN rx{c} = 1 "
            f"THEN {s - 1} - y{p} ELSE y{p} END) ELSE x{p} END AS x{c}",
            f"CASE WHEN ry{c} = 0 THEN (CASE WHEN rx{c} = 1 "
            f"THEN {s - 1} - x{p} ELSE x{p} END) ELSE y{p} END AS y{c}"])
        s >>= 1
    levels.append([f"d{k} AS hd"])
    return levels


def hilbert_sql(source: str, xcol: str, ycol: str, dialect: str,
                order: int = HILBERT_ORDER) -> str:
    """:func:`hilbert_level_selects` composed as a nested-subquery
    query over ``source`` (a relation expression), exposing
    ``source``'s columns plus ``hd``."""
    inner = (source if source.strip().startswith("(")
             else f"(SELECT * FROM {source})")
    for level in hilbert_level_selects(xcol, ycol, dialect, order):
        inner = f"(SELECT *, {', '.join(level)} FROM {inner})"
    return f"SELECT * FROM {inner}"
