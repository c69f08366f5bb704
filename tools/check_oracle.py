"""Local replica of the driver's correctness gate.

For each registered query: run the Spark DataFrame and the DuckDB oracle on
the same parquet tables, then compare row count, column names (sorted), and
values (rows sorted by every column — order-insensitive, exact equality; for
floats, bit-level equality is the goal and any nonzero diff is reported).

Usage:
    python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose DuckDB oracle is CAPACITY-infeasible at large scales (not
# wrong — too expensive for the oracle engine): at any non-default scale
# tag, if an adversarial-session digest pin exists for the (query, scale),
# the gate checks the pin INSTEAD of running the oracle. At the default
# sf0.001/sf0.01 scales the oracle always runs — this never weakens the
# hash-exact gate, it closes the sf1 blind spot the r12 verdict flagged
# (the 16-subspace unrolled-Lloyd PQ oracle spills >80 GB at sf1 while
# the Spark side runs fine).
ORACLE_CAPACITY_PINS = {"embedding_pq_topk", "embedding_ivfpq_topk"}
ORACLE_SCALES = ("sf0.001", "sf0.01")


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    from etl_poc_spark.io import TABLES, table_path

    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.isdir(p):  # Spark-written table: a dir of part files
            p = os.path.join(p, "*.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duckdb={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns: spark={s_cols} duckdb={d_cols}")
        return problems
    if problems:
        return problems
    s, d = canon(spark_pdf), canon(duck_pdf)
    for col in s.columns:
        sv, dv = s[col], d[col]
        # Dtype-family strictness: the driver hashes rendered values, so an
        # int64 Spark column vs a float64 DuckDB column (e.g. an uncast
        # integer SUM -> HUGEINT -> float64) hash-mismatches even when
        # numerically equal (409 vs 409.0). Fail here before the driver does.
        s_kind, d_kind = sv.dtype.kind, dv.dtype.kind
        numeric = {"i", "u", "f"}
        if s_kind in numeric and d_kind in numeric and ((s_kind == "f") != (d_kind == "f")):
            problems.append(
                f"col {col}: dtype family mismatch spark={sv.dtype} duckdb={dv.dtype} "
                f"(int-vs-float renders differently in the driver hash — CAST the oracle)"
            )
            continue
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            sa = sv.astype(float).to_numpy()
            da = dv.astype(float).to_numpy()
            import numpy as np

            both_nan = pd.isna(sa) & pd.isna(da)
            neq = ~both_nan & (sa != da)
            if neq.any():
                idx = int(np.argmax(neq))
                maxdiff = float(np.nanmax(np.abs(sa - da)))
                problems.append(
                    f"col {col}: {int(neq.sum())} float mismatches, max abs diff {maxdiff:.3e} "
                    f"(first at row {idx}: spark={sa[idx]!r} duckdb={da[idx]!r})"
                )
        else:
            sv2 = sv.astype(str)
            dv2 = dv.astype(str)
            neq = (sv2 != dv2).to_numpy()
            if neq.any():
                import numpy as np

                idx = int(np.argmax(neq))
                problems.append(
                    f"col {col}: {int(neq.sum())} mismatches (first at row {idx}: "
                    f"spark={sv.iloc[idx]!r} duckdb={dv.iloc[idx]!r})"
                )
    return problems


def _pin_digest(rows: list[list[str | None]]) -> str:
    """Canonical digest of a pin's rendered rows — lets large-scale pin
    files (sf1: tens of MB of rows) store {columns, n_rows, sha256}
    instead of the rows themselves, with identical bit-exactness."""
    import hashlib
    import json

    return hashlib.sha256(
        json.dumps(rows, separators=(",", ":")).encode()
    ).hexdigest()


def _pin_rows(pdf: pd.DataFrame) -> list[list[str | None]]:
    """Render a frame to the pin file's canonical form: columns sorted,
    rows sorted by every column, floats as repr (bit-exact), everything
    else str. Must match tools/gen_pins in generate order."""
    pdf = canon(pdf)
    return [
        [
            (repr(float(v)) if hasattr(v, "dtype") and v.dtype.kind == "f"
             else (None if v is None else str(v)))
            for v in row
        ]
        for row in pdf.itertuples(index=False)
    ]


def load_pins() -> dict:
    """Pinned exact outputs for the rows-only (no-SQL-oracle) queries.

    Each entry is {query: {sfN: {columns, rows}}} generated once and
    verified bit-stable under the adversarial session (local[3],
    shuffle.partitions=7, AQE off) — so a value drift is a real
    regression, not partitioning noise. Upgrades the rows-only gate
    class to pinned-exact."""
    import glob
    import json

    tools_dir = os.path.dirname(os.path.abspath(__file__))
    merged: dict = {}
    # merge every pin file (pinned_expected.json = sf0.001/sf0.01;
    # pinned_expected_sf1.json = the sf1 smoke build, etc.) — entries are
    # keyed {query: {sf_tag: ...}} so scales never collide
    for path in sorted(glob.glob(os.path.join(tools_dir, "pinned_expected*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except OSError:
            continue
        for name, by_sf in data.items():
            merged.setdefault(name, {}).update(by_sf)
    return merged


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from etl_poc_spark import registry
    from etl_poc_spark.session import get_spark

    registry.load_all()
    spark = get_spark("oracle_check")
    con = duckdb_conn(args.sf_dir)
    pins = load_pins()
    sf_tag = os.path.basename(args.sf_dir.rstrip("/"))

    from etl_poc_spark.operators.pins import release_pins

    names = args.queries or sorted(registry.QUERIES)
    n_fail = 0
    for name in names:
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        try:
            spark_pdf = fn(spark, args.sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        finally:
            # drop per-query pinned stage frames — 80 queries of leaked
            # cache otherwise build memory pressure that skews the sweep
            release_pins()
            spark.catalog.clearCache()
        t_spark = time.perf_counter() - t0
        capacity_pin = (
            name in ORACLE_CAPACITY_PINS
            and sf_tag not in ORACLE_SCALES
            and pins.get(name, {}).get(sf_tag) is not None
        )
        if name not in registry.ORACLES or capacity_pin:
            reason = "oracle-capacity pin" if capacity_pin else "no SQL oracle"
            pin = pins.get(name, {}).get(sf_tag)
            if pin is not None:
                got_rows = _pin_rows(spark_pdf)
                if sorted(spark_pdf.columns) != pin["columns"]:
                    n_fail += 1
                    print(
                        f"FAIL  {name}: pinned columns mismatch "
                        f"(got {sorted(spark_pdf.columns)}, pinned {pin['columns']})"
                    )
                elif "sha256" in pin:
                    if (
                        len(got_rows) != pin["n_rows"]
                        or _pin_digest(got_rows) != pin["sha256"]
                    ):
                        n_fail += 1
                        print(
                            f"FAIL  {name}: pinned digest mismatch "
                            f"(got {len(got_rows)} rows, pinned {pin['n_rows']})"
                        )
                    else:
                        print(
                            f"pin   {name}: {reason}; matches pinned digest "
                            f"— {len(spark_pdf)} rows, {t_spark:.1f}s"
                        )
                    continue
                elif got_rows != pin["rows"]:
                    n_fail += 1
                    n_bad = sum(1 for a, b in zip(got_rows, pin["rows"]) if a != b)
                    n_bad += abs(len(got_rows) - len(pin["rows"]))
                    print(
                        f"FAIL  {name}: pinned values mismatch "
                        f"({n_bad} rows differ; got {len(got_rows)} rows, "
                        f"pinned {len(pin['rows'])})"
                    )
                else:
                    print(
                        f"pin   {name}: {reason}; matches pinned exact output "
                        f"— {len(spark_pdf)} rows, {t_spark:.1f}s"
                    )
                continue
            print(f"skip  {name}: no oracle (rows-only) — {len(spark_pdf)} rows, {t_spark:.1f}s")
            continue
        try:
            duck_pdf = con.sql(registry.ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name} ({len(spark_pdf)} rows, {t_spark:.1f}s)")
            for p in problems:
                print(f"      - {p}")
        else:
            print(f"ok    {name} ({len(spark_pdf)} rows, {t_spark:.1f}s)")
    print(f"\n{len(names) - n_fail}/{len(names)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
