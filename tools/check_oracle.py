"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, schema
(column names, sorted), and an order-insensitive value comparison.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _total_order_key(vals: np.ndarray) -> np.ndarray:
    """IEEE-754 total-order sort key for float64: monotone uint64 with
    -0.0 strictly before +0.0 and all NaN payloads collapsed to one
    maximal key.  Pandas ``sort_values`` treats -0.0 == +0.0, so two
    rows that tie on every other key but carry opposite-signed zeros in
    engine-specific order could misalign and report a spurious mismatch
    (ADVICE r6 — fail-noisy, but still a false red).  Sorting floats by
    this key makes row alignment deterministic under signed zeros."""
    v = vals.astype(np.float64)
    bits = v.view(np.uint64)
    neg = (bits >> np.uint64(63)) == 1
    key = np.where(neg, ~bits, bits | np.uint64(1 << 63))
    return np.where(np.isnan(v), np.uint64(0xFFFFFFFFFFFFFFFF), key)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        # naive timestamps as strings for stable compare
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    # Sort by a shadow frame where float columns are replaced by their
    # bit-pattern total-order key (see _total_order_key); other columns
    # sort as themselves.
    key = pd.DataFrame(index=df.index)
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.floating):
            key[c] = _total_order_key(df[c].to_numpy(dtype=np.float64))
        else:
            key[c] = df[c]
    order = key.sort_values(by=list(key.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"schema: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    # The driver's value-hash is dtype-sensitive across the int/float
    # divide (round-1 evidence: int64-vs-float64 simhash FAILED while
    # int32-vs-int64 and ns-vs-us datetimes passed).  DuckDB returns
    # HUGEINT sums as float64 — flag any int↔float pairing that is not
    # explained by NULLs forcing both sides wide.
    for c in spark_pdf.columns:
        sa, da = spark_pdf[c].dtype, duck_pdf[c].dtype
        s_int = np.issubdtype(sa, np.integer)
        d_int = np.issubdtype(da, np.integer)
        s_flt = np.issubdtype(sa, np.floating)
        d_flt = np.issubdtype(da, np.floating)
        if (s_int and d_flt and not duck_pdf[c].isna().any()) or (
            s_flt and d_int and not spark_pdf[c].isna().any()
        ):
            problems.append(
                f"dtype drift col={c}: spark={sa} duck={da} (int↔float kills the "
                f"driver's value-hash; CAST the oracle aggregate to BIGINT/DOUBLE)"
            )
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = pd.to_numeric(a[c]).to_numpy(dtype=float)
            bf = pd.to_numeric(b[c]).to_numpy(dtype=float)
            both_nan = np.isnan(af) & np.isnan(bf)
            # Bit-level compare, not ==: the driver's value-hash is
            # repr/bit sensitive, so -0.0 vs +0.0 (round-5's
            # covariance_matrix_embeddings driver red — values ==-equal,
            # one signbit-negative DuckDB cell) must FAIL here too.
            # float64 view-as-uint64 equality == bit equality; NaNs are
            # handled separately (any NaN payload counts as a match).
            eq = (af.view(np.uint64) == bf.view(np.uint64)) | both_nan
            signed_zero = (af == bf) & (np.signbit(af) != np.signbit(bf))
            if signed_zero.any():
                idx = int(np.argmax(signed_zero))
                problems.append(
                    f"signed-zero asymmetry col={c} at sorted-row {idx}: "
                    f"spark={af[idx]!r} duck={bf[idx]!r} "
                    f"({int(signed_zero.sum())} cells; ==-equal but the "
                    f"driver's value-hash splits them — canonicalize with "
                    f"`+ 0.0` / `+ 0` on BOTH engines)"
                )
        else:
            eq = (av == bv) | (pd.isna(a[c]).to_numpy() & pd.isna(b[c]).to_numpy())
        if not eq.all():
            idx = int(np.argmax(~eq))
            problems.append(
                f"value mismatch col={c} at sorted-row {idx}: spark={av[idx]!r} duck={bv[idx]!r} ({int((~eq).sum())} rows differ)"
            )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as ent
    from imdb_metacritic_data_warehouse_spark.session import get_spark

    spark = get_spark("oracle_check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = ent.queries(), ent.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in os_:
            print(f"WEAK {name}: no oracle, rows={len(spark_pdf)}")
            continue
        try:
            duck_pdf = con.execute(os_[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}: rows={len(spark_pdf)}")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
