"""Local replica of the driver's queries()-vs-oracle_sql() check:
run the Ray query and the DuckDB SQL over the same sf dir, sort columns
by name and rows by value, and require exact equality."""

from __future__ import annotations

import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(result, rd.Dataset):
            result = result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(ray_result, oracle_df: pd.DataFrame) -> dict:
    a = canon(to_pandas(ray_result))
    b = canon(oracle_df)
    out = {
        "rows": (len(a), len(b)),
        "rows_match": len(a) == len(b),
        "cols": (list(a.columns), list(b.columns)),
        "cols_match": list(a.columns) == list(b.columns),
    }
    # The driver's value-hash is TYPE-sensitive (int64 84 vs float 84.0
    # hash differently) while assert_frame_equal(check_dtype=False) is
    # not — flag int-vs-float splits so the local sweep catches what
    # bit the driver in round 4 (q_repetition_rules: DuckDB sum() →
    # HUGEINT → float64 vs engine int64)
    out["dtype_flags"] = [
        f"{c}: engine={a[c].dtype} oracle={b[c].dtype}"
        for c in a.columns
        if c in b.columns and {a[c].dtype.kind, b[c].dtype.kind} in ({"i", "f"}, {"u", "f"})
    ]
    if out["rows_match"] and out["cols_match"]:
        try:
            pd.testing.assert_frame_equal(a, b, check_exact=True, check_dtype=False)
            out["values_match"] = not out["dtype_flags"]
            if out["dtype_flags"]:
                out["error"] = f"int-vs-float dtype split: {out['dtype_flags']}"
        except AssertionError as e:
            out["values_match"] = False
            out["error"] = str(e)[:2000]
    else:
        out["values_match"] = False
    return out
