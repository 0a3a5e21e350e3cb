"""Mimics the driver's correctness gate: run each queries() entry and its
oracle_sql() side by side at sf0.01 and compare row count + values
(order-insensitive, columns sorted by name)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _to_pandas(obj):
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name):
    got = _canon(_to_pandas(QUERIES[name](SF)))
    con = _connect(SF)
    want = _canon(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), f"{name}: columns differ"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    for c in got.columns:
        # Dtype-strict on numeric kind: the driver's value hash is
        # dtype-sensitive, so an int64 engine column vs a float64 oracle
        # column (e.g. DuckDB HUGEINT sums materializing as float) must
        # fail here, not at the driver.  _canon already widens within a
        # kind (any int -> int64, any float -> float64), so comparing
        # the canonical dtypes is exactly a kind check.
        assert got[c].dtype == want[c].dtype, (
            f"{name}: column {c} dtype {got[c].dtype} != oracle {want[c].dtype}"
        )
    for c in got.columns:
        if got[c].dtype == np.float64:
            # BIT-exact, mirroring the driver's value-hash comparison:
            # any float column an operator emits must be computed with
            # an accumulation-order-independent recipe (per-row kernels,
            # exact-int sums scaled at the end, fixed-order reductions)
            ga, wa = got[c].to_numpy(), want[c].to_numpy()
            assert np.array_equal(ga, wa, equal_nan=True), (
                f"{name}: float column {c} not bit-identical "
                f"(max abs diff {np.nanmax(np.abs(ga - wa))})"
            )
        else:
            assert got[c].tolist() == want[c].tolist(), f"{name}: column {c} differs"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name):
    got = _to_pandas(QUERIES[name](SF))
    assert got is not None and len(got) >= 0


def test_entry_smoke():
    t = entrymod.entry()
    assert t.num_rows > 0
    assert "doc_id" in t.schema.names and "score" in t.schema.names
