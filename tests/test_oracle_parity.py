"""Self-check mirroring the driver's correctness gate: every ``queries()``
entry with an ``oracle_sql()`` must match DuckDB row-for-row (order-
insensitive, columns sorted by name) on the same parquet tables."""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = set()
    for tup in df.itertuples(index=False, name=None):
        rows.add(tuple(None if v != v else v if not isinstance(v, float) else round(v, 9) for v in tup))
    return cols, rows


def _canon_type(t):
    """Canonicalize an Arrow type so dtype drift (e.g. DuckDB widening
    SUM(BIGINT) to HUGEINT/decimal128) fails locally the same way the
    driver's type-sensitive value-hash fails."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_type(t.value_type)}>"
    return str(t)


def _arrow_types(tbl):
    return {f.name: _canon_type(f.type) for f in tbl.schema}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, name):
    sarrow = QUERIES[name](spark, SF_DIR).toArrow()
    darrow = _duck().execute(ORACLES[name]).fetch_arrow_table()
    stypes, dtypes = _arrow_types(sarrow), _arrow_types(darrow)
    assert stypes == dtypes, f"{name}: column dtypes differ {stypes} vs {dtypes}"
    sdf = sarrow.to_pandas()
    ddf = darrow.to_pandas()
    scols, srows = _normalize(sdf)
    dcols, drows = _normalize(ddf)
    assert scols == dcols, f"{name}: column names differ {scols} vs {dcols}"
    assert len(sdf) == len(ddf), f"{name}: row counts differ {len(sdf)} vs {len(ddf)}"
    only_s = list(srows - drows)[:3]
    only_d = list(drows - srows)[:3]
    assert srows == drows, f"{name}: values differ; spark-only={only_s} duck-only={only_d}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_entries_run(spark, name):
    if name == "crawl_fixture_trace":
        pytest.skip("covered bit-exactly by test_crawl_parity.py (slow full engine run)")
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
