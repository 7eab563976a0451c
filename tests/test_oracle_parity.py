"""Driver-gate mirror: every queries() entry with an oracle must match
DuckDB at sf0.01 (the scale the driver uses)."""

import pytest

import __spark_entry__ as entry_mod
from geotools_spark.testkit.oracle import compare

SF_DIR = "/root/testdata/sf0.01"


def _cases():
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    return sorted(set(qs) & set(sqls))


@pytest.mark.parametrize("name", _cases())
def test_query_matches_oracle(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    compare(df, entry_mod.oracle_sql()[name], SF_DIR)


def test_all_queries_have_oracle_or_are_documented():
    qs = set(entry_mod.queries())
    sqls = set(entry_mod.oracle_sql())
    assert sqls <= qs, f"oracle without query: {sqls - qs}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0
