from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduceece563_spark.session import get_spark
from mapreduceece563_spark.sources.catalog import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("mapreduceece563_spark-tests", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _canon(v):
    """Canonicalize a cell to a sortable string (NULLs from rollup/
    cube group keys must sort against strings without TypeError)."""
    import datetime
    import math

    if v is None:
        return "\x00null"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{round(v, 9)!r}"
    if isinstance(v, datetime.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "l:" + ",".join(str(_canon(x)) for x in v)
    return f"{type(v).__name__[0]}:{v!r}"


def assert_frames_match(spark_df, duck_rel, ctx=""):
    """Mimic the driver's t2 compare: column names (sorted), row count,
    and order-insensitive multiset of values."""
    scols = sorted(spark_df.columns)
    dcols = sorted(c[0] for c in duck_rel.description)
    assert scols == dcols, f"{ctx}: columns differ: spark={scols} duck={dcols}"

    srows = spark_df.collect()
    drows = duck_rel.fetchall()
    assert len(srows) == len(drows), (
        f"{ctx}: row count differs: spark={len(srows)} duck={len(drows)}"
    )

    sidx = [spark_df.columns.index(c) for c in scols]
    didx = [[c[0] for c in duck_rel.description].index(c) for c in dcols]
    sset = sorted(
        tuple(_canon(r[i]) for i in sidx) for r in srows
    )
    dset = sorted(
        tuple(_canon(r[i]) for i in didx) for r in drows
    )
    for i, (a, b) in enumerate(zip(sset, dset)):
        assert a == b, f"{ctx}: first row mismatch at {i}: spark={a} duck={b}"
