"""events.ts has shipped in two parquet vintages across test-data
generations:

- TIMESTAMP(NANOS), which Spark's vectorized reader rejects — the
  catalog reads it as raw int64 nanos (legacy conf) and converts with
  integer division;
- timestamp[us] without a timezone, which Spark 4 infers as
  TIMESTAMP_NTZ — the catalog reinterprets the naive wall time as a
  UTC instant (the session pins spark.sql.session.timeZone=UTC).

The real testdata only ever exhibits ONE vintage at a time, so this
fixture test is what keeps the other path from rotting: both vintages
must normalize to a plain session-tz TIMESTAMP carrying identical
epoch-microsecond instants.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mapreduceece563_spark.sources.catalog import load_table

# 2024-01-01T00:00Z .. +4h, hourly — plus a non-round instant with
# microsecond precision to catch any truncation asymmetry.
MICROS = [1_704_067_200_000_000 + i * 3_600_000_000 for i in range(5)] + [
    1_704_067_200_000_000 + 123_456_789
]


def _write_events(dirpath: str, unit: str) -> None:
    scale = 1000 if unit == "ns" else 1
    ts = pa.array([m * scale for m in MICROS], type=pa.int64()).cast(
        pa.timestamp(unit)
    )
    n = len(MICROS)
    table = pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([1] * n, type=pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(table, f"{dirpath}/events.parquet")


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_events_vintage_normalizes_to_timestamp(unit, spark, tmp_path):
    d = tmp_path / unit
    d.mkdir()
    _write_events(str(d), unit)
    df = load_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [
        r[0]
        for r in df.select(F.unix_micros("ts"))
        .orderBy("event_id")
        .collect()
    ]
    assert got == MICROS
