"""Round-start canary for the driver testdata's timestamp encoding.

The parquet encoding of event-time columns has CHANGED once already
(round 3: TIMESTAMP(NANOS) -> timestamp[us] without isAdjustedToUTC,
which Spark 4 infers as TIMESTAMP_NTZ), silently breaking 20 tests at
session start. `sources/batch.py:load_table` handles the three known
forms (int64 NANOS via nanosAsLong, us-NTZ via inferTimestampNTZ=false,
us-UTC); this canary fails LOUDLY — naming the offending field — the
round a fourth encoding appears, instead of letting value-level parity
failures surface it one query at a time.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_ORACLE, SF_SMOKE

#: event-time columns and the encodings load_table provably handles
TS_COLS = {
    "events": "ts",
    "orders": "o_orderdate",
    "lineitem": "l_shipdate",
}

KNOWN = (
    pa.timestamp("ns"),          # r1/r2: read via nanosAsLong + div 1000
    pa.timestamp("us"),          # r3+: NTZ-form, inferTimestampNTZ=false
    pa.timestamp("us", tz="UTC"),  # UTC-us form
    pa.int64(),                  # NANOS surfaced as raw int64
)


def test_testdata_timestamp_encoding_is_a_known_form():
    for sf in (SF_SMOKE, SF_ORACLE):
        for table, col in TS_COLS.items():
            path = os.path.join(sf, f"{table}.parquet")
            field = pq.read_schema(path).field(col)
            assert field.type in KNOWN, (
                f"NEW testdata timestamp encoding for {table}.{col} at {sf}: "
                f"{field.type!r} — extend sources/batch.py:load_table (and "
                f"the DuckDB oracle expectations) before trusting any parity "
                f"result this round; see SURVEY.md §8 (r3 NTZ incident)."
            )
