"""Property tests (SURVEY §5.2 item 2): the typed projection must be
total — ANY input string parses or becomes NULL, never throws — matching
the reference's bare-except typers (fieldtypers.py:13-23), and the
strict/permissive semantics must agree with Python's own strptime/float.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from odns_dataimporter_spark.odns.ingest import typed_projection

_TS_STRATEGY = st.one_of(
    st.text(max_size=30),
    st.from_regex(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d{1,6})?", fullmatch=True),
)
_ASN_STRATEGY = st.one_of(
    st.text(max_size=15),
    st.floats(allow_nan=False, allow_infinity=False).map(str),
    st.integers().map(str),
)


def _python_ts(val: str) -> dt.datetime | None:
    try:
        return dt.datetime.strptime(val, "%Y-%m-%d %H:%M:%S.%f")
    except Exception:
        return None


def _python_float(val: str) -> float | None:
    try:
        return float(val)
    except Exception:
        return None


@settings(
    max_examples=30, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck)
)
@given(ts=_TS_STRATEGY, asn=_ASN_STRATEGY)
def test_typers_total_and_python_equivalent(spark, ts, asn):
    from odns_dataimporter_spark.odns.schema import raw_csv_schema

    schema = raw_csv_schema("udp")
    row = {f.name: None for f in schema.fields}
    df = spark.createDataFrame(
        [{**row, "timestamp_request": ts, "asn_request": asn}], schema=schema
    )
    out = typed_projection(df, "udp", "2026-01-01").collect()[0]

    assert out.timestamp_request == _python_ts(ts)

    want_asn = _python_float(asn)
    if want_asn is None:
        assert out.asn_request is None
    elif want_asn != want_asn:  # NaN
        assert out.asn_request != out.asn_request
    else:
        assert out.asn_request == want_asn
