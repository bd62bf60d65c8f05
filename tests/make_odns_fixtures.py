#!/usr/bin/env python
"""Deterministic ODNS scan-CSV fixtures (FIXTURES.md §A).

Writes byte-stable .csv.gz files under tests/fixtures/odns/2026/{tcp,udp}/
covering every typing edge case from FIXTURES.md §A.3. Run once; outputs
are committed. (gzip mtime pinned to 0 for reproducibility.)
"""

from __future__ import annotations

import gzip
import os

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "odns")

TCP_HEADER = (
    "ip_request;ip_response;a_record;timestamp_request;timestamp_response;response_type;"
    "country_request;asn_request;prefix_request;org_request;"
    "country_response;asn_response;prefix_response;org_response;"
    "country_arecord;asn_arecord;prefix_arecord;org_arecord"
)
UDP_HEADER = TCP_HEADER.replace("timestamp_response;", "")

TCP_ROWS = [
    # 1. fully populated valid row
    "203.0.113.7;198.51.100.2;192.0.2.9;2026-01-15 01:02:03.456789;2026-01-15 01:02:03.500000;"
    "transparent;DE;3320.0;203.0.113.0/24;Example Org;US;15169.0;198.51.100.0/24;Resp Org;"
    "FR;202425.0;192.0.2.0/24;ARec Org",
    # 2. timestamp without fractional seconds -> NULL (strict %f)
    "203.0.113.8;198.51.100.3;192.0.2.10;2026-01-15 01:02:03;2026-01-15 01:02:04.1;"
    "forwarder;DE;3320.0;203.0.113.0/24;Example Org;US;15169.0;198.51.100.0/24;Resp Org;"
    "FR;202425.0;192.0.2.0/24;ARec Org",
    # 3. garbage timestamp -> NULL
    "203.0.113.9;198.51.100.4;192.0.2.11;not-a-date;2026-01-15 01:02:05.250000;"
    "recursive;GB;AS3320;203.0.113.0/24;Example Org;US;15169.5;198.51.100.0/24;Resp Org;"
    "FR;202425.0;192.0.2.0/24;ARec Org",
    # 5. empty-string fields -> NULL
    ";;192.0.2.12;2026-01-15 02:00:00.000001;;;;;;;US;;198.51.100.0/24;;FR;202425.0;;",
    # 6. short row (missing trailing fields) -> NULLs
    "203.0.113.11;198.51.100.6;192.0.2.13;2026-01-15 03:00:00.123456",
]

UDP_ROWS = [
    "203.0.113.20;198.51.100.8;192.0.2.20;2026-01-16 10:00:00.000001;transparent;"
    "NL;1103.0;203.0.113.0/24;Example Org;US;15169.0;198.51.100.0/24;Resp Org;"
    "JP;2497.0;192.0.2.0/24;ARec Org",
    "203.0.113.21;;192.0.2.21;2026-01-16 11:30:30;forwarder;"
    ";not-a-number;;;US;15169.0;;Resp Org;;;;",
]


def write_gz(path: str, header: str, rows: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = ("\n".join([header] + rows) + "\n").encode()
    with open(path, "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(data)


def main() -> None:
    write_gz(os.path.join(ROOT, "2026", "tcp", "tcp_dns_scan_2026-01-15.csv.gz"), TCP_HEADER, TCP_ROWS)
    write_gz(os.path.join(ROOT, "2026", "udp", "udp_dns_scan_2026-01-16.csv.gz"), UDP_HEADER, UDP_ROWS)
    # 9. a file with no date in its basename (scan_date -> NULL)
    write_gz(os.path.join(ROOT, "nodate", "tcp_dns_scan_undated.csv.gz"), TCP_HEADER, TCP_ROWS[:1])
    print("fixtures written under", ROOT)


if __name__ == "__main__":
    main()
