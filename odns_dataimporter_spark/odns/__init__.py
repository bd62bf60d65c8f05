"""ODNS reference-parity surface: scan-CSV ingest, file selection,
typed projection, snapshot-replace sinks (SURVEY §2.1-§2.2 REF rows)."""
