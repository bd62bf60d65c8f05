"""Config-file surface mirroring the reference's config.ini
(reference Configuration/config.ini.template: [postgres-db]
host/port/user/password/dbname + [db-table-names] odnstable), extended
with the engine's own paths section.

The reference reads its config at import time as a module side effect
(dataimporter.py:15-19); here it is an explicit, testable function.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass


@dataclass(frozen=True)
class OdnsConfig:
    archive_root: str | None
    sink_path: str | None
    jdbc_url: str | None
    jdbc_properties: dict[str, str]
    table_name: str


def load_config(path: str) -> OdnsConfig:
    """Parse an ini config into engine settings.

    The [postgres-db] section maps onto a Spark JDBC url + properties;
    [db-table-names] odnstable names the sink table (quoted-identifier
    safety handled at SQL composition, sinks.delete_by_protocol_sql).
    """
    cp = configparser.ConfigParser()
    with open(path) as f:
        cp.read_file(f)

    jdbc_url = None
    props: dict[str, str] = {}
    if cp.has_section("postgres-db"):
        db = cp["postgres-db"]
        host = db.get("host", "localhost")
        port = db.get("port", "5432")
        dbname = db.get("dbname", "postgres")
        jdbc_url = f"jdbc:postgresql://{host}:{port}/{dbname}"
        if db.get("user"):
            props["user"] = db["user"]
        if db.get("password"):
            props["password"] = db["password"]
        props["driver"] = "org.postgresql.Driver"

    paths = cp["paths"] if cp.has_section("paths") else {}
    tables = cp["db-table-names"] if cp.has_section("db-table-names") else {}
    return OdnsConfig(
        archive_root=paths.get("archive_root"),
        sink_path=paths.get("sink_path"),
        jdbc_url=jdbc_url,
        jdbc_properties=props,
        table_name=tables.get("odnstable", "odns_entries"),
    )
