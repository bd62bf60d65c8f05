"""Query modules — importing this package registers every operator."""

from odns_dataimporter_spark.queries import (  # noqa: F401
    aggregates,
    joins,
    setops,
    windows,
)
