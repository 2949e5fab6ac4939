"""Oracle connection-type detection and catalog capability probing.

Reference: /root/reference/oracle_to_exasol.sql:58-116 (OCI vs JDBC: read
the connection registry's connection string — prefix 'JDBC' ⇒ JDBC,
anything else ⇒ native OCI; registry inaccessible ⇒ detect by trying a
trivial import over each transport) and :266-290 (capability probe:
ALL_TAB_COLUMNS only has an IDENTITY_COLUMN column on Oracle ≥ 12c, so the
catalog select-list is generated with either the real column or a NULL
placeholder).

Pure decision logic — callers inject the registry lookup / probe / query
runners, so everything is unit-testable without a database. In Spark terms
"ORA" maps to a thick-driver JDBC URL (jdbc:oracle:oci:@...) and "JDBC" to
the thin driver (jdbc:oracle:thin:@...); the decision tree is transport
selection either way.
"""

from __future__ import annotations

from typing import Callable

IDENTITY_PROBE_SQL = (
    "SELECT column_name FROM all_tab_columns "
    "WHERE table_name = 'ALL_TAB_COLUMNS' AND column_name = 'IDENTITY_COLUMN'"
)


def detect_connection_type(
    connection_string: str | None,
    probe: Callable[[str], bool] | None = None,
) -> str:
    """'JDBC' | 'ORA' (oracle_to_exasol.sql:83-116).

    ``connection_string``: the registry's string for the connection, or
    None when the registry is inaccessible (the reference's unprivileged-
    user path) — then ``probe(transport)`` is tried for 'ORA' first, 'JDBC'
    second, mirroring get_connection_type_by_testing (:58-80).
    """
    if connection_string is not None:
        if connection_string.strip().upper().startswith("JDBC"):
            return "JDBC"
        return "ORA"
    if probe is not None:
        for transport in ("ORA", "JDBC"):
            if probe(transport):
                return transport
    raise ValueError(
        "connection fits neither a JDBC nor an OCI pattern; "
        "verify it is a valid OCI/JDBC connection"  # :112-114 wording
    )


def has_identity_column(run_query: Callable[[str], list]) -> bool:
    """Oracle ≥ 12c exposes IDENTITY_COLUMN in ALL_TAB_COLUMNS (:266-283);
    ``run_query`` returns the probe's rows (empty ⇒ pre-12c)."""
    return len(run_query(IDENTITY_PROBE_SQL)) > 0


def identity_select_expr(has_identity: bool) -> str:
    """The select-list fragment for the catalog scan (:285-290): the real
    column on ≥ 12c, a NULL placeholder before."""
    return "c.identity_column" if has_identity else "NULL AS identity_column"
