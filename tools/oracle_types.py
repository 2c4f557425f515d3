"""Result-TYPE parity between oracle SQL and the driver's hash.

The round-7 lesson (18 red driver rows, every value bit-exact): the
driver hashes TYPED results, and DuckDB silently widens ``sum(BIGINT)``
— including window sums — to HUGEINT (int128). An int128 oracle column
can never hash-equal Spark's int64, no matter the value, so every
oracle must CAST its outermost aggregates back to BIGINT. This module
is the guard that makes shipping an un-cast aggregate impossible:
``tools/check_oracle.py`` fails the gate and
``tests/test_entry_contract.py`` fails pytest on any oracle whose bound
result types include a non-hashable width.

Binding is lazy (``con.sql(q).types``) — no execution needed, so the
guard costs milliseconds per oracle.
"""

from __future__ import annotations

# DuckDB types the driver's typed hash can never reconcile with a Spark
# column. DECIMAL is banned too unless the Spark twin column is itself
# DecimalType (none today — add to ALLOW_DECIMAL if a gate legitimately
# compares decimal-to-decimal).
BANNED_PREFIXES = ("HUGEINT", "UHUGEINT")
ALLOW_DECIMAL: set[str] = set()


def bind_types(con, sql: str) -> list[tuple[str, str]]:
    """Bind (no execution) and return [(column, duckdb_type_str), ...]."""
    rel = con.sql(sql)
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)]


def type_problems(
    con,
    sql: str,
    gate_name: str = "",
    spark_decimal_cols: set[str] | None = None,
) -> list[str]:
    """Return human-readable violations for one oracle's result types.

    ``spark_decimal_cols``: columns that are DecimalType on the Spark
    side (a DECIMAL oracle twin is fine for those).
    """
    spark_decimal_cols = spark_decimal_cols or set()
    problems = []
    for col, typ in bind_types(con, sql):
        up = typ.upper()
        if up.startswith(BANNED_PREFIXES):
            problems.append(
                f"{col}: {typ} (un-cast aggregate? wrap the OUTERMOST "
                f"sum with CAST(... AS BIGINT))"
            )
        elif up.startswith("DECIMAL") and col not in spark_decimal_cols:
            if gate_name not in ALLOW_DECIMAL:
                problems.append(
                    f"{col}: {typ} but the Spark twin is not decimal "
                    f"(CAST to DOUBLE or BIGINT)"
                )
    return problems
