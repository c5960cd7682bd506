"""Hash-stable SQL fragment builders shared by Spark queries and oracles.

SURVEY.md §5.4: Spark and DuckDB sum doubles in different orders; at 600k rows
the accumulated drift (~1e-4 absolute on 1e9-magnitude sums) exceeds the
round-to-4 grid, so ROUND alone is NOT enough for large SUMs. Policy:

- ``SUM`` of any double measure: accumulate in DECIMAL(30,8) (exact, identical
  in both engines — fixture measures are ≤6dp-exact so scale 8 has no
  rounding ties), round to 4dp while still decimal, cast to double last.
- ``AVG``/stddev/etc.: magnitudes are small and drift is ~1e-9, ROUND(.,4)
  directly on the double is hash-stable.
- Integer sums: DuckDB promotes SUM(BIGINT) to HUGEINT — always cast back
  to BIGINT in the oracle.

Each builder has a Spark twin in ``catalog``/operator modules; keep them in
lockstep.
"""

from __future__ import annotations


def sql_msum(expr: str) -> str:
    """Exact money-sum: decimal(30,8) accumulate → decimal(38,4) → double.

    Twin of catalog.msum (see its docstring for the tie-analysis); the 4dp
    rounding must happen in decimal, never on a double.
    """
    # NB: DuckDB CAST(decimal AS decimal(lower scale)) TRUNCATES; ROUND(dec, 4)
    # rounds half-away-from-zero, which is what matches Spark's HALF_UP cast.
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(30,8))), 4) AS DOUBLE)"


def sql_r4(expr: str) -> str:
    # + 0.0 canonicalizes IEEE negative zero (DuckDB ROUND keeps the sign
    # of a tiny negative rounded to zero; Spark doesn't) — exact otherwise
    return f"(ROUND(CAST(({expr}) AS DOUBLE), 4) + 0.0)"


def sql_isum(expr: str) -> str:
    """Integer sum pinned to BIGINT (DuckDB would return HUGEINT)."""
    return f"CAST(SUM({expr}) AS BIGINT)"
