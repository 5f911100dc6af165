"""Oracle-determinism helpers.

The driver hash-compares Spark output vs DuckDB output value-by-value
(order-insensitive, columns sorted by name). Floating-point SUM/AVG are
order-dependent in the last bits, and Spark/DuckDB aggregate in different
orders — so any plain ``SUM(double)`` is a coin-flip at hash time.

Fix: aggregate in *decimal* space. Casting each double to DECIMAL(38,6) is a
deterministic per-row rounding that both engines perform identically (the
input doubles are bit-identical in both, and .5-ulp ties at the 6th decimal
are measure-zero), and decimal addition is exact and associative — so the
final sum is bit-identical regardless of partial-aggregation order. Cast the
result back to DOUBLE for a plain schema. This is also the right call at
100 TB: it makes results reproducible across cluster sizes and AQE re-plans,
not just across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent SUM over a double column (exact decimal space)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum / count, evaluated in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") /
            F.count(c)).cast("double")


def oracle_dsum(expr: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def oracle_davg(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return (f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"
            f" / COUNT({expr}) AS DOUBLE)")
