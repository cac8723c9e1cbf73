"""Cross-engine stable rounding.

Spark's ROUND goes through BigDecimal(Double.toString(x)) with HALF_UP;
DuckDB's ROUND multiplies in double space -- they disagree on exact
decimal ties (x.xxx5), which 2-decimal money data produces constantly
(avg over 10 rows => 3-decimal values => exact ties at 4 decimals).

``stable_round`` instead computes FLOOR(x * 10^d + 0.5 + DELTA) / 10^d,
which is pure IEEE double arithmetic -- bit-identical in any engine fed
the same x. DELTA shifts the decision boundary off the data's decimal
grid so exact ties can't straddle it, and it dwarfs cross-engine
aggregate summation-order noise (~1e-6 relative) while staying far below
the rounding grid (0.5). Used by every registered query on BOTH the
Spark side and the DuckDB oracle side (sql_round emits the same formula
inline so oracle SQL stays self-contained).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Off-grid bias: far above float noise, far below half the rounding grid,
# and not a multiple of any power of ten so decimal data can't land on
# the shifted boundary.
DELTA = 0.00432


def stable_round(col: Column | str, digits: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    s = 10**digits
    return F.floor(c * s + (0.5 + DELTA)) / F.lit(s)


def sql_round(expr: str, digits: int = 4) -> str:
    s = 10**digits
    return f"FLOOR(({expr}) * {s} + {0.5 + DELTA}) / {s}"
