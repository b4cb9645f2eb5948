"""Cross-engine deterministic rounding.

Spark's ``round`` goes through BigDecimal (shortest-decimal HALF_UP);
DuckDB rounds the raw double. When a value's shortest decimal
representation is a tie at the rounding digit but its binary value sits
just below (e.g. 0.67285 → double 0.6728499999…), the engines disagree
(observed live: 0.6729 vs 0.6728). Since the oracle gate hashes values,
every rounded output column goes through ``round_half_up`` instead —
``floor(x·10ᵈ + 0.5)/10ᵈ`` — whose tie behavior is pure IEEE double
arithmetic and therefore bit-identical in any engine that mirrors the
same expression (the workload rewrites oracle-SQL ``round(...)`` calls
to the same floor form at registration).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, digits: int) -> Column:
    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)) / scale


def sql_floor_round(expr: str, digits: int) -> str:
    """The DuckDB-side mirror of round_half_up."""
    scale = float(10**digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def rewrite_sql_rounds(sql: str) -> str:
    """Rewrite every ``round(expr, n)`` in an oracle SQL string to the
    floor form (paren-aware; leaves other functions untouched)."""
    out = []
    i = 0
    lower = sql.lower()
    while True:
        j = lower.find("round(", i)
        if j == -1:
            out.append(sql[i:])
            break
        # make sure it's the function name, not e.g. "around("
        if j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            out.append(sql[i : j + 6])
            i = j + 6
            continue
        out.append(sql[i:j])
        # find the matching close paren and the top-level comma
        depth = 0
        k = j + 5  # position of '('
        comma = None
        end = None
        for p in range(k, len(sql)):
            c = sql[p]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    end = p
                    break
            elif c == "," and depth == 1:
                comma = p
        if end is None or comma is None:
            # malformed / single-arg round — leave as-is
            out.append(sql[j:end + 1 if end else len(sql)])
            i = end + 1 if end else len(sql)
            continue
        inner = sql[k + 1 : comma]
        digits_text = sql[comma + 1 : end].strip()
        try:
            digits = int(digits_text)
        except ValueError:
            # non-literal digits arg (column, expression) — engines must
            # agree on native round there; leave the call untouched but
            # still rewrite any round() nested inside it
            out.append("round(" + rewrite_sql_rounds(inner) + "," + sql[comma + 1 : end] + ")")
            i = end + 1
            continue
        out.append(sql_floor_round(rewrite_sql_rounds(inner), digits))
        i = end + 1
    return "".join(out)
