"""Percentage-change / report-formatting expressions (SURVEY.md §2.3 Q13-Q16).

The reference computes ``ROUND(((cur - prev) / prev) * 100, 2)`` and formats it
as ``CONCAT(..., '%')`` with a ``CASE WHEN prev IS NULL THEN 'No Previous
Rate'`` fallback (``/root/reference/Fx_1min.py:204-213``,
``update_exchange_rates.py:202-211``).

Pure column expressions — they stay inside whole-stage codegen; zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NO_PREVIOUS = "No Previous Rate"


def pct_change(cur: Column, prev: Column, scale: int = 2) -> Column:
    """``round(100 * (cur - prev) / prev, scale)`` (``Fx_1min.py:208``).

    A zero base yields NULL (``try_divide``) — MySQL's division-by-zero
    semantics, which the reference implicitly relies on; under Spark's ANSI
    mode a plain ``/`` would instead raise.
    """
    return F.round(F.try_divide(cur - prev, prev) * 100, scale)


def pct_change_label(cur: Column, prev: Column, scale: int = 2) -> Column:
    """Formatted ``'<pct>%'`` with the v1 NULL fallback (``Fx_1min.py:204-213``).

    Uses ``format_string`` so both engines print a fixed number of decimals
    (``0.20%`` not ``0.2%`` — golden output PDF p.5).

    A NULL ``cur`` (no defined change; unreachable in the reference, whose
    rate column is NOT NULL by schema — ``Fx_1min.py:34``) yields NULL, the
    SQL ``printf(...) || '%'`` propagation. Spelled explicitly because
    Spark's ``format_string`` Java-formats a NULL argument as the STRING
    ``"null"`` (here precision-truncated to ``"nu"``) instead of
    propagating — found by the round-16 independent-null fixture sweep."""
    return (
        F.when(prev.isNull(), F.lit(NO_PREVIOUS))
        .when(cur.isNull(), F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.format_string(f"%.{scale}f", pct_change(cur, prev, scale)),
                F.lit("%"),
            )
        )
    )
