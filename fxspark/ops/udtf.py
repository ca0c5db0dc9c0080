"""Python UDTF surface (Spark 4's table-valued functions).

One worked example — n-gram expansion — registered both as a DataFrame-side
class and for SQL (``SELECT ... FROM ngrams_udtf(...)``). The engine's rule
(SCALE.md §1) stands: UDTFs are row-at-a-time Python, the SLOW path; every
production operator here uses built-in expressions (``ops.text.ngrams`` is
the codegen'd twin this UDTF is unit-tested against). The UDTF surface
exists for logic that genuinely can't be expressed as expressions —
external-library row expanders, complex per-row state machines.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, gram string")
class NgramUDTF:
    """Emit (position, token n-gram) rows for one text value; n defaults
    to 3. Mirrors ``ops.text.ngrams`` (lowercase, single-space split,
    multiplicity kept)."""

    def eval(self, text: str, n: int = 3):  # noqa: D102
        if text is None:
            return
        toks = text.strip().lower().split(" ")
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


def register(spark) -> None:
    """Expose the UDTF to SQL as ``ngrams_udtf``."""
    spark.udtf.register("ngrams_udtf", NgramUDTF)
