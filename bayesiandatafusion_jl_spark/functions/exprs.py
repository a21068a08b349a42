"""Cross-engine-deterministic expression helpers.

Floating-point aggregation order differs between Spark (partial aggs per
partition, merge order nondeterministic) and any oracle engine, so raw
``sum(double)`` can differ in the last bits — and at 100 TB the partial-agg
tree is thousands deep, making this worse, not better. The fix used across
the engine:

- **Exact sums:** cast each operand to ``decimal(38,6)`` (deterministic
  per-value rounding), sum in decimal (exact, order-independent — this is
  also the *scale-correct* choice: decimal sums never lose precision no
  matter how many partials merge), cast the final result back to double.
- **Means:** exact decimal sum divided by the count in double — one IEEE
  division of identical operands in both engines.
- **Dot products / per-row folds:** sequential left-to-right fold in double
  in both engines, plus a matched ``round(x, N)`` belt-and-braces.

These helpers keep everything JVM-side (built-in functions only, inside
whole-stage codegen) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# decimal(38,6): 32 integer digits — enough for sums over ~10^15 rows of
# ~10^6-magnitude values, i.e. comfortably beyond 100 TB scale.
DEC = "decimal(38,6)"
DEC_HI = "decimal(38,12)"  # for small-magnitude values (embeddings, rates)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, scale: str = DEC) -> Column:
    """Order-independent exact sum, returned as double."""
    return F.sum(_c(col).cast(scale)).cast("double")


def dmean(col: Column | str, scale: str = DEC) -> Column:
    """Deterministic mean: exact decimal sum / count, divided in double."""
    c = _c(col)
    return F.sum(c.cast(scale)).cast("double") / F.count(c)


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<float/double> columns.

    The prediction kernel u_i·v_j of the factor model [paper:BPMF]. Pure
    built-in functions (``zip_with`` + ``aggregate``): a sequential
    left-to-right fold in double, which whole-stage codegen compiles to a
    tight JVM loop — no Python involved.
    """
    a, b = _c(a), _c(b)
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two vectors (dot / (||a|| ||b||))."""
    a, b = _c(a), _c(b)
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def r4(col: Column) -> Column:
    """Matched rounding for cross-engine float parity (SURVEY §7)."""
    return F.round(col, 4)


def int_in_list(col_name: str, values) -> Column:
    """``col IN (...)`` over driver-side INTEGER ids as ONE parsed
    expression. ``F.col(...).isin(vals)`` builds a literal expression
    per value through py4j — measured 5.7 s to construct (plus slower
    plan serialization) for an 8.6k-id shortlist, vs ~10 ms for a single
    ``F.expr`` parse of the same predicate. Same Catalyst ``In`` node,
    so parquet pushdown is identical. Empty list → false (matches
    ``isin([])``)."""
    vals = [int(v) for v in values]
    if not vals:
        return F.lit(False)
    return F.expr(
        f"`{col_name}` IN (" + ",".join(f"{v}L" for v in vals) + ")"
    )


# --- DuckDB-side equivalents (string templates for oracle SQL) -----------

def sql_dsum(expr: str, scale: str = DEC) -> str:
    return f"CAST(SUM(CAST(({expr}) AS {scale})) AS DOUBLE)"


def sql_dmean(expr: str, scale: str = DEC) -> str:
    return f"CAST(SUM(CAST(({expr}) AS {scale})) AS DOUBLE) / COUNT({expr})"


def sql_dot(a: str, b: str) -> str:
    """DuckDB dot product with double accumulation (matches the Spark fold).

    ``list_dot_product`` on float lists accumulates in float32 and will not
    hash-match Spark's double fold (SURVEY §7, verified) — cast to DOUBLE[]
    first so DuckDB also folds in double.
    """
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def ordered_pairs(list_col: str, a_name: str, b_name: str) -> str:
    """SQL expr: every ordered pair (earlier element, later element) from a
    SORTED array column, generated in-task — the posting-list pattern that
    turns a self-join-for-pairs (two shuffle sides + a join) into a single
    groupBy + flat expansion. Sole remaining caller: ``q_graph_components``
    (order's part set → co-occurrence edges), where the list width is
    bounded by order size, so materializing the full pair array per row is
    safe. For UNBOUNDED bucket widths use the two-level explode instead
    (``lsh_candidate_pairs`` / ``q_llm_simhash``): flatten(transform(...))
    holds the whole B(B-1)/2 pair array in one task before exploding. The
    caller must sort the array first so pair orientation (a < b) is by
    value, not arrival order."""
    return (
        f"flatten(transform({list_col}, (a, i) ->"
        f" transform(slice({list_col}, i + 2, size({list_col})),"
        f" b -> struct(a AS {a_name}, b AS {b_name}))))"
    )
