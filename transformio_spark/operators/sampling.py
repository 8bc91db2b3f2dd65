"""Deterministic stratified sampling for corpus curation (round 5).

Per-stratum downsampling (e.g. rebalance languages or sources before
training) with a HASH-derived keep decision instead of RNG state:
document ``id`` -> first 8 hex digits of ``md5(id)`` -> uniform
integer u in [0, 16^8) -> keep iff u < floor(rate * 16^8) for the
row's stratum.  Properties that matter at 10^12 rows:

- deterministic and repartition-invariant (no RNG seeds per task, no
  sensitivity to partition count or visit order — Spark's
  ``DataFrame.sample`` is neither);
- a pure narrow Column pipeline: no shuffle, no UDF, whole-stage
  codegen;
- exactly replayable in SQL — the DuckDB oracle computes the same
  md5-digit arithmetic (shared dialect-portable fragments, same
  pattern as ``dedup.simhash_md5_exprs``), so the driver hash-checks
  the sampled set itself, not just its size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEX_DIGITS = "0123456789abcdef"
SAMPLE_DENOM = 16 ** 8


def sample_uniform_sql(id_expr: str) -> str:
    """Dialect-portable SQL for the uniform int u in [0, 16^8) from
    the first 8 hex digits of md5(id) — parses identically in Spark
    SQL and DuckDB (both md5() on a string yield lowercase hex)."""
    digits = [
        f"(instr('{_HEX_DIGITS}', substring(md5(cast({id_expr} as string)), "
        f"{j + 1}, 1)) - 1)"
        for j in range(8)
    ]
    terms = [
        f"cast({d} as bigint) * {16 ** (7 - j)}"
        for j, d in enumerate(digits)
    ]
    return "(" + " + ".join(terms) + ")"


def threshold(rate: float) -> int:
    """Keep-threshold for a sampling rate (floor keeps the decision
    exactly integral in both engines)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * SAMPLE_DENOM)


def sample_col(id_col: str, stratum_col: str, rates: dict[str, float]) -> Column:
    """Boolean keep column: stratum-dependent threshold over the
    md5-uniform.  Strata absent from ``rates`` are dropped (rate 0)."""
    u = F.expr(sample_uniform_sql(id_col))
    thr = F.lit(0).cast("long")
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(threshold(rate)).cast("long")
        ).otherwise(thr)
    return u < thr


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> DataFrame:
    """Filter ``docs`` to the deterministic per-stratum sample."""
    return docs.where(sample_col(id_col, stratum_col, rates))


def threshold_case_sql(stratum_col: str, rates: dict[str, float]) -> str:
    """The oracle-side CASE expression matching sample_col's
    when-chain (same sorted stratum order, same integer thresholds)."""
    arms = "".join(
        f" WHEN {stratum_col} = '{s}' THEN {threshold(r)}"
        for s, r in sorted(rates.items())
    )
    return f"(CASE{arms} ELSE 0 END)"
