package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism conventions for oracle-checked queries (FIXTURES.md §3).
  *
  * The driver hash-compares Spark results against DuckDB running the same
  * SQL, so every float that is the result of *aggregated* arithmetic must be
  * bit-identical across engines. Summing IEEE doubles is order-dependent —
  * Spark's partial/final aggregation and DuckDB's vectorized aggregation
  * accumulate in different orders, so `sum(double)` can differ in the last
  * ulps and a `round(,6)` is NOT enough at 1e9-magnitude sums. The fix is
  * architectural: monetary/quantity columns carry exactly 2 decimal digits,
  * so we sum them as DECIMAL (exact, order-independent), then cast the exact
  * result to DOUBLE (deterministic nearest-even) and round. Both engines then
  * produce the identical bit pattern.
  *
  * This also matches the 100 TB posture: decimal sums stay exact regardless
  * of row count, while a double sum silently loses precision as n grows.
  */
object Determinism {

  /** Two-decimal money/quantity column as exact decimal.
    *
    * PRECONDITION (load-bearing): the input doubles carry EXACTLY two decimal
    * digits (true of every money/quantity column in the corpus; verified at
    * sf0.001/0.01/0.1). Under that precondition the cast is lossless and the
    * rounding-mode difference between engines (Spark HALF_UP vs DuckDB
    * half-to-even on double→decimal) never fires, because nothing is
    * rounded. Do NOT apply dec2 to columns with >2 fractional digits —
    * round explicitly with a pinned mode on both sides first.
    */
  def dec2(c: Column, precision: Int = 18): Column =
    c.cast(DecimalType(precision, 2))

  /** Exact decimal aggregate → double, rounded to 6dp (oracle convention). */
  def f6(c: Column): Column = round(c.cast("double"), 6)

  /** Deterministic average: exact decimal sum / count, both engines compute
    * the same IEEE division, rounded to 6dp.
    */
  def avg6(x: Column, n: Column): Column = round(x.cast("double") / n, 6)
}
