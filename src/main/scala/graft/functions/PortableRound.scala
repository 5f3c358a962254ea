package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit, sum}

/** Engine-portable decimal rounding.
  *
  * `round(x, d)` is NOT portable across engines: Spark rounds the shortest
  * decimal rendering of the double HALF_UP (via BigDecimal), while DuckDB
  * rounds the raw binary double — so a value whose true expansion lands on
  * a half boundary (e.g. an average of cent-valued money over a divisor of
  * 2^a·5^b, like 950.59375) rounds differently and fails the driver's
  * hash-compare.
  *
  * `floor(x * 10^d + 0.5) / 10^d` in pure IEEE double arithmetic yields the
  * bit-identical result on every engine given the same input double,
  * shrinking the mismatch window from "any half-boundary value" (common for
  * money math) to "input doubles differing in their last ulp exactly at a
  * boundary" (~1e-9 per value). Used for every floating-point column the
  * DuckDB oracle checks, with the same formula spelled out in the SQL.
  */
object PortableRound {

  def pround(c: Column, d: Int): Column = {
    val s = math.pow(10, d)
    floor(c * lit(s) + lit(0.5)) / lit(s)
  }

  /** The same formula as DuckDB SQL text. */
  def proundSql(e: String, d: Int): String = {
    val s = "1" + ("0" * d)
    s"floor(($e) * $s + 0.5) / $s.0"
  }

  /** Exact fixed-point view of a d-decimal DOUBLE column (e.g. money in
    * cents): `floor(x·10^d + 0.5)` as BIGINT. For data that is exactly
    * d-decimal (all money columns here), this is lossless, and BIGINT sums
    * are EXACT — the aggregate no longer depends on summation order at all,
    * so Spark and DuckDB produce bit-identical results with no rounding
    * epsilon. This is the only watertight way to hash-compare money
    * aggregates across engines (pround still leaves the
    * true-value-on-boundary case, e.g. avg=950.59375, to ulp luck).
    *
    * Scale note: cents sums overflow BIGINT only past ~9e16 dollars; the
    * 100 TB variant swaps BIGINT for DECIMAL(38,0) at the sum, same plan. */
  def asScaled(c: Column, d: Int): Column = {
    val s = math.pow(10, d)
    floor(c * lit(s) + lit(0.5)).cast("long")
  }

  /** The same fixed-point view as DuckDB SQL text. */
  def asScaledSql(e: String, d: Int): String = {
    val s = "1" + ("0" * d)
    s"CAST(floor(($e) * $s + 0.5) AS BIGINT)"
  }

  /** Overflow-proof exact integer sum: accumulate the cents(-product)
    * values in DECIMAL(38,0) — unbounded for any physical data scale —
    * then convert the EXACT sum to double, which is the same conversion
    * DuckDB applies to its HUGEINT sum, so hash parity is unchanged.
    * A raw BIGINT sum of three-factor cents products (price¢·disc·tax
    * ≈ 1e11/row) passes Long.MaxValue near 1e8 rows per group — far below
    * the 100 TB design point — and would fail the job under ANSI or wrap
    * silently without it. */
  def sumExact(c: Column): Column = sum(c.cast("decimal(38,0)")).cast("double")
}
