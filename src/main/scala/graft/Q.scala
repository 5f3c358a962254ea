package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator/query exposed through [[SparkEntry]].
  *
  * @param name    stable query id (key in `SparkEntry.queries`)
  * @param run     (session, sfDir) => result DataFrame. Results must be
  *                deterministic: explicit ORDER BY with full tiebreaks, and
  *                floating-point aggregates rounded so Spark-vs-DuckDB
  *                summation-order differences can't flip a digit.
  * @param oracle  equivalent DuckDB SQL over the same parquet tables
  *                (column names MUST match `run`'s output exactly); None for
  *                ops whose semantics aren't SQL-expressible (hash-dependent
  *                sketches) — those get the driver's rows-only check plus a
  *                ScalaTest spec with planted ground truth.
  * @param headline whether Bench includes it in the per-round timing run
  *                 (quadratic verification demos are excluded; their scale
  *                 path twin is benchmarked instead).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = true)
