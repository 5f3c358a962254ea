package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated analytics tables (TESTDATA.md).
  *
  * Each table is one parquet file under `$dir/`. Reads go through
  * `spark.read.parquet` so Catalyst gets vectorized scans, predicate
  * pushdown and column pruning for free — at 100 TB these tables would be
  * partitioned directories instead of single files and the same code holds.
  */
object Tables {
  /** Session config required to read the `events` table: its `ts` column is
    * parquet INT64 TIMESTAMP(NANOS), which Spark rejects natively
    * ([PARQUET_TYPE_ILLEGAL]). With this flag it reads as LongType
    * nanoseconds and [[events]] converts to a microsecond timestamp —
    * the same truncation DuckDB applies when casting TIMESTAMP_NS. */
  val NanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** Nanos-long → TimestampType truncated to micros via exact integer
    * division — THE conversion for the events `ts` column; shared by the
    * batch loader below and the streaming file source
    * ([[graft.streaming.EventStreams.hourlyFromDirectory]]) so the rule
    * cannot drift between the two. */
  def nanosToTs(colName: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    // integer DIV, not `/`: Column./ is DOUBLE division, and a double
    // cannot hold epoch nanos (~1.7e18) without precision loss
    expr(s"timestamp_micros($colName DIV 1000L)")
  }

  /** `ts` arrives as raw nanos (see [[NanosAsLong]]); exposed as a proper
    * TimestampType column (see [[nanosToTs]]). */
  def events(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").withColumn("ts", nanosToTs("ts"))
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
