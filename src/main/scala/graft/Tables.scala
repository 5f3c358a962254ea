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
  /** Session config required to read OLDER generations of the `events`
    * table, whose `ts` column was parquet INT64 TIMESTAMP(NANOS) — a type
    * Spark rejects natively ([PARQUET_TYPE_ILLEGAL]). With this flag that
    * generation reads as LongType nanoseconds and [[normalizeTs]] converts
    * to a microsecond timestamp. Current testdata writes TIMESTAMP(MICROS)
    * directly (the flag is then a no-op), but sessions keep setting it so
    * either generation of the files loads. */
  val NanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"

  /** Inputs smaller than this are spread across the session's cores
    * after the scan (see [[t]]); larger inputs rely on parquet split
    * planning. 64 MB is far below any production table and ~6× the
    * largest bench-scale file, so the rule is a pure local-scale fix. */
  private val SmallInputBytes = 64L * 1024 * 1024

  private def pathBytes(f: java.io.File): Long =
    if (f.isDirectory) Option(f.listFiles()).map(_.map(pathBytes).sum).getOrElse(0L)
    else f.length()

  /** Scan-parallelism floor, derived from INPUT SIZE (optimization guide
    * §2/§6): a single small parquet file has one row group, so Spark
    * plans its whole scan — and every pre-shuffle operator chained onto
    * it (tokenize, shingle explode, per-row hashing) — as ONE task,
    * leaving the other cores idle exactly where these pipelines spend
    * their per-row compute. A table whose total bytes cannot produce
    * enough splits is round-robin repartitioned to the session's
    * default parallelism (deterministic: sort-before-repartition is on,
    * SPARK-23207); the added exchange moves ≤ [[SmallInputBytes]] once.
    * At 100 TB the condition is simply false and the loader is a plain
    * scan — the knob derives from data size, not from a hard-coded
    * cluster shape. Sub-256 KB dimension tables are left alone: they
    * broadcast anyway, and repartitioning them before a broadcast would
    * add an exchange for nothing. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val bytes = pathBytes(new java.io.File(s"$dir/$name.parquet"))
    val par = spark.sparkContext.defaultParallelism
    if (bytes > 256L * 1024 && bytes < SmallInputBytes && par > 1) df.repartition(par)
    else df
  }

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** Normalize the events `ts` column to session-TZ TimestampType at
    * microsecond precision, ADAPTIVE to the generation of the parquet —
    * THE conversion for event time, shared by the batch loader below and
    * the streaming file source
    * ([[graft.streaming.EventStreams.hourlyFromDirectory]]) so the rule
    * cannot drift between the two. Generations seen from the driver:
    *
    *   - INT64 TIMESTAMP(NANOS): reads as LongType under [[NanosAsLong]];
    *     converted by exact integer DIV (not `/`: Column./ is DOUBLE
    *     division, and a double cannot hold epoch nanos ~1.7e18 without
    *     precision loss) — the same ns→µs truncation DuckDB applies.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as
    *     TimestampNTZType; cast to TimestampType is a pure re-tag under
    *     the UTC session timezone every entry point pins.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000L)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other =>
        throw new IllegalArgumentException(s"unsupported events.ts type: $other")
    }
  }

  /** Events with `ts` exposed as a proper TimestampType column (see
    * [[normalizeTs]] for the per-generation rules). */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(t(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
