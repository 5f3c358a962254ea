package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once persisted index tables (the "nightly index job" half of an
  * incremental pipeline). Tables are managed, bucketed and sorted by their
  * probe key, so the daily probe query reads them exchange-free and never
  * recomputes the corpus-side derivation.
  *
  * The local harness uses the default in-memory catalog, so table METADATA
  * lives per-JVM while files persist in the warehouse dir — [[ensure]]
  * therefore clears stale leftover directories before a rebuild. A real
  * deployment points the same code at a persistent metastore and runs the
  * build step on its own schedule.
  */
object Warehouse {

  /** Catalog-safe table name scoped to a data directory. */
  def tableName(prefix: String, dir: String): String =
    prefix + "_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  private[sources] def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete()
  }

  private def clearLeftover(s: SparkSession, name: String): Unit = {
    // a previous JVM's files without catalog metadata would wedge
    // saveAsTable on "location already exists"
    val warehouse = new java.io.File(
      s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    val leftover = new java.io.File(warehouse, name)
    if (leftover.exists()) rm(leftover)
  }

  /** Shared miss-path for every ensure variant: existence check, stale
    * leftover-directory cleanup, then the caller's write (which must end
    * in `saveAsTable(name)`). */
  def ensureVia(s: SparkSession, name: String)(write: => Unit): Unit = synchronized {
    if (s.catalog.tableExists(name)) return
    clearLeftover(s, name)
    write
  }

  /** Create `name` as a bucketed managed table if this JVM's catalog does
    * not have it yet; `build` runs only on a miss. */
  def ensure(s: SparkSession, name: String, bucketCol: String, nBuckets: Int = 8)(
      build: => DataFrame): Unit = ensureVia(s, name) {
    build.write.bucketBy(nBuckets, bucketCol).sortBy(bucketCol).saveAsTable(name)
  }

  /** Create `name` as a DIRECTORY-PARTITIONED managed table (one
    * directory per `partitionCol` value) if missing. The right layout
    * when probes filter on the column directly: `col IN (...)` prunes at
    * plan time as a PartitionFilter — unlike bucket pruning, which Spark
    * silently disables when no operator exploits the bucketing. */
  def ensurePartitioned(s: SparkSession, name: String, partitionCol: String)(
      build: => DataFrame): Unit = ensureVia(s, name) {
    build.write.partitionBy(partitionCol).saveAsTable(name)
  }
}
