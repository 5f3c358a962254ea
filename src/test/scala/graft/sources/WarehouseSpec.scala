package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions._

/** Cross-JVM warehouse artifact reuse ([[Warehouse.ensureVia]]'s
  * `reuseFrom` path): a fingerprint-matching leftover directory is
  * re-registered instead of re-built, the re-registered table keeps its
  * physical layout (bucket spec / recovered partitions), and any change
  * to the source data invalidates the marker. The "other JVM" is
  * simulated by saving the table files aside, dropping the catalog entry
  * (which, for a managed table, deletes the files), and restoring the
  * files — exactly the state a fresh JVM sees over a shared warehouse
  * dir. */
class WarehouseSpec extends SparkSpec {

  private def warehouseDir: java.io.File = new java.io.File(
    spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))

  /** Drop `name` from the catalog while PRESERVING its files — the state
    * a new JVM finds: files on disk, no metadata. */
  private def dropKeepingFiles(name: String): Unit = {
    val dir = new java.io.File(warehouseDir, name)
    val aside = new java.io.File(warehouseDir, name + "__aside")
    if (aside.exists()) Warehouse.rm(aside)
    java.nio.file.Files.move(dir.toPath, aside.toPath)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    if (dir.exists()) Warehouse.rm(dir)
    java.nio.file.Files.move(aside.toPath, dir.toPath)
  }

  private val tempDirs = scala.collection.mutable.ListBuffer.empty[java.io.File]
  private val madeTables = scala.collection.mutable.ListBuffer.empty[String]

  private def freshSrcDir(tag: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_wh_$tag").toFile
    tempDirs += d
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k")
      .write.mode("overwrite").parquet(new java.io.File(d, "t.parquet").toString)
    d
  }

  override def afterAll(): Unit = {
    // the random temp path is embedded in each table name, so a leaked
    // table dir would never be reused by a later run — drop both the
    // catalog entries (managed data included) and any external leftovers,
    // plus the temp source dirs
    for (t <- madeTables) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(warehouseDir, t.toLowerCase)
      if (dir.exists()) Warehouse.rm(dir)
    }
    tempDirs.foreach(Warehouse.rm)
    super.afterAll()
  }

  test("bucketed table is re-registered from files with its bucket spec intact") {
    val src = freshSrcDir("bucket")
    val name = Warehouse.tableName("graft_spec_reuse_b", src.toString)
    madeTables += name
    spark.sql(s"DROP TABLE IF EXISTS $name")
    var builds = 0
    def build(): Unit = Warehouse.ensure(spark, name, "id", 4, Some(src.toString)) {
      builds += 1
      spark.read.parquet(new java.io.File(src, "t.parquet").toString)
    }
    build()
    assert(builds === 1)
    val rows = spark.table(name).orderBy("id").collect().map(_.getString(1)).toSeq

    dropKeepingFiles(name)
    build()
    assert(builds === 1, "fingerprint match must re-register, not re-build")
    assert(spark.table(name).orderBy("id").collect().map(_.getString(1)).toSeq === rows)
    val meta = spark.sessionState.catalog.getTableMetadata(TableIdentifier(name))
    assert(meta.bucketSpec.exists(b =>
      b.numBuckets == 4 && b.bucketColumnNames == Seq("id")),
      s"bucket spec lost on reuse: ${meta.bucketSpec}")
  }

  test("partitioned table reuse recovers partitions and still partition-prunes") {
    val src = freshSrcDir("part")
    val name = Warehouse.tableName("graft_spec_reuse_p", src.toString)
    madeTables += name
    spark.sql(s"DROP TABLE IF EXISTS $name")
    var builds = 0
    def build(): Unit = Warehouse.ensurePartitioned(spark, name, "k", Some(src.toString)) {
      builds += 1
      spark.read.parquet(new java.io.File(src, "t.parquet").toString)
    }
    build()
    dropKeepingFiles(name)
    build()
    assert(builds === 1)
    assert(spark.sql(s"SHOW PARTITIONS $name").count() === 2)
    assert(spark.table(name).filter(col("k") === "a").count() === 2)
    // the probe plan prunes to the one matching partition directory
    val scan = spark.table(name).filter(col("k") === "a")
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("k"), scan)
  }

  test("changed source data invalidates the marker and forces a re-build") {
    val src = freshSrcDir("inval")
    val name = Warehouse.tableName("graft_spec_reuse_i", src.toString)
    madeTables += name
    spark.sql(s"DROP TABLE IF EXISTS $name")
    var builds = 0
    def build(): Unit = Warehouse.ensureVia(spark, name, Some(src.toString)) {
      builds += 1
      spark.read.parquet(new java.io.File(src, "t.parquet").toString)
        .write.saveAsTable(name)
    }
    build()
    dropKeepingFiles(name)
    // new data under the source dir → different fingerprint
    import spark.implicits._
    Seq((9L, "z")).toDF("id", "k")
      .write.mode("overwrite").parquet(new java.io.File(src, "t.parquet").toString)
    build()
    assert(builds === 2, "stale marker must not serve a table built from old data")
    assert(spark.table(name).count() === 1)
  }

  test("a truncated marker (missing partcols) is rejected — rebuild, not a NULL-column registration") {
    // markers are published by atomic rename, but a marker written by an
    // older build could be missing keys; registering a PARTITIONED
    // layout without its PARTITIONED BY would read the
    // directory-encoded column as NULLs — the reuse path must reject
    // and rebuild instead
    val src = freshSrcDir("trunc")
    val name = Warehouse.tableName("graft_spec_reuse_t", src.toString)
    madeTables += name
    spark.sql(s"DROP TABLE IF EXISTS $name")
    var builds = 0
    def build(): Unit = Warehouse.ensurePartitioned(spark, name, "k", Some(src.toString)) {
      builds += 1
      spark.read.parquet(new java.io.File(src, "t.parquet").toString)
    }
    build()
    dropKeepingFiles(name)
    // corrupt the marker: drop the partcols line (keep fp + ddl intact)
    val metaF = new java.io.File(new java.io.File(warehouseDir, name.toLowerCase), "_graft_meta")
    val kept = scala.io.Source.fromFile(metaF, "UTF-8").getLines()
      .filterNot(_.startsWith("partcols")).mkString("\n")
    java.nio.file.Files.writeString(metaF.toPath, kept)
    build()
    assert(builds === 2, "a truncated marker must force a rebuild")
    assert(spark.table(name).filter(col("k").isNull).count() === 0,
      "re-registered table read the partition column as NULLs")
    assert(spark.table(name).filter(col("k") === "a").count() === 2)
  }

  test("a leftover directory WITHOUT a marker is cleared and re-built (old behavior)") {
    val src = freshSrcDir("nomark")
    val name = Warehouse.tableName("graft_spec_reuse_n", src.toString)
    madeTables += name
    spark.sql(s"DROP TABLE IF EXISTS $name")
    var builds = 0
    def build(reuse: Option[String]): Unit = Warehouse.ensureVia(spark, name, reuse) {
      builds += 1
      spark.read.parquet(new java.io.File(src, "t.parquet").toString)
        .write.saveAsTable(name)
    }
    build(None) // no marker written
    dropKeepingFiles(name)
    build(Some(src.toString))
    assert(builds === 2)
    assert(spark.table(name).count() === 3)
  }
}
