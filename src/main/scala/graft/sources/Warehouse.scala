package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once persisted index tables (the "nightly index job" half of an
  * incremental pipeline). Tables are managed, bucketed and sorted by their
  * probe key, so the daily probe query reads them exchange-free and never
  * recomputes the corpus-side derivation.
  *
  * The local harness uses the default in-memory catalog, so table METADATA
  * lives per-JVM while files persist in the warehouse dir. Callers that
  * pass `reuseFrom = Some(srcDir)` opt into CROSS-JVM artifact reuse: a
  * successful build drops a `_graft_meta` marker (schema + layout + a
  * fingerprint of the source data files AND the compiled library classes)
  * next to the table files, and a later JVM finding a marker whose
  * fingerprint still matches RE-REGISTERS the existing files as an
  * external table instead of re-running the fit — the "paid once per
  * warehouse" story made true across processes. Either new data (the
  * driver regenerates testdata; MakeScale rewrites replica dirs) or new
  * code (any recompile) changes the fingerprint and forces a rebuild, so
  * a stale index can never serve a query silently. Only immutable
  * post-build artifacts may opt in — a table the pipeline later mutates
  * (e.g. a spec's forget-target) must keep the default rebuild path.
  * A real deployment points the same code at a persistent metastore and
  * runs the build step on its own schedule; this marker is the
  * in-memory-catalog stand-in for that metastore.
  *
  * Concurrency: one writer per warehouse dir at a time (the harness's
  * mains run sequentially). Two JVMs ensuring the same MISSING table
  * concurrently race exactly as they always did (clearLeftover can
  * delete a mid-build directory); the marker does not widen that window
  * — it is written only after a complete build, so a half-built table
  * can never be re-registered.
  */
object Warehouse {

  /** Catalog-safe table name scoped to a data directory. */
  def tableName(prefix: String, dir: String): String =
    prefix + "_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  private[sources] def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete()
  }

  private def tableDir(s: SparkSession, name: String): java.io.File = {
    val warehouse = new java.io.File(
      s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    new java.io.File(warehouse, name.toLowerCase)
  }

  private def clearLeftover(s: SparkSession, name: String): Unit = {
    // a previous JVM's files without catalog metadata would wedge
    // saveAsTable on "location already exists"
    val leftover = tableDir(s, name)
    if (leftover.exists()) rm(leftover)
  }

  // ------------------------------------------------ cross-JVM reuse marker

  private val MetaFile = "_graft_meta" // "_" prefix: invisible to scans

  /** (relpath, size, mtime) of every file under `root`, sorted — a
    * metadata-only directory fingerprint input (no data is read). */
  private def listMeta(root: java.io.File, prefix: String = ""): Seq[String] =
    if (!root.exists()) Seq.empty
    else if (root.isFile) Seq(s"$prefix${root.getName}:${root.length}:${root.lastModified}")
    else Option(root.listFiles()).getOrElse(Array.empty).sortBy(_.getName).toSeq
      .flatMap(f => listMeta(f, s"$prefix${root.getName}/"))

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Fingerprint of the compiled library classes this JVM runs — any
    * recompile changes it, so artifacts built by older code are never
    * reused (the build closure's constants are code, not data). */
  private lazy val codeFingerprint: String =
    System.getProperty("java.class.path", "")
      .split(java.io.File.pathSeparator)
      .find(p => new java.io.File(p, "graft").isDirectory)
      .map(p => md5(listMeta(new java.io.File(p)).mkString("\n")))
      .getOrElse("no-classes-dir")

  /** Fingerprint of everything a stored artifact derives from: the
    * source data directory's file metadata plus [[codeFingerprint]]. */
  private def srcFingerprint(dir: String): String =
    md5((listMeta(new java.io.File(dir)) :+ codeFingerprint).mkString("\n"))

  /** Record a just-built table's schema + layout + input fingerprint so a
    * later JVM can re-register the files instead of re-fitting. Layout is
    * read back from the CATALOG (not from the ensure variant), so custom
    * ensureVia writes are captured faithfully. */
  private def writeMeta(s: SparkSession, name: String, fp: String): Unit = {
    val dir = tableDir(s, name)
    if (!dir.isDirectory) return // location overridden — no reuse contract
    val cat = s.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name))
    val p = new java.util.Properties()
    p.setProperty("fp", fp)
    p.setProperty("ddl", cat.schema.toDDL)
    p.setProperty("partcols", cat.partitionColumnNames.mkString(","))
    cat.bucketSpec.foreach { b =>
      p.setProperty("bucketn", b.numBuckets.toString)
      p.setProperty("bucketcols", b.bucketColumnNames.mkString(","))
      p.setProperty("sortcols", b.sortColumnNames.mkString(","))
    }
    val out = new java.io.FileOutputStream(new java.io.File(dir, MetaFile))
    try p.store(out, "graft warehouse reuse marker")
    finally out.close()
  }

  /** Try to re-register leftover files as `name` (external table over the
    * existing location). True only when a complete marker exists AND its
    * fingerprint matches the current source data + code. */
  private def reregister(s: SparkSession, name: String, fp: String): Boolean = {
    val dir = tableDir(s, name)
    val metaF = new java.io.File(dir, MetaFile)
    if (!metaF.isFile) return false
    val p = new java.util.Properties()
    val in = new java.io.FileInputStream(metaF)
    try p.load(in)
    finally in.close()
    if (p.getProperty("fp") != fp) return false
    val ddl = p.getProperty("ddl")
    if (ddl == null || ddl.isEmpty) return false
    val partCols = Option(p.getProperty("partcols")).filter(_.nonEmpty)
    val bucketed = Option(p.getProperty("bucketn")).map { n =>
      val cols = p.getProperty("bucketcols")
      val sorts = Option(p.getProperty("sortcols")).filter(_.nonEmpty)
        .map(c => s" SORTED BY ($c)").getOrElse("")
      s" CLUSTERED BY ($cols)$sorts INTO $n BUCKETS"
    }.getOrElse("")
    val partitioned = partCols.map(c => s" PARTITIONED BY ($c)").getOrElse("")
    s.sql(s"CREATE TABLE $name ($ddl) USING parquet$partitioned$bucketed " +
      s"LOCATION '${dir.toURI}'")
    if (partCols.isDefined) s.sql(s"ALTER TABLE $name RECOVER PARTITIONS")
    println(s"[warehouse] reuse $name (cross-JVM, fingerprint match)")
    true
  }

  /** Shared miss-path for every ensure variant: existence check, then —
    * when the caller opted into reuse and a fingerprint-matching marker
    * is present — re-registration of the previous JVM's files; otherwise
    * stale leftover-directory cleanup and the caller's write (which must
    * end in `saveAsTable(name)`). */
  def ensureVia(s: SparkSession, name: String, reuseFrom: Option[String] = None)(
      write: => Unit): Unit = synchronized {
    if (s.catalog.tableExists(name)) return
    val fp = reuseFrom.map(srcFingerprint)
    if (fp.isDefined && tableDir(s, name).isDirectory && reregister(s, name, fp.get)) return
    clearLeftover(s, name)
    write
    fp.foreach { f =>
      println(s"[warehouse] build $name")
      writeMeta(s, name, f)
    }
  }

  /** Create `name` as a bucketed managed table if this JVM's catalog does
    * not have it yet; `build` runs only on a miss. */
  def ensure(
      s: SparkSession, name: String, bucketCol: String, nBuckets: Int = 8,
      reuseFrom: Option[String] = None)(
      build: => DataFrame): Unit = ensureVia(s, name, reuseFrom) {
    build.write.bucketBy(nBuckets, bucketCol).sortBy(bucketCol).saveAsTable(name)
  }

  /** Create `name` as a DIRECTORY-PARTITIONED managed table (one
    * directory per `partitionCol` value) if missing. The right layout
    * when probes filter on the column directly: `col IN (...)` prunes at
    * plan time as a PartitionFilter — unlike bucket pruning, which Spark
    * silently disables when no operator exploits the bucketing. */
  def ensurePartitioned(
      s: SparkSession, name: String, partitionCol: String,
      reuseFrom: Option[String] = None)(
      build: => DataFrame): Unit = ensureVia(s, name, reuseFrom) {
    build.write.partitionBy(partitionCol).saveAsTable(name)
  }
}
