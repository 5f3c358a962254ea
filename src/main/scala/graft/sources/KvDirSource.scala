package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the reference engine's NATIVE storage format:
  * flat directories of text files holding one `"<key> <value>"` record per
  * line (reference: `DistrStorage.java:88-102` — bytes in flat dirs;
  * `partition.cpp:30-31` / `reduce.cpp:23-27` — the `iss >> key` parsing
  * convention). `spark.read.format("graft-kv").load(dir)` yields the same
  * `(key STRING, value STRING)` relation [[graft.engine.Engine.plan]]
  * derives from `spark.read.text` + split — but as a first-class TABLE:
  * schema known at plan time, one input partition per file (the
  * reference's own split unit), and COLUMN PRUNING pushed into the reader
  * (`SupportsPushDownRequiredColumns` — a `select(value)` never
  * materializes keys; plan-guarded).
  *
  * Parse parity with the engine path is spec-pinned ([[graft.sources]]
  * KvDirSourceSpec): leading whitespace of every kind stripped, key =
  * first `\s+`-token, value = rest (empty when absent),
  * whitespace-only lines DROPPED (the reference's stream extraction
  * fails and emits nothing).
  *
  * Scale notes: file listing happens once at planning; each file is one
  * partition (matching the reference's file-per-split model — files there
  * are output shards, already sized by the writing job's parallelism).
  * Readers stream lines through a buffered decoder — constant memory per
  * partition. The reader resolves its Hadoop FileSystem from a default
  * `Configuration()`; a cluster deployment with non-default FS settings
  * broadcasts the job conf instead (Spark's `SerializableConfiguration`
  * pattern) — local and default-HDFS setups are unaffected.
  */
class KvDirSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KvDirSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-kv requires a directory path: .load(dir)")
    new KvTable(path)
  }
}

object KvDirSource {
  val Schema: StructType =
    StructType(Seq(StructField("key", StringType), StructField("value", StringType)))

  /** The engine's line→KV rule, one definition for this reader and the
    * parity spec: None = dropped (whitespace-only). */
  def parse(line: String): Option[(String, String)] = {
    val stripped = line.replaceFirst("^\\s+", "")
    if (stripped.isEmpty) None
    else {
      val parts = stripped.split("\\s+", 2)
      Some((parts(0), if (parts.length > 1) parts(1) else ""))
    }
  }
}

private[sources] class KvTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-kv:$path"
  override def schema(): StructType = KvDirSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(path)
}

private[sources] class KvScanBuilder(path: String)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var required: StructType = KvDirSource.Schema
  private var keyEquals: Option[String] = None
  private var countPushed = false

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Accept a bare global COUNT(*) — the "how many records" pass a text
    * format can answer without materializing a single row into Spark
    * (the line scan still runs, but each FILE hands back one Long
    * instead of one row per line — no UTF8String allocation, no per-row
    * handoff). PARTIAL pushdown (`supportCompletePushDown` = false):
    * each input partition emits its own count and Spark's final
    * aggregate sums them — correct under any partitioning, no
    * single-partition requirement. Composes with the pushed key filter
    * (Spark only attempts aggregate pushdown once every remaining
    * filter was claimed by the source, so a pushed count counts exactly
    * the key-matching records). Grouped or non-count aggregates stay
    * with Spark. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val ok = aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.length == 1 &&
      aggregation.aggregateExpressions.head.isInstanceOf[CountStar]
    if (ok) countPushed = true
    ok
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false

  private var accepted: Array[Filter] = Array.empty

  /** Accept `key = <literal>` (the reference's only addressable
    * dimension — its storage API is get-by-key within a directory,
    * `DistrStorage.java:88-102`) plus `IsNotNull` on either column
    * (vacuously true — the parse rule never emits nulls, so claiming the
    * planner-generated IsNotNull companions leaves NO residual Filter
    * node, which is what keeps a filtered COUNT eligible for aggregate
    * pushdown). Everything else stays with Spark. Accepted filters apply
    * during the line scan, so a point lookup never materializes
    * non-matching rows into the query — the row-group skip this format's
    * plain text can offer. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (acc, rest) = filters.partition {
      case EqualTo("key", _: String) => true
      case IsNotNull("key") | IsNotNull("value") => true
      case _ => false
    }
    accepted = acc
    keyEquals = acc.collectFirst { case EqualTo("key", v: String) => v }
    rest
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan =
    if (countPushed) new KvCountScan(path, keyEquals)
    else new KvScan(path, required, keyEquals)
}

/** COUNT(*)-pushed scan: same file enumeration, but each partition reader
  * emits exactly one row — the file's (filter-surviving) record count. */
private[sources] class KvCountScan(path: String, keyEquals: Option[String])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-kv $path, PushedAggregation: [COUNT(*)], PushedFilters: ${keyEquals
        .map(v => s"[key = $v]").getOrElse("[]")}"
  override def planInputPartitions(): Array[InputPartition] =
    KvScan.listPartitions(path)
  override def createReaderFactory(): PartitionReaderFactory =
    new KvCountReaderFactory(keyEquals)
}

private[sources] class KvCountReaderFactory(keyEquals: Option[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KvCountPartitionReader(
      partition.asInstanceOf[KvInputPartition].file, keyEquals)
}

private[sources] class KvCountPartitionReader(file: String, keyEquals: Option[String])
    extends PartitionReader[InternalRow] {
  private val path = new Path(file)
  private val reader = new BufferedReader(
    new InputStreamReader(
      path.getFileSystem(new Configuration()).open(path), StandardCharsets.UTF_8))
  private var emitted = false
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (emitted) return false
    var n = 0L
    var line = reader.readLine()
    while (line != null) {
      KvDirSource.parse(line) match {
        case Some((k, _)) if keyEquals.forall(_ == k) => n += 1
        case _ => ()
      }
      line = reader.readLine()
    }
    current = new GenericInternalRow(Array[Any](n))
    emitted = true
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

private[sources] class KvScan(
    path: String, required: StructType, keyEquals: Option[String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-kv $path, PushedFilters: ${keyEquals.map(v => s"[key = $v]").getOrElse("[]")}"
  override def planInputPartitions(): Array[InputPartition] =
    KvScan.listPartitions(path)
  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(required.fieldNames, keyEquals)
}

private[sources] object KvScan {
  /** One partition per visible file — shared by the row and count scans. */
  def listPartitions(path: String): Array[InputPartition] = {
    val root = new Path(path)
    val fs = root.getFileSystem(new Configuration())
    fs.listStatus(root)
      .filter(_.isFile)
      .map(_.getPath)
      // _SUCCESS markers / hidden files, same convention as FileFormat
      .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))
      .sortBy(_.getName)
      .map(p => KvInputPartition(p.toString): InputPartition)
  }
}

private[sources] case class KvInputPartition(file: String) extends InputPartition

private[sources] class KvReaderFactory(
    fields: Array[String], keyEquals: Option[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KvPartitionReader(
      partition.asInstanceOf[KvInputPartition].file, fields, keyEquals)
}

private[sources] class KvPartitionReader(
    file: String, fields: Array[String], keyEquals: Option[String])
    extends PartitionReader[InternalRow] {
  private val path = new Path(file)
  private val reader = new BufferedReader(
    new InputStreamReader(
      path.getFileSystem(new Configuration()).open(path), StandardCharsets.UTF_8))
  private var current: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      KvDirSource.parse(line) match {
        case Some((k, v)) if keyEquals.forall(_ == k) =>
          current = new GenericInternalRow(fields.map {
            case "key" => UTF8String.fromString(k)
            case "value" => UTF8String.fromString(v)
          }.toArray[Any])
          return true
        case _ => line = reader.readLine()
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
