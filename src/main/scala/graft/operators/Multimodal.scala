package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media as opaque BINARY columns with
  * typed metadata, processed batch-wise in executor-side partitions.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`FakeCodec`) — but everything Spark
  * cares about is real and tested: the binary column schema, the
  * mapPartitions batch shape (stream over rows, no per-row setup cost —
  * exactly where a real decoder would amortize model/codec init), the typed
  * output Encoder, and the pushdown-friendly projection that ships ONLY the
  * blob + id into the "decoder".
  *
  * At 100 TB the same plan holds: the blob column stays out of every
  * operator except the decode projection; metadata ops run on pruned
  * columns. The `documents.text` bytes stand in for media payloads.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long, n_frames: Long)
  final case class Frame(doc_id: Long, frame_idx: Long, sample_value: Long)

  /** STUB decoder: derives fake media properties deterministically from the
    * payload bytes. A real deployment swaps this object for JNI/codec calls
    * — the surrounding Spark plumbing is unchanged. */
  object FakeCodec {
    def probe(id: Long, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length.toLong
      // n_frames reports what sampleFrames actually emits — min(4, n), so
      // metadata and frame output agree even on tiny payloads
      MediaMeta(id, n, width = n % 640 + 1, height = n % 480 + 1, n_frames = math.min(4L, n))
    }
    /** "Frame sampling": pick n_frames evenly spaced payload bytes. */
    def sampleFrames(id: Long, bytes: Array[Byte], nFrames: Int): Iterator[Frame] = {
      val n = bytes.length
      val stride = math.max(1, n / nFrames)
      Iterator.tabulate(math.min(nFrames, n)) { f =>
        Frame(id, f.toLong, (bytes(f * stride) & 0xff).toLong)
      }
    }
  }

  /** Blob + id projection — the ONLY place the binary column is read. */
  private def blobs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), col("text").cast("binary").as("blob"))

  /** Metadata extraction over the binary column via mapPartitions (batch
    * shape: one iterator per partition, streaming, constant memory). */
  def qMediaMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    blobs(s, d)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows => rows.map { case (id, bytes) => FakeCodec.probe(id, bytes) } }
      .toDF()
      .orderBy("doc_id")
  }

  /** Oracle: the stub's outputs are pure functions of payload length, so
    * DuckDB reproduces them from octet_length — the decode is fake but the
    * check is real end-to-end through the binary plumbing. */
  private val qMediaMetaSql =
    """SELECT doc_id,
      |  octet_length(encode(text))::BIGINT AS n_bytes,
      |  (octet_length(encode(text)) % 640 + 1)::BIGINT AS width,
      |  (octet_length(encode(text)) % 480 + 1)::BIGINT AS height,
      |  least(4, octet_length(encode(text)))::BIGINT AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame sampling: flatMap-shaped decode (0..n rows out per blob). */
  def qFrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    blobs(s, d)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) => FakeCodec.sampleFrames(id, bytes, nFrames = 4) }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** ASCII payloads ⇒ byte samples equal character codes; DuckDB mirrors
    * the stride arithmetic. */
  private val qFrameSampleSql =
    """SELECT doc_id, f::BIGINT AS frame_idx,
      |  ascii(substr(text, (f * greatest(octet_length(encode(text)) // 4, 1) + 1)::INT, 1))::BIGINT
      |    AS sample_value
      |FROM documents, (SELECT unnest(range(4)) AS f)
      |WHERE f < octet_length(encode(text))
      |ORDER BY doc_id, frame_idx""".stripMargin

  final case class MediaFeature(
      doc_id: Long,
      h0: Double, h1: Double, h2: Double, h3: Double,
      h4: Double, h5: Double, h6: Double, h7: Double)
  final case class ResizedMeta(doc_id: Long, width: Long, height: Long, out_w: Long, out_h: Long)

  /** Feature extraction over the binary column: an 8-bin byte histogram as
    * the stand-in "embedding" (a real pipeline would run a vision encoder
    * here — same mapPartitions batch shape). Bins are emitted as scalar
    * columns h0..h7 so both the driver's row-sort check and a plain SQL
    * oracle work; downstream vector consumers can re-pack with
    * `array(col("h0"), ..., col("h7"))`. Deterministic; validated by
    * ExtrasSpec against an independent computation AND the DuckDB oracle. */
  def qFeatureExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    blobs(s, d)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val hist = new Array[Double](8)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) % 8) += 1.0; i += 1 }
          MediaFeature(id, hist(0), hist(1), hist(2), hist(3), hist(4), hist(5), hist(6), hist(7))
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** ASCII payloads ⇒ byte values equal character codes; DuckDB counts
    * characters per `ascii(ch) % 8` bin by unnesting one position index per
    * byte. (documents.text is never empty in the generated data — min
    * octet length 44 across the sf0.001/0.01/0.1 dirs — so the unnest
    * can't drop a doc.) */
  private val qFeatureExtractSql =
    """SELECT doc_id,
      |  count(CASE WHEN ascii(substr(text, i::INT, 1)) % 8 = 0 THEN 1 END)::DOUBLE AS h0,
      |  count(CASE WHEN ascii(substr(text, i::INT, 1)) % 8 = 1 THEN 1 END)::DOUBLE AS h1,
      |  count(CASE WHEN ascii(substr(text, i::INT, 1)) % 8 = 2 THEN 1 END)::DOUBLE AS h2,
      |  count(CASE WHEN ascii(substr(text, i::INT, 1)) % 8 = 3 THEN 1 END)::DOUBLE AS h3,
      |  count(CASE WHEN ascii(substr(text, i::INT, 1)) % 8 = 4 THEN 1 END)::DOUBLE AS h4,
      |  count(CASE WHEN ascii(substr(text, i::INT, 1)) % 8 = 5 THEN 1 END)::DOUBLE AS h5,
      |  count(CASE WHEN ascii(substr(text, i::INT, 1)) % 8 = 6 THEN 1 END)::DOUBLE AS h6,
      |  count(CASE WHEN ascii(substr(text, i::INT, 1)) % 8 = 7 THEN 1 END)::DOUBLE AS h7
      |FROM (SELECT doc_id, text,
      |        unnest(range(1, octet_length(encode(text)) + 1)) AS i
      |      FROM documents)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Resize stub: target box 224×224, aspect preserved (integer math only
    * so the DuckDB oracle replays it exactly). The real decoder swap-in
    * changes FakeCodec, not this plan. */
  def qResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    blobs(s, d)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val m = FakeCodec.probe(id, bytes)
          // fit into 224x224 preserving aspect: scale = 224/max(w,h)
          val mx = math.max(m.width, m.height)
          ResizedMeta(id, m.width, m.height, m.width * 224 / mx, m.height * 224 / mx)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  private val qResizeSql =
    """SELECT doc_id,
      |  (octet_length(encode(text)) % 640 + 1)::BIGINT AS width,
      |  (octet_length(encode(text)) % 480 + 1)::BIGINT AS height,
      |  ((octet_length(encode(text)) % 640 + 1) * 224
      |    // greatest(octet_length(encode(text)) % 640 + 1,
      |               octet_length(encode(text)) % 480 + 1))::BIGINT AS out_w,
      |  ((octet_length(encode(text)) % 480 + 1) * 224
      |    // greatest(octet_length(encode(text)) % 640 + 1,
      |               octet_length(encode(text)) % 480 + 1))::BIGINT AS out_h
      |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_media_meta", qMediaMeta, Some(qMediaMetaSql)),
    Q("q_frame_sample", qFrameSample, Some(qFrameSampleSql)),
    Q("q_media_features", qFeatureExtract, Some(qFeatureExtractSql)),
    Q("q_media_resize", qResize, Some(qResizeSql)))
}
