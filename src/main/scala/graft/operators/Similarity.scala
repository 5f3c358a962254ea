package graft.operators

import graft.{Q, Tables}
import graft.functions.VectorOps
import graft.functions.PortableRound.pround
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (ARRAY<FLOAT>, dim 64).
  *
  *   - Brute-force cosine top-k: the exact baseline. One scan, a per-row
  *     projection against a broadcast query vector, TakeOrderedAndProject
  *     for k — no shuffle of the full score set.
  *   - LSH-bucketed ANN (random hyperplanes): the 100 TB path. Sign-bit
  *     bucket from H fixed hyperplanes; only the query's bucket (plus
  *     1-bit-flip probes) is scored. Bucketing is one narrow projection;
  *     candidates are a partition-pruned fraction ~1/2^H of the data.
  *
  * Hyperplanes are generated driver-side from a fixed seed and shipped as
  * literals — deterministic across runs, no hash-function dependence on the
  * engine, but still not ANSI-SQL-portable (the oracle for ANN is the
  * ScalaTest recall-vs-brute-force spec, not DuckDB).
  */
object Similarity {

  private val Dim = 64
  private val NumPlanes = 8

  /** Fixed pseudo-random hyperplanes (seed 42), shipped as a literal. */
  private lazy val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPlanes)(Seq.fill(Dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket id of a vector under the fixed hyperplanes. */
  private def bucketOf(v: Column): Column =
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
      acc + when(graft.functions.NativeExprs.dotProd(v, typedlit(p)) >= 0, shiftleft(lit(1L), i))
        .otherwise(lit(0L))
    }

  /** Exact top-10 cosine neighbors of vec_id 0 (the brute-force baseline).
    * DuckDB oracle uses list_cosine_similarity over the same DOUBLE[] data. */
  def qTopKExact(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("v"))
    val q = broadcast(e.filter(col("vec_id") === 0).select(col("v").as("qv")))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(q)
      .select(col("vec_id"), pround(graft.functions.NativeExprs.cosineSim(col("v"), col("qv")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  private val qTopKExactSql =
    """SELECT e.vec_id,
      |  floor(list_cosine_similarity(e.embedding::DOUBLE[], q.qv) * 1000000 + 0.5) / 1000000.0 AS cos
      |FROM embeddings e,
      |  (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) q
      |WHERE e.vec_id <> 0
      |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin

  /** ANN: random-hyperplane LSH buckets, query probes its own bucket plus
    * all 1-bit-flip neighbor buckets, exact cosine over candidates only.
    * Returns approximate top-10 for vec_id 0. */
  def qAnnLsh(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("bucket", bucketOf(col("v")))
    val q = e.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("bucket").as("qbucket"))
    // probe set: exact bucket + 1-bit flips (multi-probe LSH)
    val probes = q.select(
      col("qv"),
      explode(
        concat(
          array(col("qbucket")),
          expr(s"transform(sequence(0, ${NumPlanes - 1}), i -> qbucket ^ shiftleft(1L, i))")))
        .as("bucket"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(probes), "bucket")
      .select(col("vec_id"), pround(graft.functions.NativeExprs.cosineSim(col("v"), col("qv")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** All-pairs top similar within LSH buckets — the scalable "find similar
    * content across the corpus" sweep (bucket join instead of cross join). */
  def qBucketedPairs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("bucket", bucketOf(col("v")))
    e.as("a")
      .join(e.as("b"), Seq("bucket"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("va"),
        col("b.vec_id").as("vb"),
        pround(graft.functions.NativeExprs.cosineSim(col("a.v"), col("b.v")), 6).as("cos"))
      .filter(col("cos") >= 0.25)
      .orderBy(col("cos").desc, col("va"), col("vb"))
      .limit(100)
  }

  val queries: Seq[Q] = Seq(
    Q("q_sim_topk_exact", qTopKExact, Some(qTopKExactSql)),
    Q("q_sim_ann_lsh", qAnnLsh, None),
    Q("q_sim_bucketed_pairs", qBucketedPairs, None))
}
