package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, Dedup, Evaluation, Maintenance, Multimodal, Relational, Sampling, Similarity, TemporalJoins, TextOps}
import graft.sources.Formats

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator pack into the flat `queries` / `oracleSql`
  * maps the driver's Verify/Bench harness consumes.
  */
object SparkEntry {

  /** Full operator inventory (SURVEY.md §2 + training-pipeline extensions). */
  val all: Seq[Q] =
    Relational.queries ++ TemporalJoins.queries ++ TextOps.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      Formats.queries ++ Sampling.queries ++ Maintenance.queries ++ Analytics.queries ++
      Evaluation.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. The plane-LSH queries are NOT omitted: the
    * seed-fixed hyperplanes ride into their oracles as literals, so
    * q_dedup_embedding_lsh / q_sim_ann_lsh / q_sim_bucketed_pairs are
    * hash-gated. Omitted only for the xxhash64 sketches
    * (q_dedup_minhash_lsh, q_dedup_simhash — DuckDB has no xxhash64 and
    * the byte-level loop is not SQL-expressible), the k-means/PQ-fit indexes
    * (q_sim_ivf_kmeans, q_sim_pq, q_sim_ivfpq), the raw approx
    * sketches (q_approx_distinct, q_approx_percentiles),
    * q_bpe_train_full (32k-round trainer — its 8-rule prefix is
    * hash-gated through q_bpe_train's unrolled-CTE oracle and the
    * agreement spec pins the rest), and the unigram-LM EM loop's two
    * rows (q_unigram_train, q_unigram_fertility — Viterbi under exact
    * rational probabilities is not SQL-expressible) → driver records
    * a rows-only check; their correctness oracles are the
    * planted-ground-truth / recall / property ScalaTest specs PLUS
    * the oracle-gated companion rows (q_minhash_recall,
    * q_simhash_complete, q_approx_distinct_check,
    * q_approx_percentiles_check, q_sim_pq_check, q_sim_ivfpq_check,
    * q_sim_kmeans_check — the recall floor as a hash-compared verdict —
    * q_bpe_train_full_check — the 8-rule-prefix agreement likewise —
    * and q_unigram_train_check / q_unigram_fertility_check — DuckDB
    * recomputing size/coverage/character-mass invariants) that turn
    * each no-oracle claim the driver CAN check into a
    * hash-compared row. */
  def oracleSql: Map[String, String] =
    all.collect { case Q(name, _, Some(sql), _) => name -> sql }.toMap

  /** Queries included in the per-round Bench timing (excludes the
    * quadratic oracle-demo variants, keeps their scalable twins). */
  def headline: Seq[Q] = all.filter(_.headline)
}
