package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling and data-mixing operators over `documents`.
  *
  * Training corpora are MIXTURES: each source gets a target weight, and the
  * mixture must be reproducible run-to-run, survive corpus appends without
  * reshuffling anyone else's membership, and be recomputable from the key
  * alone (so sample membership can be joined against any other table
  * without persisting a membership list). RNG-based sampling
  * (`df.sample`) has none of those properties — partition-order dependent,
  * unstable under appends. The standard fix is HASH sampling: admit a row
  * iff a fingerprint of its key falls under a threshold.
  *
  * The admission key here is the first byte of md5(doc_id), uniform over
  * 0..255, compared as a two-hex-char prefix — portable to any engine that
  * has md5 of a string (the oracle compares the same prefix in DuckDB).
  * At 100 TB both ops are pure narrow scans: no shuffle, no state, no
  * coordination; the mixture is enforced row-locally. (The final orderBy
  * is presentation-only for the oracle diff.)
  */
object Sampling {

  /** Two-hex-char admission key: uniform over 256 buckets, stable in the
    * doc_id. Thresholds are spelled as hex-prefix literals ('40' admits
    * 64/256 = 25 %). */
  private def admitKey(id: Column): Column = substring(md5(id.cast("string")), 1, 2)
  private def admitKeySql(id: String): String = s"substr(md5(CAST($id AS VARCHAR)), 1, 2)"

  /** Per-source mixture weights: low-rate sources src0-4 at 32/256
    * (12.5 %), mid sources src5-9 at 128/256 (50 %), everything else at
    * 192/256 (75 %). */
  private val lowSources = (0 to 4).map(i => s"src$i")
  private val midSources = (5 to 9).map(i => s"src$i")

  private def threshold(source: Column): Column =
    when(source.isin(lowSources.map(_.asInstanceOf[Any]): _*), lit("20"))
      .when(source.isin(midSources.map(_.asInstanceOf[Any]): _*), lit("80"))
      .otherwise(lit("c0"))

  private def thresholdSql(source: String): String = {
    def inList(ws: Seq[String]) = ws.mkString("('", "', '", "')")
    s"CASE WHEN $source IN ${inList(lowSources)} THEN '20' " +
      s"WHEN $source IN ${inList(midSources)} THEN '80' ELSE 'c0' END"
  }

  /** Weighted mixture sampling: the admitted corpus under the per-source
    * weights above. Emits the admission key so the oracle pins the
    * mechanism, not just the survivor set. */
  def qSampleMix(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), admitKey(col("doc_id")).as("admit_key"))
      .filter(col("admit_key") < threshold(col("source")))
      .orderBy("doc_id")

  private val qSampleMixSql =
    s"""SELECT doc_id, source, ${admitKeySql("doc_id")} AS admit_key
       |FROM documents
       |WHERE ${admitKeySql("doc_id")} < ${thresholdSql("source")}
       |ORDER BY doc_id""".stripMargin

  /** Deterministic train/validation/test split: disjoint hash ranges
    * (val < 0x0d ≈ 5 %, test < 0x1a ≈ 5 %, train the rest), rolled up to
    * per-source counts — the output proves the split partitions every
    * source completely (n_train + n_val + n_test = n_total) with no
    * assignment ever depending on any other row. */
  def qSampleSplit(s: SparkSession, d: String): DataFrame = {
    val k = admitKey(col("doc_id"))
    val split = when(k < "0d", lit("val")).when(k < "1a", lit("test")).otherwise(lit("train"))
    Tables.documents(s, d)
      .select(col("source"), split.as("split"))
      .groupBy("source")
      .agg(
        count(when(col("split") === "train", 1)).as("n_train"),
        count(when(col("split") === "val", 1)).as("n_val"),
        count(when(col("split") === "test", 1)).as("n_test"),
        count(lit(1)).as("n_total"))
      .orderBy("source")
  }

  private val qSampleSplitSql = {
    val k = admitKeySql("doc_id")
    s"""SELECT source,
       |  count(*) FILTER (WHERE k >= '1a') AS n_train,
       |  count(*) FILTER (WHERE k < '0d') AS n_val,
       |  count(*) FILTER (WHERE k >= '0d' AND k < '1a') AS n_test,
       |  count(*) AS n_total
       |FROM (SELECT source, $k AS k FROM documents)
       |GROUP BY source ORDER BY source""".stripMargin
  }

  private val TokenBudget = 800L

  /** Per-source token-budget cut: admit each source's documents in
    * deterministic hash order until the source's running token total
    * reaches [[TokenBudget]] — how a mixture recipe caps a source's
    * contribution in TOKENS (what the model actually trains on) rather
    * than documents. Hash order makes the kept prefix an unbiased,
    * append-stable sample of the source; the running sum is one window
    * per source partition (at 100 TB each source's window shards by the
    * partition key — no global ordering anywhere). All-integer output. */
  def qTokenBudget(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(col("admit_key"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("source"),
        admitKey(col("doc_id")).as("admit_key"),
        size(graft.functions.NativeExprs.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= TokenBudget)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
      .orderBy("doc_id")
  }

  private val qTokenBudgetSql = {
    val t = graft.operators.TextOps.tokensSql
    s"""WITH t AS (
       |  SELECT doc_id, source, ${admitKeySql("doc_id")} AS admit_key,
       |    len($t)::BIGINT AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT *, CAST(sum(n_tokens) OVER (
       |    PARTITION BY source ORDER BY admit_key, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM t)
       |SELECT doc_id, source, n_tokens, cum_tokens FROM c
       |WHERE cum_tokens <= $TokenBudget
       |ORDER BY doc_id""".stripMargin
  }

  private val PackCap = 512L

  /** Contiguous sequence packing: concatenate each source's documents in
    * doc_id order and cut the stream into fixed-[[PackCap]]-token
    * training sequences; a document belongs to the bin where its first
    * token lands (bin = floor(tokens-before / cap)), so bins can overrun
    * the cap by at most one document's tail — the standard greedy packing
    * approximation, computed as pure window arithmetic with no state.
    * Output is per-bin occupancy (doc count, token sum, doc-id range) —
    * the padding-efficiency report a packing job emits. Packing is per
    * source partition; nothing global. */
  def qPackSequences(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("source"),
        size(graft.functions.NativeExprs.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("bin", expr(s"(cum - n_tokens) div $PackCap"))
      .groupBy("source", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("tok_sum"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("source", "bin")
  }

  private val qPackSequencesSql = {
    val t = graft.operators.TextOps.tokensSql
    s"""WITH t AS (
       |  SELECT doc_id, source, len($t)::BIGINT AS n_tokens FROM documents),
       |c AS (
       |  SELECT *, CAST(sum(n_tokens) OVER (
       |    PARTITION BY source ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM t)
       |SELECT source, (cum - n_tokens) // $PackCap AS bin,
       |  count(*)::BIGINT AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS tok_sum,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c
       |GROUP BY 1, 2
       |ORDER BY source, bin""".stripMargin
  }

  /** Fixed-SIZE stratified sample: exactly min(25, |stratum|) docs per
    * source, chosen by ranking the FULL md5 fingerprint (not the 2-char
    * admission prefix — 256 buckets would collapse the rank into a
    * doc_id-ordered pick inside the lowest bucket, biasing the sample
    * toward old ids) — the deterministic complement of the rate-based
    * ops above (those keep a fixed FRACTION; eval sets and per-source
    * quotas need a fixed COUNT). Unlike reservoir sampling this is
    * reproducible run-to-run and engine-portable; unlike rate sampling,
    * membership may legitimately shift when a stratum grows (a new doc
    * can out-rank an old member — inherent to any exact-n sample). At
    * 100 TB the rank-then-filter compiles to WindowGroupLimit
    * (plan-guarded): each partition keeps its local top-25 per source
    * BEFORE the shuffle, so the exchange carries ≤ 25·partitions rows
    * per stratum, not the stratum. */
  def qSampleStratified(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 25)
      .select("source", "rn", "doc_id")
      .orderBy("source", "rn")
  }

  private val qSampleStratifiedSql =
    s"""SELECT source, rn, doc_id FROM (
       |  SELECT source, doc_id,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= 25 ORDER BY source, rn""".stripMargin

  /** Temperature-scaled mixture sampling (α = 1/2): per-language
    * admission rate r_ℓ = √(n_min / n_ℓ), so the expected contribution
    * of language ℓ is ∝ √(n_min·n_ℓ) — the standard
    * temperature-flattening of a skewed size distribution (multilingual
    * training mixes resample with p_ℓ ∝ n_ℓ^α, α < 1, to keep
    * high-resource languages from drowning out low-resource ones; α =
    * 1/2 here, and this corpus IS skewed: en carries ~3× the docs of
    * fr). Unlike [[qSampleMix]]'s hand-set weights, the thresholds are
    * COMPUTED from the corpus: one count per language (a broadcast-size
    * dim joined back to the scan), t_ℓ = ⌊256·r_ℓ⌋ compared against the
    * md5 admission byte, so membership stays a pure function of
    * (doc_id, language counts) — reproducible, append-stable within a
    * snapshot, joinable. The arithmetic is portable by construction:
    * IEEE sqrt is correctly rounded in both engines, one multiply, one
    * floor — no accumulated float error. The smallest language (r = 1,
    * t = 256) admits everything via the t ≥ 256 disjunct, keeping the
    * hex comparison fixed-width. */
  def qSampleTemperature(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d).groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val dims = counts
      .crossJoin(broadcast(counts.agg(min(col("n_lang")).as("n_min"))))
      .select(
        col("lang"),
        col("n_lang"),
        floor(lit(256.0) * sqrt(col("n_min") / col("n_lang"))).cast("long").as("t"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), admitKey(col("doc_id")).as("admit_key"))
      .join(broadcast(dims), "lang")
      .filter(col("t") >= 256 || col("admit_key") < format_string("%02x", col("t")))
      .select("doc_id", "lang", "admit_key", "n_lang", "t")
      .orderBy("doc_id")
  }

  private val qSampleTemperatureSql =
    s"""WITH counts AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
       |dims AS (
       |  SELECT lang, n_lang,
       |    CAST(floor(256.0 * sqrt(n_lang_min / n_lang)) AS BIGINT) AS t
       |  FROM counts, (SELECT min(n_lang) AS n_lang_min FROM counts))
       |SELECT doc_id, lang, ${admitKeySql("doc_id")} AS admit_key, n_lang, t
       |FROM documents JOIN dims USING (lang)
       |WHERE t >= 256 OR ${admitKeySql("doc_id")} < printf('%02x', t)
       |ORDER BY doc_id""".stripMargin

  private val DsirBuckets = 512L

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * the log-likelihood ratio of a TARGET hashed-n-gram model over the
    * RAW-corpus model, so selection can prefer documents that look like
    * the target distribution. The published recipe, re-expressed with
    * this repo's engine-portable arithmetic:
    *
    *   - features: unigrams + bigrams of the shared tokenizer, hashed
    *     into [[DsirBuckets]] buckets via the portable md5-prefix integer
    *     (same conv/'0x' twin as the table checksum). Hashing makes the
    *     model size a CONSTANT (B counts), not vocabulary-sized;
    *   - target model: the `lang = 'en'` slice stands in for the
    *     held-out target corpus (Wikipedia/books in the paper). NB the
    *     synthetic corpus draws every language's text from ONE shared
    *     vocabulary, so on THIS data the lang slices are statistically
    *     indistinguishable and admission hovers near 50% — the oracle
    *     pins the arithmetic here, and the DISCRIMINATION claim is
    *     pinned by the planted two-vocabulary spec in ExtrasSpec, which
    *     drives [[dsirVotes]] directly;
    *   - score: a per-gram VOTE — the integer-exact surrogate for the
    *     paper's summed log-ratio. Each gram instance votes +1 iff its
    *     bucket's target share beats the corpus-average target share
    *     (p_tgt(b)/p_raw(b) > N_tgt/N_raw ⟺ c_tgt·N_raw > c_raw·N_tgt,
    *     cross-multiplied in DECIMAL(38,0) so the products cannot wrap
    *     at any SF — c·N reaches ~10²⁸ at 100 TB), −1 iff strictly
    *     below, 0 on ties. Summing signs instead of magnitudes loses
    *     only the per-gram weighting of the log-ratio; the whole-bit
    *     ⌊log₂⌋ magnitude (the [[TextOps.qSurprisal]] device) measured
    *     too coarse here — with target ⊂ raw every per-gram bit-diff is
    *     ≤ 0 and the constant corpus term only returns ~1 bit, so
    *     quantization swallowed the entire signal;
    *   - admission: `score_votes > 0` (a majority of the document's
    *     features are target-typical) — the deterministic gate standing
    *     in for the paper's Gumbel resampling draw (which is RNG by
    *     construction; a hash-seeded Gumbel would just be
    *     [[qSampleMix]]'s admission key again).
    *
    * 100 TB shape: this is fit-then-score. The fit is one explode scan
    * collapsed to ≤ B rows (combiner-backed count + conditional count —
    * shuffles B rows per task, nothing more); the score pass re-joins
    * grams to the B-row stats table — Spark broadcasts it (plan-guarded
    * in ExtrasSpec), so the scoring join is shuffle-free and the only
    * wide op is the per-doc rollup. At production scale the fit pass
    * runs once on a sample and the B counts persist as a tiny artifact;
    * the score pass is then a single scan over the 100 TB. */
  def qDsirScore(s: SparkSession, d: String): DataFrame =
    dsirVotes(Tables.documents(s, d), col("lang") === "en")

  /** The fit-and-vote core of [[qDsirScore]], over ANY corpus carrying
    * `doc_id`/`text` and any target predicate — factored out so the
    * planted-vocabulary spec can drive the same plan the corpus query
    * runs. */
  /** Overlapping bigrams of an already-bound tokens column — shared by
    * the batch scorer and the streaming gate so the feature definition
    * cannot drift between fit and serve. */
  private[graft] def dsirBigrams(t: Column): Column =
    when(
      size(t) >= 2,
      transform(
        sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** The portable bucket hash of one gram (md5-prefix integer mod B —
    * the shared [[graft.functions.PortableHash]] convention). The
    * 8-hex-digit prefix is nonnegative, so buckets land in
    * [0, [[DsirBuckets]]). */
  private[graft] def dsirBucket(g: Column): Column =
    graft.functions.PortableHash.md5PrefixLong(g, 8) % DsirBuckets

  /** [[dsirVoteMap]]'s sparse map as a DENSE bucket-indexed vector
    * (unseen buckets vote 0 — the batch rule's tie case). Serving
    * should embed THIS as its literal: `element_at` on an array literal
    * is O(1) positional indexing, where a map literal pays a linear
    * key scan on every lookup (Catalyst's GetMapValue) — ~B compares
    * per gram, per document, at streaming rates. */
  private[graft] def denseVoteArr(votes: Map[Long, Long]): Seq[Long] =
    (0L until DsirBuckets).map(b => votes.getOrElse(b, 0L))

  private[operators] def dsirVotes(docs: DataFrame, isTarget: Column): DataFrame = {
    val t = col("t")
    val grams = docs
      .select(
        col("doc_id"),
        isTarget.as("tgt"),
        graft.functions.NativeExprs.tokens(col("text")).as("t"))
      .select(col("doc_id"), col("tgt"), explode(concat(t, dsirBigrams(t))).as("g"))
      .select(col("doc_id"), col("tgt"), dsirBucket(col("g")).as("b"))
      // BOTH the fit aggregate and the score join read the gram stream;
      // caching halves the tokenize+md5 work (the query's actual cost).
      // At 100 TB the fit runs once on a sample and persists instead.
      .cache()
    val stats = grams
      .groupBy("b")
      .agg(
        count(lit(1)).as("c_raw"),
        count(when(col("tgt"), 1)).as("c_tgt"))
    val totals = stats.agg(sum("c_raw").as("n_raw"), sum("c_tgt").as("n_tgt"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val lhs = dec(col("c_tgt")) * dec(col("n_raw"))
    val rhs = dec(col("c_raw")) * dec(col("n_tgt"))
    grams
      .join(broadcast(stats), "b")
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        count(when(lhs > rhs, 1)).as("n_pos"),
        count(when(lhs < rhs, 1)).as("n_neg"))
      .select(
        col("doc_id"),
        col("n_grams"),
        col("n_pos"),
        col("n_neg"),
        (col("n_pos") - col("n_neg")).as("score_votes"))
      .withColumn("admitted", when(col("score_votes") > 0, 1L).otherwise(0L))
      .orderBy("doc_id")
  }

  /** Fit [[dsirVotes]]' bucket model and collapse it to the per-bucket
    * vote SIGN — a ≤ B-entry serving artifact. This is the "fit offline,
    * serve online" split: the signs are everything the scoring rule
    * needs (the cross-multiplied share comparison is per-bucket, not
    * per-doc), so a gate can embed them as a literal map in a pure
    * projection — no join, no shuffle, stream-safe
    * ([[graft.streaming.StreamingDedup.dsirAdmit]]). The collect is
    * bounded by construction at B = [[DsirBuckets]] rows. */
  private[graft] def dsirVoteMap(docs: DataFrame, isTarget: Column): Map[Long, Long] = {
    val t = col("t")
    val grams = docs
      .select(isTarget.as("tgt"), graft.functions.NativeExprs.tokens(col("text")).as("t"))
      .select(col("tgt"), explode(concat(t, dsirBigrams(t))).as("g"))
      .select(col("tgt"), dsirBucket(col("g")).as("b"))
    val stats = grams
      .groupBy("b")
      .agg(count(lit(1)).as("c_raw"), count(when(col("tgt"), 1)).as("c_tgt"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    stats
      .crossJoin(broadcast(stats.agg(sum("c_raw").as("n_raw"), sum("c_tgt").as("n_tgt"))))
      .select(
        col("b"),
        signum(dec(col("c_tgt")) * dec(col("n_raw")) - dec(col("c_raw")) * dec(col("n_tgt")))
          .cast("long")
          .as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  private val qDsirScoreSql = {
    val t = graft.operators.TextOps.tokensSql
    s"""WITH tk AS (
       |  SELECT doc_id, lang = 'en' AS tgt, $t AS t FROM documents),
       |uni AS (SELECT doc_id, tgt, unnest(t) AS g FROM tk),
       |big AS (
       |  SELECT doc_id, tgt, t[i.i] || ' ' || t[i.i + 1] AS g
       |  FROM tk, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) i
       |  WHERE len(t) >= 2),
       |g AS (
       |  SELECT doc_id, tgt,
       |    ${graft.functions.PortableHash.md5PrefixLongSql("g", 8)} % $DsirBuckets AS b
       |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
       |stats AS (
       |  SELECT b, count(*) AS c_raw, count(*) FILTER (WHERE tgt) AS c_tgt
       |  FROM g GROUP BY 1),
       |tot AS (SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt FROM stats),
       |scored AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_grams,
       |    count(*) FILTER (WHERE c_tgt::HUGEINT * n_raw > c_raw::HUGEINT * n_tgt)::BIGINT
       |      AS n_pos,
       |    count(*) FILTER (WHERE c_tgt::HUGEINT * n_raw < c_raw::HUGEINT * n_tgt)::BIGINT
       |      AS n_neg
       |  FROM g JOIN stats USING (b), tot GROUP BY 1)
       |SELECT doc_id, n_grams, n_pos, n_neg,
       |  (n_pos - n_neg)::BIGINT AS score_votes,
       |  CASE WHEN n_pos > n_neg THEN 1::BIGINT ELSE 0::BIGINT END AS admitted
       |FROM scored
       |ORDER BY doc_id""".stripMargin
  }

  /** Global token budget apportioned across sources. */
  private[operators] val MixturePlanBudget = 1000000L

  /** Mixture planning by largest-remainder (Hamilton) apportionment: split
    * a global token budget across sources proportionally to their
    * available tokens, in EXACT integers that sum to the budget —
    * quota_i = ⌊B·avail_i/Σ⌋ plus one extra token for the k sources with
    * the largest remainders (B·avail_i mod Σ; tie → source name), where
    * k = B − Σ⌊·⌋. Plain proportional flooring under-allocates by up to
    * (#sources−1) tokens and the naive fix (round half up) can OVERSHOOT
    * the budget; largest-remainder is the standard apportionment that
    * does neither ([[SamplingSpec]] pins Σquota = B exactly). This emits
    * the RECIPE a mixing run then enforces per source with the
    * [[qTokenBudget]] cut.
    *
    * Scale shape: one combiner-backed per-source aggregate; everything
    * after runs on #sources rows (the 1-row total broadcast-crossed, one
    * window over the tiny recipe table). B·avail_i needs DECIMAL(38) once
    * B·Σtokens passes ~9·10¹⁸ (B=10⁶ × 10¹³-token corpus) — same swap,
    * same plan. */
  def qMixturePlan(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("source"))
    val avail = Tables.documents(s, d)
      .select(
        col("source"),
        size(graft.functions.NativeExprs.tokens(col("text"))).cast("long").as("n"))
      .groupBy("source")
      .agg(sum("n").as("avail_tokens"))
    val tot = avail.agg(sum("avail_tokens").as("tot"))
    val based = avail.crossJoin(broadcast(tot))
      .select(
        col("source"),
        col("avail_tokens"),
        expr(s"($MixturePlanBudget * avail_tokens) div tot").as("base"),
        expr(s"($MixturePlanBudget * avail_tokens) % tot").as("rem"))
    based
      .withColumn("short", lit(MixturePlanBudget) - sum("base").over())
      .withColumn("rk", row_number().over(w).cast("long"))
      .select(
        col("source"),
        col("avail_tokens"),
        (col("base") + when(col("rk") <= col("short"), 1L).otherwise(0L))
          .as("quota_tokens"))
      .orderBy("source")
  }

  private val qMixturePlanSql = {
    val t = graft.operators.TextOps.tokensSql
    s"""WITH avail AS (
       |  SELECT source, sum(len($t))::BIGINT AS avail_tokens
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT sum(avail_tokens)::BIGINT AS tot FROM avail),
       |based AS (
       |  SELECT source, avail_tokens,
       |    ($MixturePlanBudget * avail_tokens) // tot AS base,
       |    ($MixturePlanBudget * avail_tokens) % tot AS rem
       |  FROM avail, tot),
       |ranked AS (
       |  SELECT *,
       |    $MixturePlanBudget - sum(base) OVER () AS short,
       |    row_number() OVER (ORDER BY rem DESC, source) AS rk
       |  FROM based)
       |SELECT source, avail_tokens,
       |  (base + CASE WHEN rk <= short THEN 1 ELSE 0 END)::BIGINT AS quota_tokens
       |FROM ranked ORDER BY source""".stripMargin
  }

  private val EpochBudget = 5000000L

  /** Data-constrained EPOCH PLANNING (the Muennighoff et al. 2023,
    * arXiv:2305.16264 regime): the training token budget EXCEEDS the
    * unique-token supply, so sources must repeat — the question is how
    * many epochs of each. Targets are apportioned over w_i·avail_i by
    * the same largest-remainder rule as [[qMixturePlan]] (weights mirror
    * the mixture-sampling tiers: low-rate sources 1, mid 4, rest 6), and
    * each source's target splits into full epochs (target div avail),
    * the partial-epoch tail (target mod avail — admitted by the
    * deterministic hash order of [[qTokenBudget]] at execution time),
    * and the effective epoch count in exact milli-epochs. Σ target =
    * budget exactly; everything is replayable integer arithmetic.
    *
    * Scale shape: identical to the mixture plan — one combiner-backed
    * per-source aggregate, then #sources-row arithmetic. */
  def qEpochPlan(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("source"))
    val weight =
      when(col("source").isin(lowSources.map(_.asInstanceOf[Any]): _*), lit(1L))
        .when(col("source").isin(midSources.map(_.asInstanceOf[Any]): _*), lit(4L))
        .otherwise(lit(6L))
    val avail = Tables.documents(s, d)
      .select(
        col("source"),
        size(graft.functions.NativeExprs.tokens(col("text"))).cast("long").as("n"))
      .groupBy("source")
      .agg(sum("n").as("avail_tokens"))
      .withColumn("wt", weight)
    val tot = avail.agg(sum(expr("wt * avail_tokens")).as("tot"))
    avail.crossJoin(broadcast(tot))
      .select(
        col("source"), col("avail_tokens"), col("wt"),
        expr(s"($EpochBudget * wt * avail_tokens) div tot").as("base"),
        expr(s"($EpochBudget * wt * avail_tokens) % tot").as("rem"))
      .withColumn("short", lit(EpochBudget) - sum("base").over())
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn(
        "target_tokens",
        col("base") + when(col("rk") <= col("short"), 1L).otherwise(0L))
      .select(
        col("source"), col("avail_tokens"), col("wt"), col("target_tokens"),
        expr("target_tokens div avail_tokens").as("full_epochs"),
        expr("target_tokens % avail_tokens").as("tail_tokens"),
        expr("target_tokens * 1000 div avail_tokens").as("epochs_milli"))
      .orderBy("source")
  }

  private val qEpochPlanSql = {
    val t = graft.operators.TextOps.tokensSql
    def inList(ws: Seq[String]) = ws.mkString("('", "', '", "')")
    val wt = s"CASE WHEN source IN ${inList(lowSources)} THEN 1 " +
      s"WHEN source IN ${inList(midSources)} THEN 4 ELSE 6 END"
    s"""WITH avail AS (
       |  SELECT source, sum(len($t))::BIGINT AS avail_tokens, $wt::BIGINT AS wt
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT sum(wt * avail_tokens)::BIGINT AS tot FROM avail),
       |based AS (
       |  SELECT source, avail_tokens, wt,
       |    ($EpochBudget * wt * avail_tokens) // tot AS base,
       |    ($EpochBudget * wt * avail_tokens) % tot AS rem
       |  FROM avail, tot),
       |ranked AS (
       |  SELECT *,
       |    $EpochBudget - sum(base) OVER () AS short,
       |    row_number() OVER (ORDER BY rem DESC, source) AS rk
       |  FROM based),
       |tgt AS (
       |  SELECT source, avail_tokens, wt,
       |    (base + CASE WHEN rk <= short THEN 1 ELSE 0 END)::BIGINT AS target_tokens
       |  FROM ranked)
       |SELECT source, avail_tokens, wt, target_tokens,
       |  (target_tokens // avail_tokens)::BIGINT AS full_epochs,
       |  (target_tokens % avail_tokens)::BIGINT AS tail_tokens,
       |  (target_tokens * 1000 // avail_tokens)::BIGINT AS epochs_milli
       |FROM tgt ORDER BY source""".stripMargin
  }

  private[operators] val NumShards = 16L
  private val ShardSalts = 64L

  /** Token-balanced shard planning — the writer-side step that turns a
    * cleaned corpus into evenly-sized training shards: rank every
    * document by (n_tokens DESC, tie-break), assign
    * shard = (rank−1) mod [[NumShards]]. Longest-first round-robin keeps
    * every shard's token mass within one maximal document of every
    * other's (each round of S consecutive ranks deals S near-equal
    * sizes) — the classic LPT-style guarantee, asserted by
    * SamplingSpec's balance property.
    *
    * The global rank is computed WITHOUT a global row window: a value
    * histogram over ([[ShardSalts]]-salted) distinct token counts gives
    * each (count, salt) class its exclusive higher-rank offset via a
    * window over the ≤|token-count domain|·64-row histogram (the
    * quartileBounds bounded-domain argument), and within a class
    * row_number partitions by (n_tokens, salt) — the salt caps class
    * width at ~1/64 of a token-count mode, so no window partition can
    * become a hub even when half the corpus shares one length. Docs then
    * broadcast-join the tiny offsets table. Rank order is
    * (n_tokens DESC, salt, doc_id) — any deterministic total order
    * yields the same balance; the oracle replays this one. At 100 TB the
    * shuffles carry (doc_id, n_tokens) pairs and the only global object
    * is the histogram. */
  /** Per-document shard assignment — the salted-histogram-rank mechanism
    * [[qShardPlan]] aggregates and [[Dedup.qCorpusBuild]] writes with:
    * input must carry (doc_id, n_tokens); output adds `shard`. */
  private[operators] def shardAssign(t0: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val t = t0.withColumn("salt", pmod(col("doc_id"), lit(ShardSalts)))
    val offsets = t
      .groupBy("n_tokens", "salt")
      .agg(count(lit(1)).as("cnt"))
      .withColumn(
        "off",
        coalesce(
          sum("cnt").over(
            w.orderBy(col("n_tokens").desc, col("salt"))
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("cnt")
    t.join(broadcast(offsets), Seq("n_tokens", "salt"))
      .withColumn(
        "rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("n_tokens", "salt").orderBy("doc_id")))
      .withColumn("shard", pmod(col("off") + col("rn") - 1, lit(NumShards)))
      .drop("salt", "off", "rn")
  }

  def qShardPlan(s: SparkSession, d: String): DataFrame =
    shardAssign(
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(graft.functions.NativeExprs.tokens(col("text"))).cast("long").as("n_tokens")))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tok_sum"))
      .orderBy("shard")

  private val qShardPlanSql = {
    val t = graft.operators.TextOps.tokensSql
    s"""WITH t AS (
       |  SELECT doc_id, len($t)::BIGINT AS n_tokens, doc_id % $ShardSalts AS salt
       |  FROM documents),
       |r AS (
       |  SELECT n_tokens,
       |    (row_number() OVER (ORDER BY n_tokens DESC, salt, doc_id) - 1) % $NumShards
       |      AS shard
       |  FROM t)
       |SELECT shard::BIGINT AS shard, count(*)::BIGINT AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS tok_sum
       |FROM r GROUP BY 1 ORDER BY shard""".stripMargin
  }

  // ------------------------------------------- approximate query processing

  /** AQP sum estimation — answer an aggregate from a 1% hash sample, with
    * the error bound computed alongside: per return flag, the exact cents
    * sum, the Horvitz–Thompson estimate 100·Σ_sample (unbiased under the
    * 1/100 hash inclusion rule), the realized error in ppm, and a
    * two-sigma verdict from the POISSON-SAMPLING variance estimator
    * V̂ = (1−p)/p² · Σ_sample x² = 9900·Σ_s x², checked as one exact
    * integer comparison (est−exact)² ≤ 4·V̂ — no square root, no floats.
    * This is the "scan 1% of the corpus, answer with a CI" capability an
    * interactive layer offers at 100 TB; the exact side exists here as
    * the verifier (in production you'd never run it — that's the point).
    *
    * The inclusion key hashes the full physical row identity
    * (orderkey|linenumber|partkey|suppkey) so the sample is replayable
    * by any engine and stable under appends — the same property the
    * mixture sampler above gets from its doc_id prefix rule.
    *
    * Scale shape: one scan with the sample's contributions aggregated
    * conditionally alongside the exact ones (here; the production form
    * scans ONLY the sample partition), map-side combine throughout,
    * flags-sized output. Σx² rides DECIMAL(38,0): cents² ≈ 10¹⁴/row
    * caps BIGINT near 10⁵ sampled rows. */
  def qAqpSum(s: SparkSession, d: String): DataFrame = {
    import graft.functions.PortableHash.md5PrefixLong
    import graft.functions.PortableRound.asScaled
    val li = Tables.lineitem(s, d)
      .select(
        col("l_returnflag").as("flag"),
        asScaled(col("l_extendedprice"), 2).as("cents"),
        (md5PrefixLong(
          concat_ws("|", lit("aqp"), col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")),
          10) % 100 === 0).as("in_sample"))
    li.groupBy("flag")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sample"),
        sum("cents").as("exact_cents"),
        (sum(when(col("in_sample"), col("cents")).otherwise(0L)) * 100)
          .as("est_cents"),
        sum(when(col("in_sample"),
          col("cents").cast("decimal(38,0)") * col("cents")).otherwise(lit(0)))
          .as("ssq"))
      .select(
        col("flag"), col("n_rows"), col("n_sample"), col("exact_cents"),
        col("est_cents"),
        expr("(abs(est_cents - exact_cents) * 1000000) div exact_cents")
          .as("err_ppm"),
        when(
          (col("est_cents") - col("exact_cents")).cast("decimal(38,0)")
            * (col("est_cents") - col("exact_cents")) <=
            lit(4) * lit(9900) * col("ssq"),
          1L).otherwise(0L).as("two_sigma_ok"))
      .orderBy("flag")
  }

  private val qAqpSumSql = {
    val h = graft.functions.PortableHash.md5PrefixLongSql(
      "'aqp' || '|' || l_orderkey || '|' || l_linenumber || '|' || l_partkey || '|' || l_suppkey",
      10)
    val cents = graft.functions.PortableRound.asScaledSql("l_extendedprice", 2)
    s"""WITH li AS (
       |  SELECT l_returnflag AS flag, $cents AS cents,
       |    (($h) % 100 = 0) AS in_sample
       |  FROM lineitem),
       |a AS (
       |  SELECT flag, count(*)::BIGINT AS n_rows,
       |    count(*) FILTER (WHERE in_sample)::BIGINT AS n_sample,
       |    sum(cents)::BIGINT AS exact_cents,
       |    (sum(cents) FILTER (WHERE in_sample) * 100)::BIGINT AS est_cents,
       |    COALESCE(sum(CAST(cents AS HUGEINT) * cents) FILTER (WHERE in_sample), 0)
       |      AS ssq
       |  FROM li GROUP BY 1)
       |SELECT flag, n_rows, n_sample, exact_cents, est_cents,
       |  (abs(est_cents - exact_cents) * 1000000) // exact_cents AS err_ppm,
       |  CAST(CASE WHEN CAST(est_cents - exact_cents AS HUGEINT)
       |      * (est_cents - exact_cents) <= 4 * 9900 * ssq
       |    THEN 1 ELSE 0 END AS BIGINT) AS two_sigma_ok
       |FROM a ORDER BY flag""".stripMargin
  }

  /** AQP join estimation by UNIVERSE sampling — the correlated-sampling
    * trick: sampling each side INDEPENDENTLY at rate p keeps only p² of
    * the join output and biases per-key fanout; sampling the join-KEY
    * UNIVERSE (admit a key iff hash(key) lands in the 1/16 bucket, SAME
    * rule on both sides) keeps every matching pair whose key is admitted
    * — an exactly-p sample OF THE JOIN with per-key structure intact, so
    * est = 16·|sample join| is unbiased per group. Per order priority:
    * exact join cardinality, the universe estimate, realized error ppm.
    *
    * Scale shape: both sides filter BEFORE the shuffle (the hash rule is
    * a pushed row-local predicate — 1/16 of each table moves), the
    * sampled join is 1/16 of the real one, and the exact twin runs here
    * only as verifier. */
  def qAqpJoin(s: SparkSession, d: String): DataFrame = {
    import graft.functions.PortableHash.md5PrefixLong
    def inU(k: Column): Column =
      md5PrefixLong(concat(lit("aqpu:"), k), 10) % 16 === 0
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority").as("priority"))
    val li = Tables.lineitem(s, d).select(col("l_orderkey"))
    val exact = ord.join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("priority").agg(count(lit(1)).as("exact_rows"))
    val est = ord.filter(inU(col("o_orderkey")))
      .join(li.filter(inU(col("l_orderkey"))), col("o_orderkey") === col("l_orderkey"))
      .groupBy("priority").agg((count(lit(1)) * 16).as("est_rows"))
    exact.join(est, Seq("priority"), "left")
      .select(
        col("priority"), col("exact_rows"),
        coalesce(col("est_rows"), lit(0L)).as("est_rows"))
      .withColumn(
        "err_ppm",
        expr("(abs(est_rows - exact_rows) * 1000000) div exact_rows"))
      .orderBy("priority")
  }

  private val qAqpJoinSql = {
    def h(e: String) =
      graft.functions.PortableHash.md5PrefixLongSql(s"'aqpu:' || $e", 10) + " % 16 = 0"
    s"""WITH exact AS (
       |  SELECT o.o_orderpriority AS priority, count(*)::BIGINT AS exact_rows
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |  GROUP BY 1),
       |est AS (
       |  SELECT o.o_orderpriority AS priority, (count(*) * 16)::BIGINT AS est_rows
       |  FROM (SELECT * FROM orders WHERE ${h("o_orderkey")}) o
       |  JOIN (SELECT * FROM lineitem WHERE ${h("l_orderkey")}) l
       |    ON o.o_orderkey = l.l_orderkey
       |  GROUP BY 1)
       |SELECT exact.priority, exact.exact_rows,
       |  COALESCE(est.est_rows, 0)::BIGINT AS est_rows,
       |  (abs(COALESCE(est.est_rows, 0) - exact.exact_rows) * 1000000)
       |    // exact.exact_rows AS err_ppm
       |FROM exact LEFT JOIN est ON exact.priority = est.priority
       |ORDER BY exact.priority""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("q_aqp_sum", qAqpSum, Some(qAqpSumSql)),
    Q("q_aqp_join", qAqpJoin, Some(qAqpJoinSql)),
    Q("q_sample_mix", qSampleMix, Some(qSampleMixSql)),
    Q("q_shard_plan", qShardPlan, Some(qShardPlanSql)),
    Q("q_mixture_plan", qMixturePlan, Some(qMixturePlanSql)),
    Q("q_epoch_plan", qEpochPlan, Some(qEpochPlanSql)),
    Q("q_dsir_score", qDsirScore, Some(qDsirScoreSql)),
    Q("q_sample_temperature", qSampleTemperature, Some(qSampleTemperatureSql)),
    Q("q_sample_stratified", qSampleStratified, Some(qSampleStratifiedSql)),
    Q("q_sample_split", qSampleSplit, Some(qSampleSplitSql)),
    Q("q_token_budget", qTokenBudget, Some(qTokenBudgetSql)),
    Q("q_pack_sequences", qPackSequences, Some(qPackSequencesSql)))
}
