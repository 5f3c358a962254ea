package graft.operators

import graft.{Q, Tables}
import graft.functions.PortableHash.{md5PrefixLong, md5PrefixLongSql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evaluation & audit pack: the measurement half of a training-data
  * pipeline — classifier evaluation (nearest-centroid predictions →
  * confusion matrix → per-label precision/recall/F1), a data-contract
  * audit over the star schema, boolean retrieval over the stored postings
  * index, and a deterministic A/B significance test.
  *
  * The reference's MapReduce core (SURVEY.md §2.1) has no evaluation
  * surface at all — these are the jobs its users would bolt on as opaque
  * binaries. House rule throughout: every compared column is an exact
  * BIGINT (counts, ppm ratios via integer division, fixed-point
  * micro-units), so the DuckDB oracle hash-matches bit-for-bit and no
  * float summation order can flip a digit.
  */
object Evaluation {

  // ------------------------------------------------- nearest-centroid eval

  /** Fixed-point offset added to every micro-scaled embedding value so the
    * integer centroid mean divides NON-NEGATIVE numbers: Spark's `div`
    * truncates toward zero while DuckDB's `//` floors, and the two agree
    * only on non-negative operands (the q_k_anonymity lesson). Safe for
    * any |value| < 4.19 — far above this corpus's [-0.58, 0.52] range —
    * and it cancels exactly in every distance: (q+OFF)−(c+OFF) = q−c. */
  private val CentroidOff = 1L << 22

  /** Exact integer squared L2 distance of every vector to every class
    * centroid — the shared (vec_id, label_true, label, d2) scoring table
    * the prediction argmin AND the calibration margins both read. Class
    * prototype = per-dimension integer mean of the micro-scaled
    * (⌊v·10⁶+0.5⌋) vectors (the evaluation twin of
    * [[Similarity.qEmbedCentroids]]'s pooling). Everything after the
    * initial scaling is integer arithmetic, so Spark and DuckDB cannot
    * diverge on a single distance — unlike cosine-to-a-float-mean, where
    * partitioned float summation makes near-ties engine-dependent.
    *
    * Scale shape: the flattened view is cached (it feeds both the
    * centroid fit and the distance join); centroids are nlabels×dim rows
    * (640 here) and BROADCAST, so scoring is an exchange-free map-side
    * join whose output (n·nlabels rows after the per-vec partial
    * aggregate) is the only shuffle. Train-set eval, deliberately: the
    * leave-one-out correction would need a per-vector centroid. At 100 TB
    * the per-dim sums outgrow BIGINT past ~10¹² vectors — swap the sum
    * accumulator to DECIMAL(38,0), same plan. */
  private[operators] def centroidDistancesFrom(emb: DataFrame): DataFrame = {
    val x = emb
      .select(
        col("vec_id"),
        col("label").cast("long").as("label_true"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
      .select(
        col("vec_id"),
        col("label_true"),
        col("pos"),
        (floor(col("v") * 1e6 + 0.5).cast("long") + CentroidOff).as("q"))
      .cache()
    val cents = x
      .groupBy(col("label_true").as("label"), col("pos"))
      .agg(sum("q").as("sq"), count(lit(1)).as("nc"))
      .select(col("label"), col("pos"), expr("sq div nc").as("c"))
    x.join(broadcast(cents), "pos")
      .groupBy("vec_id", "label_true", "label")
      .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("d2"))
  }

  /** Nearest-centroid predictions: argmin of the exact integer squared L2
    * distance over [[centroidDistancesFrom]] (tie → smaller label). */
  private[operators] def centroidPredictionsFrom(emb: DataFrame): DataFrame =
    centroidDistancesFrom(emb)
      .groupBy("vec_id", "label_true")
      .agg(min(struct(col("d2"), col("label"))).as("m"))
      .select(col("vec_id"), col("label_true"), col("m.label").as("label_pred"))

  /** Shared DuckDB CTE prefix replaying [[centroidPredictionsFrom]]
    * (x/c/d/p: p has (vec_id, label_true, label_pred)). The argmin is a
    * row_number over (d2, label) — a different evaluation order than
    * Spark's struct-min, same total order. */
  private val centroidPredSqlCtes =
    s"""x AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label_true,
       |    CAST(i - 1 AS BIGINT) AS pos,
       |    CAST(floor(embedding[i]::DOUBLE * 1000000 + 0.5) AS BIGINT) + $CentroidOff AS q
       |  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g),
       |c AS (
       |  SELECT label_true AS label, pos,
       |    CAST(sum(q) AS BIGINT) // count(*) AS c
       |  FROM x GROUP BY 1, 2),
       |d AS (
       |  SELECT x.vec_id, x.label_true, c.label,
       |    sum((x.q - c.c) * (x.q - c.c)) AS d2
       |  FROM x JOIN c USING (pos) GROUP BY 1, 2, 3),
       |p AS (
       |  SELECT vec_id, label_true, label AS label_pred
       |  FROM (SELECT vec_id, label_true, label,
       |          row_number() OVER (PARTITION BY vec_id ORDER BY d2, label) AS rn
       |        FROM d)
       |  WHERE rn = 1)""".stripMargin

  /** Confusion matrix of the nearest-centroid classifier — counts per
    * (true, predicted) label pair. The data-quality dashboard's "is the
    * label column coherent with the embedding space" card. */
  def qCentroidConfusion(s: SparkSession, d: String): DataFrame =
    centroidPredictionsFrom(Tables.embeddings(s, d))
      .groupBy("label_true", "label_pred")
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("label_true", "label_pred")

  private val qCentroidConfusionSql =
    s"""WITH $centroidPredSqlCtes
       |SELECT label_true, label_pred, count(*)::BIGINT AS n_vecs
       |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Per-label precision / recall / F1 in exact ppm from the confusion
    * matrix: tp = diagonal, fp = column total − tp, fn = row total − tp;
    * precision = tp·10⁶ div (tp+fp), recall = tp·10⁶ div (tp+fn),
    * F1 = 2·tp·10⁶ div (2·tp+fp+fn) — the harmonic mean computed from
    * raw counts in ONE integer division (never from the already-rounded
    * ppm ratios, which would compound rounding). The `greatest(·,1)`
    * floor makes a never-predicted label score 0 instead of erroring.
    * Label universe = labels with support (every fp label also appears
    * as some row's true label here; a label predicted but absent from
    * truth would need the outer-join variant). */
  def qClassifierMetrics(s: SparkSession, d: String): DataFrame = {
    val m = centroidPredictionsFrom(Tables.embeddings(s, d))
      .groupBy("label_true", "label_pred")
      .agg(count(lit(1)).as("n"))
      .cache()
    val rows = m.groupBy(col("label_true").as("label")).agg(sum("n").as("support"))
    val cols = m.groupBy(col("label_pred").as("label")).agg(sum("n").as("predicted"))
    val tps = m
      .filter(col("label_true") === col("label_pred"))
      .select(col("label_true").as("label"), col("n").as("tp"))
    rows
      .join(cols, Seq("label"), "left")
      .join(tps, Seq("label"), "left")
      .select(
        col("label"),
        col("support"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("predicted"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (col("support") - coalesce(col("tp"), lit(0L))).as("fn"))
      .withColumn("precision_ppm", expr("(tp * 1000000) div greatest(tp + fp, 1)"))
      .withColumn("recall_ppm", expr("(tp * 1000000) div greatest(tp + fn, 1)"))
      .withColumn("f1_ppm", expr("(2 * tp * 1000000) div greatest(2 * tp + fp + fn, 1)"))
      .orderBy("label")
  }

  private val qClassifierMetricsSql =
    s"""WITH $centroidPredSqlCtes,
       |m AS (SELECT label_true, label_pred, count(*)::BIGINT AS n FROM p GROUP BY 1, 2),
       |r AS (SELECT label_true AS label, sum(n)::BIGINT AS support FROM m GROUP BY 1),
       |cl AS (SELECT label_pred AS label, sum(n)::BIGINT AS predicted FROM m GROUP BY 1),
       |tp AS (SELECT label_true AS label, n AS tp FROM m WHERE label_true = label_pred),
       |j AS (
       |  SELECT r.label, r.support, COALESCE(tp.tp, 0)::BIGINT AS tp,
       |    (COALESCE(cl.predicted, 0) - COALESCE(tp.tp, 0))::BIGINT AS fp,
       |    (r.support - COALESCE(tp.tp, 0))::BIGINT AS fn
       |  FROM r LEFT JOIN cl USING (label) LEFT JOIN tp USING (label))
       |SELECT label, support, tp, fp, fn,
       |  (tp * 1000000) // greatest(tp + fp, 1) AS precision_ppm,
       |  (tp * 1000000) // greatest(tp + fn, 1) AS recall_ppm,
       |  (2 * tp * 1000000) // greatest(2 * tp + fp + fn, 1) AS f1_ppm
       |FROM j ORDER BY label""".stripMargin

  /** Calibration / reliability table for the nearest-centroid classifier:
    * per-vector CONFIDENCE = the relative margin between the best and
    * second-best centroid distance (margin_pm = (d₂−d₁)·1000 div d₂ — 0
    * for a coin-flip tie, →1000 when the winner is unambiguous), binned
    * at 10-permille width with everything ≥ 90‰ in the top bin — this
    * near-centroid-equidistant corpus concentrates margins under 100‰
    * (sf0.01 median 16‰), so full-range deciles would collapse the table
    * to one row; per bin, the empirical accuracy in exact ppm. A
    * trustworthy quality classifier shows accuracy rising monotonically
    * with margin — the card a pipeline checks before using classifier
    * scores as sampling weights (the reliability-diagram / ECE audit,
    * margin-based since the centroid model emits distances, not
    * probabilities).
    *
    * Everything after the micro-scaling is integer arithmetic. Overflow
    * envelope: d2 ≤ dim·(2·1.2·10⁶)² ≈ 3.7·10¹⁴, so the ·1000 margin
    * numerator peaks at ~3.7·10¹⁷ < 2⁶³; a ppm margin would overflow,
    * hence permille. The rank-2 window is partitioned by vec_id (≤ nlabels
    * rows per partition — no global window at any corpus size), and the
    * margin arithmetic rides the same broadcast-join scoring table as the
    * confusion matrix: one shuffle of n·nlabels partial d2 aggregates,
    * then a bins-sized result. */
  def qCalibration(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("label"))
    val top2 = centroidDistancesFrom(Tables.embeddings(s, d))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy("vec_id", "label_true")
      .agg(
        max(when(col("rn") === 1, col("label"))).as("label_pred"),
        max(when(col("rn") === 1, col("d2"))).as("d1"),
        max(when(col("rn") === 2, col("d2"))).as("dd2"))
    top2
      .select(
        expr("((coalesce(dd2, d1) - d1) * 1000) div greatest(coalesce(dd2, d1), 1)")
          .as("margin_pm"),
        when(col("label_pred") === col("label_true"), 1L).otherwise(0L).as("ok"))
      .groupBy(least(expr("margin_pm div 10"), lit(9L)).as("bin"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum("ok").as("n_correct"),
        expr("(sum(ok) * 1000000) div count(1)").as("acc_ppm"),
        sum("margin_pm").as("sum_margin_pm"))
      .orderBy("bin")
  }

  private val qCalibrationSql =
    s"""WITH $centroidPredSqlCtes,
       |r AS (
       |  SELECT vec_id, label_true, label, d2,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, label) AS rn
       |  FROM d),
       |t AS (
       |  SELECT vec_id, label_true,
       |    max(CASE WHEN rn = 1 THEN label END) AS label_pred,
       |    max(CASE WHEN rn = 1 THEN d2 END) AS d1,
       |    max(CASE WHEN rn = 2 THEN d2 END) AS dd2
       |  FROM r WHERE rn <= 2 GROUP BY 1, 2),
       |b AS (
       |  SELECT ((COALESCE(dd2, d1) - d1) * 1000) // greatest(COALESCE(dd2, d1), 1)
       |           AS margin_pm,
       |         CASE WHEN label_pred = label_true THEN 1 ELSE 0 END AS ok
       |  FROM t)
       |SELECT least(margin_pm // 10, 9)::BIGINT AS bin,
       |  count(*)::BIGINT AS n_vecs, sum(ok)::BIGINT AS n_correct,
       |  ((sum(ok) * 1000000) // count(*))::BIGINT AS acc_ppm,
       |  sum(margin_pm)::BIGINT AS sum_margin_pm
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------- data contract

  /** The contract audit over caller-supplied tables — seam for the spec,
    * which plants violations of every check (the production tables are
    * almost entirely clean, so the planted run is what proves each
    * predicate actually fires). One conditional-aggregation pass per
    * table plus one LEFT join per FK relationship; every check's
    * violation count rides the same scan, so the audit costs one read of
    * each table regardless of how many checks it carries. The results
    * are a handful of rows — union of tiny aggregates, no data-sized
    * shuffle anywhere. */
  private[operators] def contractChecks(
      li: DataFrame,
      ord: DataFrame,
      cust: DataFrame,
      ev: DataFrame,
      docs: DataFrame): DataFrame = {
    val zero = lit(0L)
    def viol(c: Column): Column = sum(when(c, 1L).otherwise(zero))

    val liLocal = li
      .agg(
        count(lit(1)).as("n"),
        viol(col("l_quantity") < 1 || col("l_quantity") > 50).as("v_qty"),
        viol(col("l_discount") < 0 || col("l_discount") > 0.1).as("v_disc"),
        viol(col("l_extendedprice") <= 0).as("v_price"),
        (count(lit(1)) - countDistinct(struct(col("l_orderkey"), col("l_linenumber"))))
          .as("v_pk"))
      .select(expr(
        """stack(4,
          |'lineitem_discount_range', n, v_disc,
          |'lineitem_pk_unique', n, v_pk,
          |'lineitem_price_positive', n, v_price,
          |'lineitem_quantity_range', n, v_qty) AS (chk, n_checked, n_violations)"""
          .stripMargin))
    // FK/cross-table passes join a DEDUPLICATED right-side key set — a
    // duplicated PK on the dimension (exactly the dirty data an audit
    // exists for) must not fan the fact side out and corrupt the
    // co-resident counts. A duplicate with CONFLICTING o_orderdate is
    // collapsed to min() so the temporal check stays deterministic (and
    // such a duplicate is already reported by orders_pk_unique).
    val ordKeys = ord
      .groupBy("o_orderkey")
      .agg(min("o_orderdate").as("o_orderdate"))
    val liJoin = li
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(ordKeys, col("l_orderkey") === col("o_orderkey"), "left")
      .agg(
        count(lit(1)).as("n"),
        viol(col("o_orderkey").isNull).as("v_fk"),
        viol(col("l_shipdate") < col("o_orderdate")).as("v_early"))
      .select(expr(
        """stack(2,
          |'lineitem_fk_orders', n, v_fk,
          |'lineitem_ship_after_order', n, v_early) AS (chk, n_checked, n_violations)"""
          .stripMargin))
    val ordChecks = ord
      .join(
        cust.select(col("c_custkey")).distinct(),
        col("o_custkey") === col("c_custkey"),
        "left")
      .agg(
        count(lit(1)).as("n"),
        viol(col("c_custkey").isNull).as("v_fk"),
        viol(col("o_totalprice") <= 0).as("v_price"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_pk"))
      .select(expr(
        """stack(3,
          |'orders_fk_customer', n, v_fk,
          |'orders_pk_unique', n, v_pk,
          |'orders_price_positive', n, v_price) AS (chk, n_checked, n_violations)"""
          .stripMargin))
    val evChecks = ev
      .agg(
        count(lit(1)).as("n"),
        viol(col("value") < 0).as("v_val"),
        viol(!col("event_type").isin("view", "click", "purchase", "signup", "error"))
          .as("v_type"))
      .select(expr(
        """stack(2,
          |'events_type_domain', n, v_type,
          |'events_value_nonnegative', n, v_val) AS (chk, n_checked, n_violations)"""
          .stripMargin))
    val docChecks = docs
      .agg(
        count(lit(1)).as("n"),
        viol(col("n_chars") =!= length(col("text"))).as("v_len"),
        viol(!col("lang").isin("en", "de", "fr", "es", "zh")).as("v_lang"))
      .select(expr(
        """stack(2,
          |'documents_lang_domain', n, v_lang,
          |'documents_nchars_consistent', n, v_len) AS (chk, n_checked, n_violations)"""
          .stripMargin))
    liLocal
      .unionByName(liJoin)
      .unionByName(ordChecks)
      .unionByName(evChecks)
      .unionByName(docChecks)
      .select(col("chk").as("check"), col("n_checked"), col("n_violations"))
  }

  /** Data-contract audit — the "great expectations" card a pipeline runs
    * before admitting a batch: PK uniqueness, FK integrity, value-range
    * and domain checks, and cross-column consistency, each as an exact
    * (check, n_checked, n_violations) row. On this corpus every check
    * passes EXCEPT two genuine generator artifacts the audit surfaces
    * (exactly its job): lineitem_ship_after_order (~49% of lineitems
    * ship before their order date) and lineitem_pk_unique (~24% of
    * (l_orderkey, l_linenumber) pairs are duplicated — linenumber is not
    * sequenced within an order). */
  def qDataContract(s: SparkSession, d: String): DataFrame =
    contractChecks(
      Tables.lineitem(s, d),
      Tables.orders(s, d),
      Tables.customer(s, d),
      Tables.events(s, d),
      Tables.documents(s, d))
      .orderBy("check")

  private val qDataContractSql =
    """WITH ok AS (
      |  SELECT o_orderkey, min(o_orderdate) AS o_orderdate FROM orders GROUP BY 1),
      |lij AS (
      |  SELECT count(*) AS n,
      |    count(*) FILTER (WHERE o.o_orderkey IS NULL) AS fk,
      |    count(*) FILTER (WHERE l.l_shipdate < o.o_orderdate) AS early
      |  FROM lineitem l LEFT JOIN ok o ON l.l_orderkey = o.o_orderkey),
      |ck AS (SELECT DISTINCT c_custkey FROM customer),
      |oj AS (
      |  SELECT count(*) AS n,
      |    count(*) FILTER (WHERE c.c_custkey IS NULL) AS fk,
      |    count(*) FILTER (WHERE o_totalprice <= 0) AS price,
      |    count(*) - count(DISTINCT o_orderkey) AS pk
      |  FROM orders o LEFT JOIN ck c ON o.o_custkey = c.c_custkey),
      |u AS (
      |  SELECT 'lineitem_quantity_range' AS chk, count(*) AS n,
      |    count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS v FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_discount_range', count(*),
      |    count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_price_positive', count(*),
      |    count(*) FILTER (WHERE l_extendedprice <= 0) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_pk_unique', count(*),
      |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_fk_orders', n, fk FROM lij
      |  UNION ALL
      |  SELECT 'lineitem_ship_after_order', n, early FROM lij
      |  UNION ALL
      |  SELECT 'orders_fk_customer', n, fk FROM oj
      |  UNION ALL
      |  SELECT 'orders_pk_unique', n, pk FROM oj
      |  UNION ALL
      |  SELECT 'orders_price_positive', n, price FROM oj
      |  UNION ALL
      |  SELECT 'events_value_nonnegative', count(*),
      |    count(*) FILTER (WHERE value < 0) FROM events
      |  UNION ALL
      |  SELECT 'events_type_domain', count(*),
      |    count(*) FILTER (WHERE event_type NOT IN ('view','click','purchase','signup','error'))
      |  FROM events
      |  UNION ALL
      |  SELECT 'documents_nchars_consistent', count(*),
      |    count(*) FILTER (WHERE n_chars <> length(text)) FROM documents
      |  UNION ALL
      |  SELECT 'documents_lang_domain', count(*),
      |    count(*) FILTER (WHERE lang NOT IN ('en','de','fr','es','zh')) FROM documents)
      |SELECT chk AS "check", CAST(n AS BIGINT) AS n_checked, CAST(v AS BIGINT) AS n_violations
      |FROM u ORDER BY 1""".stripMargin

  // ------------------------------------------------------ boolean search

  /** Standing boolean queries (query id, MUST terms, MUST-NOT terms) —
    * a deterministic stand-in for a search front end's load, vocabulary
    * drawn from the corpus. */
  private val BoolQueries: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("+table +scan -merge", Seq("table", "scan"), Seq("merge")),
    ("+data +query -slow", Seq("data", "query"), Seq("slow")))

  /** Boolean retrieval probing the STORED postings index
    * ([[TextOps.ensurePostings]] — the same build-once table phrase
    * search probes; one index serves every retrieval flavor): MUST terms
    * intersect via hash joins on doc_id, MUST-NOT terms subtract via
    * LEFT ANTI joins, and the score column is the summed term frequency
    * of the MUST terms. The corpus text is never rescanned at query time
    * (plan-guarded), the per-term posting lists are pruned by the
    * `term IN (...)` filter on the bucketed index, and candidates are
    * bounded by the rarest MUST term's posting list — the textbook
    * conjunctive-query bound that holds at any corpus size. */
  def qBoolSearch(s: SparkSession, d: String): DataFrame = {
    val terms = BoolQueries.flatMap { case (_, p, n) => p ++ n }.distinct
    val post = s.table(TextOps.ensurePostings(s, d))
      .filter(col("term").isin(terms.map(_.asInstanceOf[Any]): _*))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
      .cache()
    val perQuery = BoolQueries.map { case (qid, must, mustNot) =>
      val seed = post.filter(col("term") === must.head).select(col("doc_id"), col("tf"))
      val hits = must.drop(1).foldLeft(seed) { (acc, t) =>
        acc.join(
          post.filter(col("term") === t).select(col("doc_id"), col("tf").as("tf2")),
          "doc_id")
          .select(col("doc_id"), (col("tf") + col("tf2")).as("tf"))
      }
      val kept = mustNot.foldLeft(hits) { (acc, t) =>
        acc.join(post.filter(col("term") === t).select("doc_id"), Seq("doc_id"), "left_anti")
      }
      kept.select(lit(qid).as("query"), col("doc_id"), col("tf").as("tf_sum"))
    }
    perQuery.reduce(_ unionByName _).orderBy("query", "doc_id")
  }

  private val qBoolSearchSql = {
    def tf(t: String) = s"len(list_filter(t, x -> x = '$t'))"
    val arms = BoolQueries.map { case (qid, must, mustNot) =>
      val conds =
        (must.map(t => s"${tf(t)} > 0") ++ mustNot.map(t => s"${tf(t)} = 0")).mkString(" AND ")
      val score = must.map(tf).mkString(" + ")
      s"""SELECT '$qid' AS query, doc_id, ($score)::BIGINT AS tf_sum
         |FROM tk WHERE $conds""".stripMargin
    }
    s"""WITH tk AS (SELECT doc_id, ${TextOps.tokensSql} AS t FROM documents)
       |${arms.mkString("\nUNION ALL\n")}
       |ORDER BY query, doc_id""".stripMargin
  }

  // ------------------------------------------------------------ A/B test

  /** Two-proportion z-test decision at α=0.05 (z₀ = 1.96 = 49/25, so
    * z₀² = 2401/625), computed as one EXACT cross-multiplied integer
    * comparison — no square roots, no floats, no boundary-rounding
    * divergence between engines:
    *
    *   z² = d²·N / (n1·n2·c·(N−c)),  d = c1·n2 − c2·n1, N = n1+n2,
    *   c = c1+c2;  significant ⟺ 625·d²·N > 2401·n1·n2·c·(N−c).
    *
    * The LHS is 5th-degree in the counts, so the raw form outgrows
    * DECIMAL(38) near ~10⁷ users/arm — where Spark's non-ANSI decimal
    * would return NULL and silently report the STRONGEST effects as
    * not-significant. Guarded by construction: all four counts are first
    * floor-divided by 10^max(0, digits(max n)−6), capping the scaled
    * arms below 10⁶ (worst-case LHS ≈ 1.3·10³³, comfortable in both
    * DECIMAL(38) and HUGEINT). z² is invariant under common scaling up
    * to the flooring of the counts themselves, which cannot flip a
    * decision that isn't already sitting on the α boundary — and below
    * 10⁶ users/arm the divisor is 1 and the test is exact outright. */
  private[operators] def abSignificant(
      c1: Column, n1: Column, c2: Column, n2: Column): Column = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val k = greatest(
      lit(0),
      greatest(length(n1.cast("string")), length(n2.cast("string"))) - 6)
    // 10^k is exact in a double for k <= 13 (max digits(BIGINT)−6)
    val divisor = pow(lit(10.0), k).cast("long")
    // exact integer division (SQL `div`), not Column./ (double division
    // loses ulps above 2^53 — the very magnitudes the guard exists for)
    def idiv(a: Column): Column = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftBridge.expression(a.cast("long")),
        org.apache.spark.sql.GraftBridge.expression(divisor)))
    val (c1s, n1s, c2s, n2s) = (dec(idiv(c1)), dec(idiv(n1)), dec(idiv(c2)), dec(idiv(n2)))
    val d = c1s * n2s - c2s * n1s
    val bigN = n1s + n2s
    val c = c1s + c2s
    when(lit(625) * d * d * bigN > lit(2401) * n1s * n2s * c * (bigN - c), 1L)
      .otherwise(0L)
  }

  /** The same decision as DuckDB SQL text (HUGEINT arithmetic over the
    * identically scaled counts — same divisor rule, same flooring). */
  private def abSignificantSql(c1: String, n1: String, c2: String, n2: String): String = {
    val div = "CAST(power(10, greatest(0, greatest(" +
      s"length(CAST($n1 AS VARCHAR)), length(CAST($n2 AS VARCHAR))) - 6)) AS BIGINT)"
    val (c1s, n1s) = (s"($c1 // $div)", s"($n1 // $div)")
    val (c2s, n2s) = (s"($c2 // $div)", s"($n2 // $div)")
    val d = s"(CAST($c1s AS HUGEINT) * $n2s - CAST($c2s AS HUGEINT) * $n1s)"
    s"""CASE WHEN 625 * $d * $d * ($n1s + $n2s)
       |   > 2401 * CAST($n1s AS HUGEINT) * $n2s * ($c1s + $c2s) * ($n1s + $n2s - $c1s - $c2s)
       |THEN 1 ELSE 0 END""".stripMargin
  }

  /** Deterministic A/B experiment readout: every user hashes into
    * variant A or B (`md5("ab:" || user_id) % 2` — the split any engine
    * can replay), "conversion" on metric m = the user emitted ≥1 event
    * of type m, and each metric row carries the per-arm counts plus the
    * exact z-test verdict. A hash split of uniform traffic is an A/A
    * test, so `significant` should be (and is) 0 everywhere — the
    * arithmetic itself is pinned by the planted-effect spec, which
    * drives [[abSignificant]] with counts on both sides of the α bar.
    *
    * Scale shape: conversion flags reduce map-side to distinct (user,
    * type) pairs, the variant join is user-keyed, and everything past it
    * aggregates to metrics×2 rows; the grid cross-join multiplies two
    * broadcast-sized aggregates (5×2 rows). */
  def qAbTest(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val users = ev.select("user_id").distinct()
      .withColumn(
        "variant",
        md5PrefixLong(concat(lit("ab:"), col("user_id")), 10) % 2)
    val nv = users.groupBy("variant").agg(count(lit(1)).as("n"))
    val conv = ev.select(col("user_id"), col("event_type")).distinct()
      .join(users, "user_id")
      .groupBy(col("event_type").as("metric"), col("variant"))
      .agg(count(lit(1)).as("conv"))
    val grid = ev.select(col("event_type").as("metric")).distinct()
      .crossJoin(nv)
    grid
      .join(conv, Seq("metric", "variant"), "left")
      .select(
        col("metric"), col("variant"), col("n"),
        coalesce(col("conv"), lit(0L)).as("conv"))
      .groupBy("metric")
      .agg(
        min(when(col("variant") === 0, col("n"))).as("n_a"),
        min(when(col("variant") === 0, col("conv"))).as("conv_a"),
        min(when(col("variant") === 1, col("n"))).as("n_b"),
        min(when(col("variant") === 1, col("conv"))).as("conv_b"))
      .withColumn(
        "significant",
        abSignificant(col("conv_a"), col("n_a"), col("conv_b"), col("n_b")))
      .orderBy("metric")
  }

  private val qAbTestSql = {
    val h = md5PrefixLongSql("'ab:' || user_id", 10)
    s"""WITH users AS (
       |  SELECT user_id, ($h) % 2 AS variant
       |  FROM (SELECT DISTINCT user_id FROM events)),
       |nv AS (SELECT variant, count(*)::BIGINT AS n FROM users GROUP BY 1),
       |conv AS (
       |  SELECT e.event_type AS metric, u.variant, count(*)::BIGINT AS conv
       |  FROM (SELECT DISTINCT user_id, event_type FROM events) e
       |  JOIN users u USING (user_id)
       |  GROUP BY 1, 2),
       |grid AS (
       |  SELECT m.metric, nv.variant, nv.n
       |  FROM (SELECT DISTINCT event_type AS metric FROM events) m, nv),
       |filled AS (
       |  SELECT g.metric, g.variant, g.n, COALESCE(c.conv, 0)::BIGINT AS conv
       |  FROM grid g LEFT JOIN conv c ON g.metric = c.metric AND g.variant = c.variant),
       |wide AS (
       |  SELECT metric,
       |    min(CASE WHEN variant = 0 THEN n END) AS n_a,
       |    min(CASE WHEN variant = 0 THEN conv END) AS conv_a,
       |    min(CASE WHEN variant = 1 THEN n END) AS n_b,
       |    min(CASE WHEN variant = 1 THEN conv END) AS conv_b
       |  FROM filled GROUP BY 1)
       |SELECT metric, n_a, conv_a, n_b, conv_b,
       |  CAST(${abSignificantSql("conv_a", "n_a", "conv_b", "n_b")} AS BIGINT) AS significant
       |FROM wide ORDER BY metric""".stripMargin
  }

  // ---------------------------------------------------- retrieval ranking

  /** NDCG position discounts 1/log₂(i+1) for ranks 1..10 in FLOORED micro
    * units, plus their prefix sums (ideal DCG of j relevant items) — a
    * fixed integer constant table shared verbatim by both engines, so the
    * one irrational ingredient of NDCG never touches engine libm. */
  private val NdcgDiscMicro =
    Seq(1000000L, 630929L, 500000L, 430676L, 386852L, 356207L, 333333L,
      315464L, 301029L, 289064L)
  private val NdcgIdealMicro =
    NdcgDiscMicro.scanLeft(0L)(_ + _).tail // prefix sums, index 1..10

  /** Retrieval-ranking evaluation — MRR, precision@10 and NDCG@10 of
    * exact cosine search, with relevance = "candidate shares the query
    * vector's label" (the standard label-as-relevance protocol when no
    * click log exists). Every metric is exact integer arithmetic: scores
    * are micro-cosines, ranks are deterministic (score desc, id asc),
    * the NDCG discount curve is the fixed micro-unit table above, and
    * each ratio is one truncating division — so the full per-query
    * metric table hash-gates against a DuckDB twin that replays the
    * ranking with a window instead of the bounded-heap aggregate.
    *
    * Scale shape: scoring is corpus × query-batch with the query side
    * broadcast (bounded query workload per evaluation run); per-query
    * top-10 rides [[graft.functions.TopKAgg]] — partial aggregation
    * reduces every partition to ≤10 rows per query BEFORE the shuffle,
    * so what moves is O(queries·10), not O(corpus·queries) (the window
    * formulation the oracle uses would shuffle every scored pair). The
    * relevant-count side aggregates map-side to one row per query. */
  def qRankingMetrics(s: SparkSession, d: String): DataFrame =
    rankingMetricsFrom(
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          col("label").cast("long").as("label"),
          col("embedding").cast("array<double>").as("v")))
      .orderBy("qid")

  /** Seam over (vec_id, label, v) rows; queries are vec_id < 500 ∧ ≡ 0
    * (mod 25) — a BOUNDED evaluation workload (≤ 20 queries) at any
    * corpus size. The bound is the scale contract: an evaluation run
    * scores a fixed query batch against the whole corpus, so cost grows
    * linearly with the corpus and not with it squared (the first cut of
    * this card let the query set grow with vec_id range and measured
    * 33× at the 10× replica — queries × corpus; bounded, it's the
    * corpus scan alone). */
  private[operators] def rankingMetricsFrom(e: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") < 500 && col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"), col("v").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(
        col("qid"), col("qlabel"),
        floor(graft.functions.NativeExprs.cosineSim(col("v"), col("qv"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("qm"),
        col("vec_id"),
        when(col("label") === col("qlabel"), 1L).otherwise(0L).as("rel"))
    val nRel = scored.groupBy("qid").agg(sum("rel").as("n_rel"))
    val top10 = udaf(new graft.functions.TopKAgg(10))
    val ranked = scored
      .groupBy("qid", "qlabel")
      .agg(top10(col("qm").cast("double"), col("vec_id")).as("t"))
      .select(col("qid"), col("qlabel"), posexplode(col("t")))
      .select(
        col("qid"), col("qlabel"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("vec_id"))
      .join(e.select(col("vec_id"), col("label")), "vec_id")
      .select(
        col("qid"),
        col("rank"),
        when(col("label") === col("qlabel"), 1L).otherwise(0L).as("rel"))
    val disc = array(NdcgDiscMicro.map(lit): _*)
    val ideal = array(NdcgIdealMicro.map(lit): _*)
    ranked
      .groupBy("qid")
      .agg(
        sum("rel").as("n_rel_top10"),
        min(when(col("rel") === 1, col("rank"))).as("first_rel"),
        sum(col("rel") * element_at(disc, col("rank").cast("int"))).as("dcg_micro"))
      .join(nRel, "qid")
      .select(
        col("qid"),
        col("n_rel"),
        col("n_rel_top10"),
        coalesce(expr("1000000 div first_rel"), lit(0L)).as("mrr_micro"),
        (col("n_rel_top10") * 100000L).as("prec10_ppm"),
        col("dcg_micro"),
        when(col("n_rel") === 0, 0L)
          .otherwise(element_at(ideal, least(col("n_rel"), lit(10L)).cast("int")))
          .as("idcg_micro"))
      .withColumn(
        "ndcg_ppm",
        expr("(dcg_micro * 1000000) div greatest(idcg_micro, 1)"))
  }

  private val qRankingMetricsSql = {
    val discList = NdcgDiscMicro.mkString("[", ", ", "]")
    val idealList = NdcgIdealMicro.mkString("[", ", ", "]")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    embedding::DOUBLE[] AS v
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e
       |  WHERE vec_id < 500 AND vec_id % 25 = 0),
       |scored AS (
       |  SELECT q.qid, q.qlabel,
       |    CAST(floor(list_cosine_similarity(e.v, q.qv) * 1000000 + 0.5) AS BIGINT)
       |      AS qm,
       |    e.vec_id,
       |    CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS rel
       |  FROM e, q WHERE e.vec_id <> q.qid),
       |nrel AS (SELECT qid, sum(rel)::BIGINT AS n_rel FROM scored GROUP BY 1),
       |ranked AS (
       |  SELECT qid, rel,
       |    row_number() OVER (PARTITION BY qid ORDER BY qm DESC, vec_id) AS rank
       |  FROM scored),
       |m AS (
       |  SELECT qid,
       |    sum(rel)::BIGINT AS n_rel_top10,
       |    min(CASE WHEN rel = 1 THEN rank END) AS first_rel,
       |    sum(rel * ($discList)[rank])::BIGINT AS dcg_micro
       |  FROM ranked WHERE rank <= 10 GROUP BY 1)
       |SELECT m.qid, nrel.n_rel, m.n_rel_top10,
       |  COALESCE(1000000 // first_rel, 0)::BIGINT AS mrr_micro,
       |  (m.n_rel_top10 * 100000)::BIGINT AS prec10_ppm,
       |  m.dcg_micro,
       |  (CASE WHEN nrel.n_rel = 0 THEN 0
       |        ELSE ($idealList)[least(nrel.n_rel, 10)] END)::BIGINT AS idcg_micro,
       |  ((m.dcg_micro * 1000000) // greatest(
       |    CASE WHEN nrel.n_rel = 0 THEN 0
       |         ELSE ($idealList)[least(nrel.n_rel, 10)] END, 1))::BIGINT AS ndcg_ppm
       |FROM m JOIN nrel ON m.qid = nrel.qid
       |ORDER BY m.qid""".stripMargin
  }

  // ------------------------------------------------- distribution drift

  /** Two-sample Kolmogorov–Smirnov over a BOUNDED value domain, computed
    * entirely in cross-multiplied integers: for groups a and b with
    * histograms c_a(v), c_b(v) and totals n_a, n_b, the KS statistic is
    * D = max_v |F_a(v) − F_b(v)| = M / (n_a·n_b) with
    * M = max_v |cum_a(v)·n_b − cum_b(v)·n_a| — no float CDF anywhere, so
    * Spark and DuckDB cannot diverge on a near-tie. Input seam takes any
    * (group, v) pairs; the grid (all groups × all observed values, both
    * bounded) left-joins the histogram so each CDF is evaluated at every
    * jump point of EITHER sample — the textbook sup over the pooled
    * support.
    *
    * Scale shape: one combiner-backed histogram aggregation over the fact
    * table (output bounded by groups × value domain), then windows
    * partitioned per group over ≤|domain| rows and a self-join of two
    * bounded frames — nothing downstream of the first aggregate is
    * data-sized. Overflow envelope: M ≤ n_a·n_b rides DECIMAL(38,0) to
    * ~10¹⁹ rows per group; the significance test squares the BOUNDED
    * d_ppm (≤10⁶) rather than M itself, so its products stay exact to
    * ~10¹³ rows per group. Past that, pre-scale the histogram counts by
    * a common 10^k (D is invariant up to the flooring of bin counts,
    * ≤10⁻³ relative once bins hold ≥10³·10^k rows). */
  private[operators] def ksPairsFrom(obs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = obs.groupBy("grp", "v").agg(count(lit(1)).as("c"))
    val grid = obs.select("grp").distinct()
      .crossJoin(obs.select("v").distinct())
    val cum = grid
      .join(h, Seq("grp", "v"), "left")
      .select(col("grp"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn(
        "cum",
        sum("c").over(Window.partitionBy("grp").orderBy("v")))
      .withColumn("n", sum("c").over(Window.partitionBy("grp")))
    val a = cum.select(
      col("grp").as("grp_a"), col("v"),
      col("cum").as("cum_a"), col("n").as("n_a"))
    val b = cum.select(
      col("grp").as("grp_b"), col("v").as("v_b"),
      col("cum").as("cum_b"), col("n").as("n_b"))
    a.join(b, col("v") === col("v_b") && col("grp_a") < col("grp_b"))
      .groupBy("grp_a", "grp_b", "n_a", "n_b")
      .agg(max(abs(
        col("cum_a").cast("decimal(38,0)") * col("n_b") -
          col("cum_b").cast("decimal(38,0)") * col("n_a"))).as("m"))
      .select(
        col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        col("m").cast("long").as("ks_num"),
        expr("cast(m * 1000000 div (cast(n_a as decimal(38,0)) * n_b) as bigint)")
          .as("d_ppm"),
        // reject H₀ (same distribution) at α=0.05 ⟺ D > c·√((n_a+n_b)/(n_a·n_b)),
        // c = 1.358 — squared and cross-multiplied on the ALREADY-BOUNDED
        // d_ppm (≤10⁶), not on M (which can reach n_a·n_b and whose square
        // would overflow DECIMAL(38,0) once groups pass ~1.3·10⁸ rows):
        // d_ppm²·n_a·n_b > 1358²·10⁶·(n_a+n_b). LHS ≤ 10¹²·n_a·n_b — exact
        // to ~10¹³ rows per group. The ppm flooring of D quantizes the
        // boundary by <1 ppm, identically on both engines.
        when(
          expr("cast(m * 1000000 div (cast(n_a as decimal(38,0)) * n_b) as decimal(38,0))") *
            expr("cast(m * 1000000 div (cast(n_a as decimal(38,0)) * n_b) as decimal(38,0))") *
            col("n_a") * col("n_b") >
            lit(1844164L).cast("decimal(38,0)") * lit(1000000L) *
              (col("n_a") + col("n_b")),
          1L).otherwise(0L).as("significant"))
  }

  /** Wasserstein-1 (earth-mover) distance over the same bounded-domain
    * histograms as [[ksPairsFrom]] — the INTEGRAL CDF distance
    * (W₁ = ∫|F_a − F_b| dv), where KS is the sup: KS flags ANY
    * concentrated divergence, W₁ measures how much mass moved how far —
    * the standard pair for numeric-feature drift. Exactly computable in
    * the same cross-multiplied integers: each pooled-support step v
    * contributes |cum_a(v)·n_b − cum_b(v)·n_a| · (next(v) − v), so
    * w1_milli = 1000·Σ div (n_a·n_b) is W₁ in milli value-units with no
    * float CDF anywhere. Same scale/overflow envelope as KS (the Σ adds
    * a |domain|·span factor — still far inside DECIMAL(38,0) for any
    * bounded domain).
    *
    * Same bounded shape as KS: histogram aggregate, per-group windows
    * over ≤|domain| rows, bounded self-join. */
  private[operators] def wassersteinPairsFrom(obs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = obs.groupBy("grp", "v").agg(count(lit(1)).as("c"))
    val grid = obs.select("grp").distinct()
      .crossJoin(obs.select("v").distinct())
    val cum = grid
      .join(h, Seq("grp", "v"), "left")
      .select(col("grp"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum", sum("c").over(Window.partitionBy("grp").orderBy("v")))
      .withColumn("n", sum("c").over(Window.partitionBy("grp")))
      .withColumn(
        "dv",
        coalesce(
          lead("v", 1).over(Window.partitionBy("grp").orderBy("v")) - col("v"),
          lit(0L)))
    val a = cum.select(
      col("grp").as("grp_a"), col("v"), col("dv"),
      col("cum").as("cum_a"), col("n").as("n_a"))
    val b = cum.select(
      col("grp").as("grp_b"), col("v").as("v_b"),
      col("cum").as("cum_b"), col("n").as("n_b"))
    a.join(b, col("v") === col("v_b") && col("grp_a") < col("grp_b"))
      .groupBy("grp_a", "grp_b", "n_a", "n_b")
      .agg(sum(
        abs(col("cum_a").cast("decimal(38,0)") * col("n_b") -
          col("cum_b").cast("decimal(38,0)") * col("n_a")) * col("dv")).as("w1"))
      .select(
        col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        col("w1").cast("long").as("w1_num"),
        expr("cast(w1 * 1000 div (cast(n_a as decimal(38,0)) * n_b) as bigint)")
          .as("w1_milli"))
  }

  /** Wasserstein drift card: HOW MUCH quantity mass moved between return
    * flags (in milli quantity-units) — the magnitude companion to
    * q_ks_test's significance verdict. */
  def qWasserstein(s: SparkSession, d: String): DataFrame =
    wassersteinPairsFrom(
      Tables.lineitem(s, d)
        .select(
          col("l_returnflag").as("grp"),
          col("l_quantity").cast("long").as("v")))
      .orderBy("grp_a", "grp_b")

  private val qWassersteinSql =
    """WITH obs AS (
      |  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS v FROM lineitem),
      |h AS (SELECT grp, v, count(*)::BIGINT AS c FROM obs GROUP BY 1, 2),
      |grid AS (
      |  SELECT g.grp, vv.v
      |  FROM (SELECT DISTINCT grp FROM obs) g, (SELECT DISTINCT v FROM obs) vv),
      |cum AS (
      |  SELECT grid.grp, grid.v,
      |    sum(COALESCE(h.c, 0)) OVER (PARTITION BY grid.grp ORDER BY grid.v)
      |      ::BIGINT AS cum,
      |    sum(COALESCE(h.c, 0)) OVER (PARTITION BY grid.grp)::BIGINT AS n,
      |    COALESCE(lead(grid.v) OVER (PARTITION BY grid.grp ORDER BY grid.v)
      |      - grid.v, 0)::BIGINT AS dv
      |  FROM grid LEFT JOIN h ON grid.grp = h.grp AND grid.v = h.v),
      |m AS (
      |  SELECT a.grp AS grp_a, b.grp AS grp_b, a.n AS n_a, b.n AS n_b,
      |    sum(abs(CAST(a.cum AS HUGEINT) * b.n - CAST(b.cum AS HUGEINT) * a.n)
      |        * a.dv) AS w1
      |  FROM cum a JOIN cum b ON a.v = b.v AND a.grp < b.grp
      |  GROUP BY 1, 2, 3, 4)
      |SELECT grp_a, grp_b, n_a, n_b, CAST(w1 AS BIGINT) AS w1_num,
      |  CAST(w1 * 1000 // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS w1_milli
      |FROM m ORDER BY grp_a, grp_b""".stripMargin

  /** KS drift card: does the l_quantity distribution differ across return
    * flags? Every flag pair gets the exact D (ppm) and the α=0.05
    * verdict. On this generator quantity is uniform within every flag, so
    * `significant` should be (and is) 0 — the arithmetic itself is pinned
    * by the planted-shift spec, which drives [[ksPairsFrom]] with a
    * distribution shifted both just-under and well-over the α bar. */
  def qKsTest(s: SparkSession, d: String): DataFrame =
    ksPairsFrom(
      Tables.lineitem(s, d)
        .select(
          col("l_returnflag").as("grp"),
          col("l_quantity").cast("long").as("v")))
      .orderBy("grp_a", "grp_b")

  private val qKsTestSql =
    """WITH obs AS (
      |  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS v FROM lineitem),
      |h AS (SELECT grp, v, count(*)::BIGINT AS c FROM obs GROUP BY 1, 2),
      |grid AS (
      |  SELECT g.grp, vv.v
      |  FROM (SELECT DISTINCT grp FROM obs) g, (SELECT DISTINCT v FROM obs) vv),
      |cum AS (
      |  SELECT grid.grp, grid.v, COALESCE(h.c, 0) AS c,
      |    sum(COALESCE(h.c, 0)) OVER (PARTITION BY grid.grp ORDER BY grid.v)
      |      ::BIGINT AS cum,
      |    sum(COALESCE(h.c, 0)) OVER (PARTITION BY grid.grp)::BIGINT AS n
      |  FROM grid LEFT JOIN h ON grid.grp = h.grp AND grid.v = h.v),
      |m AS (
      |  SELECT a.grp AS grp_a, b.grp AS grp_b, a.n AS n_a, b.n AS n_b,
      |    max(abs(CAST(a.cum AS HUGEINT) * b.n - CAST(b.cum AS HUGEINT) * a.n)) AS m
      |  FROM cum a JOIN cum b ON a.v = b.v AND a.grp < b.grp
      |  GROUP BY 1, 2, 3, 4)
      |SELECT grp_a, grp_b, n_a, n_b, CAST(m AS BIGINT) AS ks_num,
      |  CAST(m * 1000000 // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS d_ppm,
      |  CAST(CASE WHEN
      |    (m * 1000000 // (CAST(n_a AS HUGEINT) * n_b)) *
      |    (m * 1000000 // (CAST(n_a AS HUGEINT) * n_b)) * n_a * n_b >
      |    CAST(1844164 AS HUGEINT) * 1000000 * (n_a + n_b)
      |  THEN 1 ELSE 0 END AS BIGINT) AS significant
      |FROM m ORDER BY grp_a, grp_b""".stripMargin

  /** Month-over-month total-variation drift of the order-priority mix —
    * the categorical-distribution drift monitor a pipeline runs on every
    * ingest batch. TVD(p, q) = ½·Σ_bins |p_i − q_i| is an exact rational:
    * tvd_ppm = 10⁶·Σ|c_a(i)·n_b − c_b(i)·n_a| div (2·n_a·n_b) — unlike
    * PSI/JS it needs no logarithm, so the card stays integer-exact (the
    * repo-wide house rule; a PSI twin would hang on libm ln ulps).
    * `top_bin` names the priority contributing the largest cross-
    * multiplied gap (tie → lexicographically smallest), the "what moved"
    * drill-down.
    *
    * Scale shape: one histogram aggregate bounded by months × priorities,
    * a row_number over the bounded month table to pair consecutive
    * months, and grid joins of bounded frames — past the first aggregate
    * nothing is data-sized. Same DECIMAL(38,0) envelope as
    * [[ksPairsFrom]]. */
  def qTvDrift(s: SparkSession, d: String): DataFrame =
    tvDriftFrom(
      Tables.orders(s, d)
        .select(
          date_trunc("month", col("o_orderdate")).cast("date").as("month"),
          col("o_orderpriority").as("bin")))
      .orderBy("month_a")

  /** Seam over (month, bin) observations — consecutive-period TVD. */
  private[operators] def tvDriftFrom(ord: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = ord.groupBy("month", "bin").agg(count(lit(1)).as("c"))
    val grid = ord.select("month").distinct()
      .crossJoin(ord.select("bin").distinct())
    val full = grid
      .join(h, Seq("month", "bin"), "left")
      .select(col("month"), col("bin"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("n", sum("c").over(Window.partitionBy("month")))
    val rn = ord.select("month").distinct()
      .withColumn("rn", row_number().over(Window.orderBy("month")))
    val a = full.join(rn, "month")
      .select(
        col("month").as("month_a"), col("rn"), col("bin"),
        col("c").as("c_a"), col("n").as("n_a"))
    val b = full.join(rn.withColumn("rn", col("rn") - 1), "month")
      .select(
        col("month").as("month_b"), col("rn").as("rn_b"), col("bin").as("bin_b"),
        col("c").as("c_b"), col("n").as("n_b"))
    a.join(b, col("rn") === col("rn_b") && col("bin") === col("bin_b"))
      .withColumn(
        "gap",
        abs(col("c_a").cast("decimal(38,0)") * col("n_b") -
          col("c_b").cast("decimal(38,0)") * col("n_a")))
      .groupBy("month_a", "month_b", "n_a", "n_b")
      .agg(
        sum("gap").as("sg"),
        min(struct(negate(col("gap")), col("bin"))).as("tb"))
      .select(
        col("month_a"), col("month_b"), col("n_a"), col("n_b"),
        expr("cast(sg * 1000000 div (2 * cast(n_a as decimal(38,0)) * n_b) as bigint)")
          .as("tvd_ppm"),
        col("tb.bin").as("top_bin"))
  }

  private val qTvDriftSql =
    """WITH ord AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |    o_orderpriority AS bin
      |  FROM orders),
      |h AS (SELECT month, bin, count(*)::BIGINT AS c FROM ord GROUP BY 1, 2),
      |grid AS (
      |  SELECT m.month, b.bin
      |  FROM (SELECT DISTINCT month FROM ord) m, (SELECT DISTINCT bin FROM ord) b),
      |full_h AS (
      |  SELECT grid.month, grid.bin, COALESCE(h.c, 0)::BIGINT AS c,
      |    sum(COALESCE(h.c, 0)) OVER (PARTITION BY grid.month)::BIGINT AS n
      |  FROM grid LEFT JOIN h ON grid.month = h.month AND grid.bin = h.bin),
      |rn AS (
      |  SELECT month, row_number() OVER (ORDER BY month) AS rn
      |  FROM (SELECT DISTINCT month FROM ord)),
      |pairs AS (
      |  SELECT a.month AS month_a, b.month AS month_b, a.bin,
      |    a.n AS n_a, b.n AS n_b,
      |    abs(CAST(a.c AS HUGEINT) * b.n - CAST(b.c AS HUGEINT) * a.n) AS gap
      |  FROM (SELECT f.*, r.rn FROM full_h f JOIN rn r USING (month)) a
      |  JOIN (SELECT f.*, r.rn FROM full_h f JOIN rn r USING (month)) b
      |    ON b.rn = a.rn + 1 AND a.bin = b.bin)
      |SELECT month_a, month_b, n_a, n_b,
      |  CAST(sum(gap) * 1000000 // (2 * CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
      |    AS tvd_ppm,
      |  min(struct_pack(g := -gap, bin := bin)).bin AS top_bin
      |FROM pairs GROUP BY 1, 2, 3, 4 ORDER BY month_a""".stripMargin

  /** χ² critical values at α=0.05 in milli units, df 1..8 — a fixed
    * constant table shared verbatim by both engines (no incomplete-gamma
    * at query time). */
  private val Chi2CritMilli: Seq[(Int, Long)] = Seq(
    1 -> 3841L, 2 -> 5991L, 3 -> 7815L, 4 -> 9488L,
    5 -> 11070L, 6 -> 12592L, 7 -> 14067L, 8 -> 15507L)

  /** Pearson χ² independence test over two BOUNDED categorical columns,
    * per-cell: χ² = Σ (o·N − r·c)² / (r·c·N). Each cell's contribution is
    * a truncating integer division to milli units — floor-per-term, so
    * the sum is deterministic in both engines (the house pattern; an
    * exact rational sum would need Π r·c as common denominator). The
    * verdict compares against the fixed α=0.05 critical-value table
    * above; because every term is floored the statistic under-reads by
    * < cells/1000 — an on-the-boundary decision flips identically in
    * both engines since both floor the same integers.
    *
    * Scale shape: one contingency aggregate bounded by |A|×|B|, then
    * arithmetic over that bounded frame (row/col totals are windows over
    * ≤|A|·|B| rows); the DECIMAL(38,0) numerator holds to N ≈ 5·10⁸
    * rows — past that, floor-divide all cell counts by a common 10^k and
    * compare against crit·10^k (χ² scales linearly in the counts). */
  private[operators] def chiSquareCells(obs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // grid the full |A|×|B| cell space: an UNOBSERVED cell still
    // contributes (0·N − r·c)²/(r·c·N) = r·c·1000 div N to the statistic —
    // dropping it would under-read χ² exactly where dependence is starkest
    val h = obs.groupBy("a", "b").agg(count(lit(1)).as("o"))
    val cells = obs.select("a").distinct().crossJoin(obs.select("b").distinct())
      .join(h, Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("o"), lit(0L)).as("o"))
      .withColumn("r", sum("o").over(Window.partitionBy("a")))
      .withColumn("c", sum("o").over(Window.partitionBy("b")))
      .withColumn("n", sum("o").over(Window.partitionBy()))
      .withColumn(
        "term_milli",
        expr("""cast(
          |  (cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * c)
          |  * (cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * c)
          |  * 1000 div (cast(r as decimal(38,0)) * c * n) as bigint)""".stripMargin))
    val tot = cells.agg(
      sum("term_milli").as("chi2_milli"),
      ((countDistinct("a") - 1) * (countDistinct("b") - 1)).as("df"))
    val crit = Chi2CritMilli.foldLeft(lit(null).cast("long")) {
      case (acc, (k, v)) => when(col("df") === k, v).otherwise(acc)
    }
    cells
      .crossJoin(broadcast(tot))
      .select(
        col("a"), col("b"), col("o").as("observed"),
        expr("cast(cast(r as decimal(38,0)) * c * 1000 div n as bigint)")
          .as("expected_milli"),
        col("term_milli"), col("chi2_milli"), col("df"),
        when(col("chi2_milli") > crit, 1L).otherwise(0L).as("significant"))
  }

  /** χ² independence card: is l_returnflag independent of l_linestatus?
    * On this generator the two are drawn independently (χ²_milli ≈ 92 at
    * sf0.01, far under the df=2 bar of 5991), so `significant` = 0 — the
    * decision arithmetic on BOTH sides of the bar is pinned by the
    * planted spec (a diagonal-heavy table that must fire, an exactly
    * proportional one that must not). Per-cell observed/expected rows
    * with the shared statistic and verdict on every row. */
  def qChiSquare(s: SparkSession, d: String): DataFrame =
    chiSquareCells(
      Tables.lineitem(s, d)
        .select(col("l_returnflag").as("a"), col("l_linestatus").as("b")))
      .orderBy("a", "b")

  private val qChiSquareSql = {
    val crit = Chi2CritMilli
      .map { case (k, v) => s"WHEN df = $k THEN $v" }
      .mkString(" ")
    s"""WITH h AS (
       |  SELECT l_returnflag AS a, l_linestatus AS b, count(*)::BIGINT AS o
       |  FROM lineitem GROUP BY 1, 2),
       |cells AS (
       |  SELECT g.a, g.b, COALESCE(h.o, 0)::BIGINT AS o
       |  FROM (SELECT aa.a, bb.b
       |        FROM (SELECT DISTINCT l_returnflag AS a FROM lineitem) aa,
       |             (SELECT DISTINCT l_linestatus AS b FROM lineitem) bb) g
       |  LEFT JOIN h ON g.a = h.a AND g.b = h.b),
       |x AS (
       |  SELECT a, b, o,
       |    sum(o) OVER (PARTITION BY a)::BIGINT AS r,
       |    sum(o) OVER (PARTITION BY b)::BIGINT AS c,
       |    sum(o) OVER ()::BIGINT AS n
       |  FROM cells),
       |t AS (
       |  SELECT a, b, o, r, c, n,
       |    CAST((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
       |      * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
       |      * 1000 // (CAST(r AS HUGEINT) * c * n) AS BIGINT) AS term_milli
       |  FROM x),
       |tot AS (
       |  SELECT sum(term_milli)::BIGINT AS chi2_milli,
       |    ((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1))::BIGINT AS df
       |  FROM t)
       |SELECT a, b, o AS observed,
       |  CAST(CAST(r AS HUGEINT) * c * 1000 // n AS BIGINT) AS expected_milli,
       |  term_milli, chi2_milli, df,
       |  CAST(CASE WHEN chi2_milli > (CASE $crit END) THEN 1 ELSE 0 END AS BIGINT)
       |    AS significant
       |FROM t, tot ORDER BY a, b""".stripMargin
  }

  // ------------------------------------------------------------- registry

  /** The profiled columns of the events table, in output order. */
  private val ProfileCols =
    Seq("event_id", "event_type", "props", "ts", "user_id", "value")

  /** Column-profile card — the DISCOVERY side of the data-contract audit
    * (the contract asserts known predicates; the profile is what you run
    * first, on a table you don't know yet): per column, null count and
    * exact distinct cardinality, plus the row count. One aggregation
    * pass; the multiple distinct aggregates expand into per-column
    * streams of the same scan (Spark's Expand — cost ∝ columns, not
    * extra scans). At 100 TB the exact countDistinct swaps for
    * approx_count_distinct (HLL — same plan shape, bounded state;
    * the exact/approx pairing is demonstrated by q_approx_distinct +
    * its _check row); null counts are plain combiner-backed conditional
    * counts either way. */
  def qColumnProfile(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val aggs =
      count(lit(1)).as("n_rows") +: ProfileCols.flatMap { c =>
        Seq(
          (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
          countDistinct(col(c)).as(s"${c}__distinct"))
      }
    ev.agg(aggs.head, aggs.tail: _*)
      .select(
        expr(
          s"stack(${ProfileCols.size}, " + ProfileCols
            .map(c => s"'$c', ${c}__nulls, ${c}__distinct")
            .mkString(", ") + ") AS (col_name, n_nulls, n_distinct)"),
        col("n_rows"))
      .select("col_name", "n_rows", "n_nulls", "n_distinct")
      .orderBy("col_name")
  }

  private val qColumnProfileSql =
    ProfileCols
      .map(c =>
        s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
           |  (count(*) - count($c))::BIGINT AS n_nulls,
           |  count(DISTINCT $c)::BIGINT AS n_distinct FROM events""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  val queries: Seq[Q] = Seq(
    Q("q_centroid_confusion", qCentroidConfusion, Some(qCentroidConfusionSql)),
    Q("q_column_profile", qColumnProfile, Some(qColumnProfileSql)),
    Q("q_classifier_metrics", qClassifierMetrics, Some(qClassifierMetricsSql)),
    Q("q_calibration", qCalibration, Some(qCalibrationSql)),
    Q("q_data_contract", qDataContract, Some(qDataContractSql)),
    Q("q_bool_search", qBoolSearch, Some(qBoolSearchSql)),
    Q("q_ab_test", qAbTest, Some(qAbTestSql)),
    Q("q_ranking_metrics", qRankingMetrics, Some(qRankingMetricsSql)),
    Q("q_ks_test", qKsTest, Some(qKsTestSql)),
    Q("q_wasserstein", qWasserstein, Some(qWassersteinSql)),
    Q("q_tv_drift", qTvDrift, Some(qTvDriftSql)),
    Q("q_chi_square", qChiSquare, Some(qChiSquareSql)))
}
