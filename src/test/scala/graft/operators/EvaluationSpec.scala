package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Third-opinion checks for the Evaluation pack: planted fixtures that
  * prove each predicate/decision actually fires (the production tables
  * are clean, so the gate row alone can't show that), plus straight-line
  * JVM recomputations on the real corpus — a different code path from
  * both Spark and the DuckDB oracle twins. */
class EvaluationSpec extends SparkSpec {

  import spark.implicits._

  // ---------------------------------------------------- centroid classifier

  /** Independent integer nearest-centroid: replay the micro-scale +
    * offset + floor-div mean + exact L2 argmin pipeline in plain Scala. */
  private def jvmPredict(
      rows: Seq[(Long, Int, Array[Float])]): Map[Long, (Long, Long)] = {
    val off = 1L << 22
    def q(v: Float): Long = math.floor(v.toDouble * 1e6 + 0.5).toLong + off
    val dims = rows.head._3.length
    val byLabel = rows.groupBy(_._2)
    val cents: Map[Int, Array[Long]] = byLabel.map { case (l, vs) =>
      val c = Array.tabulate(dims) { i =>
        val s = vs.map(r => q(r._3(i))).sum
        Math.floorDiv(s, vs.size.toLong)
      }
      l -> c
    }
    rows.map { case (id, lt, v) =>
      val best = cents.toSeq
        .map { case (l, c) =>
          val d2 = (0 until dims).map { i => val d = q(v(i)) - c(i); d * d }.sum
          (d2, l.toLong)
        }
        .min
      id -> (lt.toLong, best._2)
    }.toMap
  }

  test("planted clusters classify to their own centroid; an exact tie breaks to the smaller label") {
    // c0 = mean(0, 0, 300000) = 100000 micro; c1 = 500000 micro. The
    // probe (id 2, q = 300000) is EXACTLY 200000 from both centroids —
    // d² = 4e10 either way — so the struct-min tie-break must pick
    // label 0. (0.5f is exact in binary; 0.3f floors to 300000 micro.)
    val a = Seq((0L, 0, Array(0f, 0f)), (1L, 0, Array(0f, 0f)), (2L, 0, Array(0.3f, 0f)))
    val b = Seq.tabulate(3)(i => (10L + i, 1, Array(0.5f, 0f)))
    val emb = (a ++ b).toDF("vec_id", "label", "embedding")
    val got = Evaluation.centroidPredictionsFrom(emb)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(2L) === (0L, 0L), "equidistant probe must break the tie to label 0")
    b.foreach { case (id, _, _) => assert(got(id) === (1L, 1L)) }
    assert(got === jvmPredict(a ++ b))
  }

  test("negative embedding values: offset keeps Spark div == floor-division mean") {
    // all-negative values make the UNOFFSET sum negative — a truncating
    // div would round toward zero and shift the centroid by one micro
    // step vs DuckDB's floor. The planted fixture has a mean that does
    // not divide evenly, so the two conventions genuinely differ.
    val rows = Seq(
      (0L, 0, Array(-0.31f, -0.11f)),
      (1L, 0, Array(-0.32f, -0.12f)),
      (2L, 0, Array(-0.34f, -0.14f)), // sums ≡ 1 mod 3 territory
      (3L, 1, Array(0.2f, 0.2f)),
      (4L, 1, Array(0.22f, 0.18f)))
    val got = Evaluation.centroidPredictionsFrom(rows.toDF("vec_id", "label", "embedding"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === jvmPredict(rows))
    rows.take(3).foreach { case (id, _, _) => assert(got(id)._2 === 0L) }
  }

  test("classifier metrics satisfy the confusion-matrix identities on the real corpus") {
    val m = Evaluation.qCentroidConfusion(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = Evaluation.qClassifierMetrics(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (label, support, tp, fp, fn) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(tp === m.getOrElse((label, label), 0L))
      assert(support === m.collect { case ((t, _), n) if t == label => n }.sum)
      assert(tp + fp === m.collect { case ((_, p), n) if p == label => n }.sum)
      assert(tp + fn === support)
      assert(r.getLong(5) === tp * 1000000L / math.max(tp + fp, 1L))
      assert(r.getLong(6) === tp * 1000000L / math.max(tp + fn, 1L))
      assert(r.getLong(7) === 2 * tp * 1000000L / math.max(2 * tp + fp + fn, 1L))
    }
    // supports cover the corpus exactly once
    assert(got.map(_.getLong(1)).sum === Tables.embeddings(spark, sfDir).count())
  }

  test("calibration bins replay in plain JVM integer arithmetic on the real corpus") {
    val off = 1L << 22
    def q(v: Float): Long = math.floor(v.toDouble * 1e6 + 0.5).toLong + off
    val rows = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getSeq[Float](1).toArray))
    val dims = rows.head._3.length
    val cents: Map[Int, Array[Long]] = rows.groupBy(_._2).map { case (l, vs) =>
      l -> Array.tabulate(dims) { i =>
        Math.floorDiv(vs.map(r => q(r._3(i))).sum, vs.size.toLong)
      }
    }
    // per vector: distances to every centroid sorted by (d2, label), then
    // the same permille margin / decile bin arithmetic as the operator
    val per = rows.map { case (_, lt, v) =>
      val ds = cents.toSeq.map { case (l, c) =>
        ((0 until dims).map { i => val d = q(v(i)) - c(i); d * d }.sum, l.toLong)
      }.sorted
      val (d1, predicted) = ds.head
      val dd2 = ds(1)._1
      val margin = Math.floorDiv((dd2 - d1) * 1000L, math.max(dd2, 1L))
      (math.min(margin / 10L, 9L), if (predicted == lt.toLong) 1L else 0L, margin)
    }
    val want = per.groupBy(_._1).map { case (bin, xs) =>
      val n = xs.size.toLong
      val ok = xs.map(_._2).sum
      bin -> (n, ok, ok * 1000000L / n, xs.map(_._3).sum)
    }
    val got = Evaluation.qCalibration(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got === want)
    assert(got.values.map(_._1).sum === rows.length.toLong)
    assert(got.size >= 2, "corpus produced a single margin bin — vacuous calibration table")
  }

  // ------------------------------------------------------- data contract

  test("every contract check fires on planted violations with exact counts") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    // lineitem: rows (orderkey, linenumber, qty, price, discount, shipdate)
    val li = Seq(
      (1L, 1, 10.0, 100.0, 0.05, ts0), // clean
      (1L, 1, 10.0, 100.0, 0.05, ts0), // pk dup (+1)
      (1L, 2, 99.0, 100.0, 0.05, ts0), // qty out of range
      (1L, 3, 10.0, -5.0, 0.05, ts0), // price nonpositive
      (1L, 4, 10.0, 100.0, 0.5, ts0), // discount out of range
      (7L, 1, 10.0, 100.0, 0.05, ts0), // orphan orderkey
      (2L, 1, 10.0, 100.0, 0.05, ts1), // ships before its order date
      // references the DUPLICATED order 3: the dedup'd join side must
      // count this row once, not fan it out into phantom violations
      (3L, 1, 10.0, 100.0, 0.05, ts0)
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
      "l_discount", "l_shipdate")
    val ord = Seq(
      (1L, 10L, 50.0, ts1), // clean (order placed on the 5th)
      (2L, 10L, 50.0, ts0), // order on the 10th, its lineitem ships on the 5th
      (3L, 99L, 50.0, ts1), // orphan custkey
      (3L, 10L, -1.0, ts1) // pk dup (+1) AND nonpositive total
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val cust = Seq(Tuple1(10L)).toDF("c_custkey")
    val ev = Seq(
      (1L, "view", 1.0),
      (2L, "bogus", 1.0), // type out of domain
      (3L, "click", -2.0) // negative value
    ).toDF("event_id", "event_type", "value")
    val docs = Seq(
      (1L, "abc", "en", 3L),
      (2L, "abc", "xx", 3L), // lang out of domain
      (3L, "abc", "en", 7L) // n_chars inconsistent
    ).toDF("doc_id", "text", "lang", "n_chars")

    val got = Evaluation.contractChecks(li, ord, cust, ev, docs)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got("lineitem_quantity_range") === (8L, 1L))
    assert(got("lineitem_discount_range") === (8L, 1L))
    assert(got("lineitem_price_positive") === (8L, 1L))
    assert(got("lineitem_pk_unique") === (8L, 1L))
    // order 3 is PK-duplicated, and a lineitem references it: the
    // dedup'd join side keeps n_checked at the true lineitem count and
    // the counts fan-out-free
    assert(got("lineitem_fk_orders") === (8L, 1L))
    assert(got("lineitem_ship_after_order") === (8L, 1L))
    assert(got("orders_fk_customer") === (4L, 1L))
    assert(got("orders_pk_unique") === (4L, 1L))
    assert(got("orders_price_positive") === (4L, 1L))
    assert(got("events_type_domain") === (3L, 1L))
    assert(got("events_value_nonnegative") === (3L, 1L))
    assert(got("documents_lang_domain") === (3L, 1L))
    assert(got("documents_nchars_consistent") === (3L, 1L))
    assert(got.size === 13)
  }

  test("contract audit on the real corpus: exactly the two known generator artifacts fire") {
    val got = Evaluation.qDataContract(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val dirty = got.filter(_._2 > 0)
    assert(dirty.keySet === Set("lineitem_ship_after_order", "lineitem_pk_unique"))
  }

  // ------------------------------------------------------- boolean search

  test("bool search equals a direct text scan (no index) on the real corpus") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split("[\\s]+").filter(_.nonEmpty).toSeq)
    def want(must: Seq[String], mustNot: Seq[String]): Map[Long, Long] =
      docs.collect {
        case (id, toks)
            if must.forall(toks.contains) && !mustNot.exists(toks.contains) =>
          id -> must.map(t => toks.count(_ == t).toLong).sum
      }.toMap
    val got = Evaluation.qBoolSearch(spark, sfDir).collect()
      .groupBy(_.getString(0))
      .map { case (q, rs) => q -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    assert(got("+table +scan -merge") === want(Seq("table", "scan"), Seq("merge")))
    assert(got("+data +query -slow") === want(Seq("data", "query"), Seq("slow")))
  }

  // ------------------------------------------------------------- A/B test

  /** Independent BigInt evaluation of the z² > 2401/625 decision,
    * replaying the production divisor rule (floor all four counts by
    * 10^max(0, digits(max n)−6) before the exact comparison). */
  private def jvmSig(c1: Long, n1: Long, c2: Long, n2: Long): Long = {
    val k = math.max(0, math.max(n1.toString.length, n2.toString.length) - 6)
    val div = math.pow(10, k).toLong
    val (bc1, bn1, bc2, bn2) =
      (BigInt(c1 / div), BigInt(n1 / div), BigInt(c2 / div), BigInt(n2 / div))
    val d = bc1 * bn2 - bc2 * bn1
    val bigN = bn1 + bn2
    val c = bc1 + bc2
    if (625 * d * d * bigN > 2401 * bn1 * bn2 * c * (bigN - c)) 1L else 0L
  }

  test("ab decision fires on a planted effect and stays quiet on noise; boundary sweep agrees with BigInt") {
    val cases = Seq(
      (200L, 1000L, 100L, 1000L), // z ≈ 6 → significant
      (105L, 1000L, 100L, 1000L), // z ≈ 0.36 → not
      (0L, 1000L, 0L, 1000L), // degenerate: no conversions
      (1000L, 1000L, 1000L, 1000L), // degenerate: all converted
      // 1e8/arm with a huge effect: the raw 5th-degree product would
      // overflow DECIMAL(38) → NULL → a silent "not significant"; the
      // divisor rule must keep this a loud 1
      (50000000L, 100000000L, 10000000L, 100000000L),
      // ... and a huge-N null effect must stay 0, not trip the scaler
      (10000001L, 100000000L, 10000000L, 100000000L)
    ) ++ (100L to 160L).map(c1 => (c1, 1000L, 100L, 1000L)) // walk across α
    val got = cases.toDF("c1", "n1", "c2", "n2")
      .withColumn("sig", Evaluation.abSignificant(col("c1"), col("n1"), col("c2"), col("n2")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) -> r.getLong(4))
      .toMap
    cases.foreach { case k @ (c1, n1, c2, n2) =>
      assert(got(k) === jvmSig(c1, n1, c2, n2), s"counts $k")
    }
    assert(got((200L, 1000L, 100L, 1000L)) === 1L)
    assert(got((105L, 1000L, 100L, 1000L)) === 0L)
    assert(got((50000000L, 100000000L, 10000000L, 100000000L)) === 1L,
      "overflow guard: a 1e8-arm blowout effect must stay significant")
    assert(got((10000001L, 100000000L, 10000000L, 100000000L)) === 0L)
    // the sweep must actually cross the α bar somewhere
    val sweep = (100L to 160L).map(c1 => got((c1, 1000L, 100L, 1000L)))
    assert(sweep.head === 0L && sweep.last === 1L)
  }

  test("ab readout counts are conserved and decisions match BigInt on the real corpus") {
    val rows = Evaluation.qAbTest(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    rows.foreach { r =>
      val (na, ca, nb, cb) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(na + nb === users, "every user lands in exactly one arm")
      assert(ca <= na && cb <= nb)
      assert(r.getLong(5) === jvmSig(ca, na, cb, nb))
    }
  }

  test("column profile: planted nulls and duplicates land in the right cells") {
    // the gate corpus has zero nulls, so the n_nulls path would be
    // vacuous without this plant
    import org.apache.spark.sql.SaveMode
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      (1L, ts0, 10L, "view", 1.5, "{}"),
      (2L, ts0, 10L, "view", 1.5, null),
      (3L, ts0, 20L, null, 2.5, null),
      (4L, ts0, 20L, "click", 2.5, "{\"a\":1}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("graft-prof-").toString
    rows.write.mode(SaveMode.Overwrite).parquet(s"$tmp/events.parquet")
    val got = Evaluation.qColumnProfile(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === Seq(
      ("event_id", 4L, 0L, 4L),
      ("event_type", 4L, 1L, 2L), // countDistinct ignores the null
      ("props", 4L, 2L, 2L),
      ("ts", 4L, 0L, 1L),
      ("user_id", 4L, 0L, 2L),
      ("value", 4L, 0L, 2L)))
  }

  // ---------------------------------------------------- retrieval ranking

  test("ranking metrics: hand-computed MRR/P@10/NDCG on a planted angular fixture") {
    // Query = vec 0 (0 % 25 == 0), label 7, pointing along +x. Candidates
    // at decreasing cosine: ids 1..12 with angle increasing, so the exact
    // ranking is 1, 2, ..., 12 (top-10 = 1..10). Relevant (label 7):
    // ranks 2, 3 and 11 (outside top-10) + one more at rank 5 — so
    // n_rel = 4, n_rel_top10 = 3, first_rel = 2.
    def vecAt(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r), math.sin(r))
    }
    val rows =
      Seq((0L, 7L, vecAt(0))) ++
        (1 to 12).map { i =>
          val lbl = if (i == 2 || i == 3 || i == 5 || i == 11) 7L else 1L
          (i.toLong, lbl, vecAt(i * 5.0))
        }
    val got = Evaluation.rankingMetricsFrom(rows.toDF("vec_id", "label", "v"))
      .collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("qid") === 0L)
    assert(r.getAs[Long]("n_rel") === 4L)
    assert(r.getAs[Long]("n_rel_top10") === 3L)
    assert(r.getAs[Long]("mrr_micro") === 500000L) // 10⁶ div 2
    assert(r.getAs[Long]("prec10_ppm") === 300000L) // 3/10
    // dcg = disc(2) + disc(3) + disc(5); idcg = prefix(min(4,10))
    val disc = Seq(1000000L, 630929L, 500000L, 430676L, 386852L, 356207L,
      333333L, 315464L, 301029L, 289064L)
    val dcg = disc(1) + disc(2) + disc(4)
    val idcg = disc.take(4).sum
    assert(r.getAs[Long]("dcg_micro") === dcg)
    assert(r.getAs[Long]("idcg_micro") === idcg)
    assert(r.getAs[Long]("ndcg_ppm") === dcg * 1000000L / idcg)
  }

  test("ranking metrics: no relevant docs anywhere gives all-zero metrics, not an error") {
    val rows = Seq((0L, 9L, Seq(1.0, 0.0))) ++
      (1 to 5).map(i => (i.toLong, 1L, Seq(math.cos(i * 0.1), math.sin(i * 0.1))))
    val r = Evaluation.rankingMetricsFrom(rows.toDF("vec_id", "label", "v"))
      .collect().head
    assert(r.getAs[Long]("n_rel") === 0L)
    assert(r.getAs[Long]("mrr_micro") === 0L)
    assert(r.getAs[Long]("dcg_micro") === 0L)
    assert(r.getAs[Long]("idcg_micro") === 0L)
    assert(r.getAs[Long]("ndcg_ppm") === 0L)
  }

  // ------------------------------------------------- distribution drift

  test("KS: planted shift fires, identical distributions don't, and the α boundary splits exactly") {
    // boundary construction at n_a = n_b = 200: reject ⟺
    // 10⁶·M² > 1844164·200·200·400 = 2.95066e13 ⟺ M > 5432.03.
    // Group b puts k rows on value 0 (a has none), rest on 1 —
    // M = 200·k, so k = 27 (M = 5400) must NOT fire, k = 28 (M = 5600) must.
    def fixture(k: Int) = {
      val a = Seq.fill(200)(("a", 1L))
      val b = Seq.fill(k)(("b", 0L)) ++ Seq.fill(200 - k)(("b", 1L))
      (a ++ b).toDF("grp", "v")
    }
    def row(k: Int) = Evaluation.ksPairsFrom(fixture(k)).collect().head
    val under = row(27)
    assert(under.getAs[Long]("ks_num") === 5400L)
    assert(under.getAs[Long]("significant") === 0L)
    val over = row(28)
    assert(over.getAs[Long]("ks_num") === 5600L)
    assert(over.getAs[Long]("significant") === 1L)
    // identical distributions: M = 0, never significant
    val same = Evaluation.ksPairsFrom(
      (Seq.fill(50)(("a", 3L)) ++ Seq.fill(50)(("b", 3L))).toDF("grp", "v"))
      .collect().head
    assert(same.getAs[Long]("ks_num") === 0L)
    assert(same.getAs[Long]("significant") === 0L)
    // gross shift (disjoint supports): D = 1 ⟹ d_ppm = 10⁶, fires
    val gross = Evaluation.ksPairsFrom(
      (Seq.fill(100)(("a", 1L)) ++ Seq.fill(100)(("b", 9L))).toDF("grp", "v"))
      .collect().head
    assert(gross.getAs[Long]("d_ppm") === 1000000L)
    assert(gross.getAs[Long]("significant") === 1L)
  }

  test("KS against a JVM recompute on the real corpus") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("grp"), col("l_quantity").cast("long").as("v"))
    val rows = li.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = Evaluation.ksPairsFrom(li).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("ks_num"))
      .toMap
    val grps = rows.map(_._1).distinct.sorted
    val vals = rows.map(_._2).distinct.sorted
    for (Seq(ga, gb) <- grps.combinations(2)) {
      val ca = rows.filter(_._1 == ga).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val cb = rows.filter(_._1 == gb).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val (na, nb) = (ca.values.sum, cb.values.sum)
      var (cuma, cumb, m) = (0L, 0L, 0L)
      vals.foreach { v =>
        cuma += ca.getOrElse(v, 0L); cumb += cb.getOrElse(v, 0L)
        m = math.max(m, math.abs(cuma * nb - cumb * na))
      }
      assert(got((ga, gb)) === m, s"pair ($ga,$gb)")
    }
  }

  test("Wasserstein: a pure shift by k scores exactly k; identical samples score 0") {
    // a uniform on {1..4}, b uniform on {3..6} — every unit of mass moves
    // exactly 2 → W₁ = 2.000
    val a = (1 to 4).flatMap(v => Seq.fill(25)(("a", v.toLong)))
    val b = (3 to 6).flatMap(v => Seq.fill(25)(("b", v.toLong)))
    val r = Evaluation.wassersteinPairsFrom((a ++ b).toDF("grp", "v")).collect().head
    assert(r.getAs[Long]("w1_milli") === 2000L)
    val same = Evaluation.wassersteinPairsFrom(
      (Seq.fill(30)(("a", 5L)) ++ Seq.fill(40)(("b", 5L))).toDF("grp", "v"))
      .collect().head
    assert(same.getAs[Long]("w1_milli") === 0L)
    // non-unit support spacing: a all at 0, b all at 10 → W₁ = 10
    val wide = Evaluation.wassersteinPairsFrom(
      (Seq.fill(10)(("a", 0L)) ++ Seq.fill(10)(("b", 10L))).toDF("grp", "v"))
      .collect().head
    assert(wide.getAs[Long]("w1_milli") === 10000L)
  }

  test("TVD: hand-computed month pair, gap tie breaks to the smaller bin") {
    import java.sql.Date
    val m1 = Date.valueOf("2024-01-01")
    val m2 = Date.valueOf("2024-02-01")
    val rows =
      Seq.fill(6)((m1, "A")) ++ Seq.fill(4)((m1, "B")) ++
        Seq.fill(2)((m2, "A")) ++ Seq.fill(8)((m2, "B"))
    val got = Evaluation.tvDriftFrom(rows.toDF("month", "bin")).collect()
    assert(got.length === 1)
    val r = got.head
    // TVD = ½(|0.6−0.2| + |0.4−0.8|) = 0.4; both bins gap |6·10−2·10| = 40 → tie → 'A'
    assert(r.getAs[Long]("tvd_ppm") === 400000L)
    assert(r.getAs[String]("top_bin") === "A")
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) === ((10L, 10L)))
  }

  test("TVD: a bin present only in one month still counts (grid fill)") {
    import java.sql.Date
    val m1 = Date.valueOf("2024-01-01")
    val m2 = Date.valueOf("2024-02-01")
    val rows = Seq.fill(10)((m1, "A")) ++ Seq.fill(5)((m2, "A")) ++ Seq.fill(5)((m2, "Z"))
    val r = Evaluation.tvDriftFrom(rows.toDF("month", "bin")).collect().head
    // p = (1, 0), q = (0.5, 0.5) → TVD = 0.5; the moved mass is on both
    // bins equally (gap 50 each) → tie → 'A'
    assert(r.getAs[Long]("tvd_ppm") === 500000L)
    assert(r.getAs[String]("top_bin") === "A")
  }

  test("chi-square: proportional table scores 0, diagonal-heavy fires, zero cells contribute") {
    // exactly proportional 2×2 (independence): χ² = 0, must not fire
    val indep =
      Seq.fill(20)(("x", "u")) ++ Seq.fill(20)(("x", "w")) ++
        Seq.fill(10)(("y", "u")) ++ Seq.fill(10)(("y", "w"))
    val ri = Evaluation.chiSquareCells(indep.toDF("a", "b")).collect()
    assert(ri.forall(_.getAs[Long]("chi2_milli") === 0L))
    assert(ri.forall(_.getAs[Long]("significant") === 0L))
    // perfectly dependent 2×2 with EMPTY off-diagonal cells: the grid must
    // materialize them (o=0 contributes r·c·1000 div N each); full χ² = N
    val dep = Seq.fill(30)(("x", "u")) ++ Seq.fill(30)(("y", "w"))
    val rd = Evaluation.chiSquareCells(dep.toDF("a", "b")).collect()
    assert(rd.length === 4, "2×2 grid incl. the two unobserved cells")
    // χ² for a perfect 2×2 association = N = 60 → 60000 milli (df=1 crit 3841)
    assert(rd.head.getAs[Long]("chi2_milli") === 60000L)
    assert(rd.forall(_.getAs[Long]("df") === 1L))
    assert(rd.forall(_.getAs[Long]("significant") === 1L))
    val zeroCell = rd.find(r => r.getAs[String]("a") == "x" && r.getAs[String]("b") == "w").get
    assert(zeroCell.getAs[Long]("observed") === 0L)
    assert(zeroCell.getAs[Long]("term_milli") === 15000L) // r·c·1000 div N = 30·30·1000/60
  }
}
