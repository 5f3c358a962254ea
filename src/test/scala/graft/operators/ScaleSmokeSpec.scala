package graft.operators

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Scale-linearity smoke: run the SAME query code over a 10×-replicated
  * copy of the input and require the exact algebraic relationship to the
  * 1× results. This catches a class of bug the fixed-size oracle can't:
  * anything whose correctness quietly depends on the test volume (an
  * accumulator overflowing, a partial aggregate path skipped, a broadcast
  * that only works because the data is small). Counts must scale
  * STRICTLY exactly; money values are integer-exact inside the query and
  * compared within a couple of ulps (the final /100 and the test's ×rep
  * are double ops with their own rounding). */
class ScaleSmokeSpec extends SparkSpec {

  test("q1 aggregates are exactly linear under 10x replicated input") {
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-").toString
    Tables.lineitem(spark, sfDir)
      .crossJoin(spark.range(rep)) // every row 10×
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")

    val base = Relational.q1Pricing(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val scaled = Relational.q1Pricing(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(scaled.keySet === base.keySet)

    // Sums are integer-exact INSIDE the query; the final /100 and the
    // test's own ×rep happen in doubles, so the comparison allows one
    // part in 1e12 (a couple of ulps) — counts stay strictly exact.
    def close(a: Double, b: Double, what: String): Unit =
      assert(math.abs(a - b) <= math.abs(b) * 1e-12, s"$what: $a vs $b")
    base.foreach { case (k, b) =>
      val s10 = scaled(k)
      close(s10.getDouble(2), b.getDouble(2) * rep, s"$k sum_qty")
      close(s10.getDouble(3), b.getDouble(3) * rep, s"$k sum_base_price")
      close(s10.getDouble(4), b.getDouble(4) * rep, s"$k sum_disc_price")
      close(s10.getDouble(5), b.getDouble(5) * rep, s"$k sum_charge")
      assert(s10.getLong(9) === b.getLong(9) * rep, s"$k count_order")
      // intensive averages are volume-invariant
      close(s10.getDouble(6), b.getDouble(6), s"$k avg_qty")
      close(s10.getDouble(7), b.getDouble(7), s"$k avg_price")
      close(s10.getDouble(8), b.getDouble(8), s"$k avg_disc")
    }
  }

  test("BPE pair counts are exactly linear under 10x replicated documents") {
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-bpe-").toString
    // distinct doc_ids per replica (the pair statistic ignores doc_id, but
    // keep the table well-formed)
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("doc_id", col("doc_id") + col("id") * 1000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val base = TextOps.qBpePairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val scaled = TextOps.qBpePairs(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // ×rep preserves both every count and the (cnt desc, pair) order, so
    // the top-30 must be the same pairs in the same positions
    assert(scaled === base.map { case (p, c) => (p, c * rep) })
  }

  test("sequence packing totals are exactly linear under 10x replicated documents") {
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-pack-").toString
    // replica k appends AFTER the original in doc_id order → each source's
    // token stream is rep concatenated copies; totals must scale exactly
    // and the bin count per source is ceil(rep·T_s / cap), computable from
    // the 1x totals
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("doc_id", col("doc_id") + col("id") * 1000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val cap = 512L
    // independent expectation: per-source doc token lengths in doc_id
    // order, concatenated rep times; a bin exists iff some doc STARTS in
    // it (bin = floor(tokens-before / cap))
    val baseLens = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        size(graft.functions.NativeExprs.tokens(col("text"))).cast("long").as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (s, xs) => s -> xs.sortBy(_._2).map(_._3) }
    val expected = baseLens.map { case (src, lens) =>
      val stream = Seq.fill(rep)(lens).flatten
      val starts = stream.scanLeft(0L)(_ + _).dropRight(1)
      src -> (stream.sum, starts.map(_ / cap).distinct.length.toLong)
    }
    val scaled = Sampling.qPackSequences(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(3)))
    val scaledTok = scaled.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val scaledBins = scaled.groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    expected.foreach { case (src, (tokTotal, bins)) =>
      assert(scaledTok(src) === tokTotal, s"$src token total not linear")
      assert(scaledBins(src) === bins, s"$src bin count disagrees with recomputation")
    }
  }

  test("chunking is content-pure: 10x replicas chunk identically") {
    // chunk boundaries and hashes depend ONLY on the document text, so a
    // replica must chunk exactly like its original — the append-stability
    // claim (re-chunking a grown corpus never moves an existing chunk) as
    // an executable property
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-chunk-").toString
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("doc_id", col("doc_id") + col("id") * 1000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def rows(d: String) = TextOps.qChunkWindows(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val base = rows(sfDir).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq.sorted }
    val scaled = rows(tmp)
    assert(scaled.length === base.values.map(_.size).sum * rep)
    scaled.groupBy(_._1).foreach { case (id, v) =>
      assert(v.map(_._2).toSeq.sorted === base(id % 1000000L), s"doc $id chunks moved")
    }
  }

  test("DSIR votes are invariant under 10x corpus replication") {
    // exact replication scales every bucket count and both totals by rep,
    // so each cross-multiplied share comparison scales by rep² on both
    // sides — identical votes, identical scores, identical admissions.
    // Catches any drift toward volume-dependent scoring (absolute-count
    // thresholds, un-normalized smoothing).
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-dsir-").toString
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("doc_id", col("doc_id") + col("id") * 1000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def rows(d: String) = Sampling.qDsirScore(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val base = rows(sfDir).toMap
    val scaled = rows(tmp)
    assert(scaled.length === base.size * rep)
    scaled.foreach { case (id, v) =>
      assert(v === base(id % 1000000L), s"doc $id score changed under replication")
    }
  }

  test("wordcount counts are exactly linear under 10x replicated documents") {
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-doc-").toString
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(rep))
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val base = TextOps.qWordcount(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val scaled = TextOps.qWordcount(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(scaled === base.map { case (w, n) => w -> n * rep })
  }

  /** 10× replica dir with per-replica doc_id shift — shared by the smokes
    * whose invariants need well-formed distinct ids. */
  private def replicatedDocs(rep: Int, tag: String): String = {
    val tmp = Files.createTempDirectory(s"graft-scale-$tag-").toString
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(rep.toLong))
      .withColumn("doc_id", col("doc_id") + col("id") * 1000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("phrase search results replicate exactly under 10x replicated documents") {
    val rep = 10
    val tmp = replicatedDocs(rep, "phrase")
    val base = TextOps.qPhraseSearch(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val scaled = TextOps.qPhraseSearch(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // every replica of a matching doc matches at the same positions,
    // and nothing else matches (postings index rebuilt for the replica dir)
    assert(scaled.size === base.size * rep)
    scaled.foreach { case ((ph, id), v) =>
      assert(v === base((ph, id % 1000000L)), s"($ph, $id) changed under replication")
    }
  }

  test("PMI scores and relative order are invariant under 10x replicated documents") {
    val rep = 10
    val tmp = replicatedDocs(rep, "pmi")
    // N, c_ab, c_a, c_b all scale by rep, so the ratio N·c_ab/(c_a·c_b)
    // is exactly replication-invariant for every pair. The TOP-30 SET is
    // not: the absolute min-count bar (the standard PMI support filter)
    // admits rare pairs only once their count crosses it — at 10× the
    // corpus, pairs with base c_ab ∈ [1, 9] become eligible and (being
    // rare) can out-rank everything. So assert the true invariants:
    // common pairs keep exact (c×10, pmi) values AND their relative
    // order; every new entrant was threshold-filtered at 1×, never
    // re-ranked past an eligible pair.
    val base = TextOps.qPmiPairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val scaled = TextOps.qPmiPairs(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val baseByPair = base.map { case (a, b, c, pmi) => (a, b) -> (c, pmi) }.toMap
    val common = scaled.filter { case (a, b, _, _) => baseByPair.contains((a, b)) }
    common.foreach { case (a, b, c, pmi) =>
      val (c1, pmi1) = baseByPair((a, b))
      assert((c, pmi) === ((c1 * rep, pmi1)), s"($a, $b) not scale-invariant")
    }
    // relative order of common pairs preserved
    val baseOrder = base.map { case (a, b, _, _) => (a, b) }
      .filter(p => common.exists(c => (c._1, c._2) == p))
    assert(common.map(c => (c._1, c._2)) === baseOrder,
      "relative order of commonly-eligible pairs changed under replication")
    // new entrants are exactly the threshold-crossers (base c_ab < 10)
    scaled.filterNot { case (a, b, _, _) => baseByPair.contains((a, b)) }.foreach {
      case (a, b, c, _) =>
        assert(c % rep === 0L && c / rep < 10,
          s"new entrant ($a, $b, $c) was not a min-count threshold-crosser")
    }
    assert(common.nonEmpty, "no common pairs — smoke is vacuous")
  }

  test("Zipf coverage curve is invariant under 10x replicated documents (counts x10)") {
    val rep = 10
    val tmp = replicatedDocs(rep, "zipf")
    // cov_ppm = floor(cum·10⁶/N) is a ratio of extensive quantities —
    // floor((rep·cum)·10⁶/(rep·N)) is the SAME rational, so every rank's
    // coverage is exactly invariant
    val base = TextOps.qZipfCoverage(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val scaled = TextOps.qZipfCoverage(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(scaled === base.map { case (rk, w, c, cum, ppm) => (rk, w, c * rep, cum * rep, ppm) })
  }

  test("event transition ppm is invariant under 10x replicated user streams (counts x10)") {
    // replicate USERS (not rows): each replica gets a disjoint user-id
    // space carrying an identical event sequence, so transition counts
    // scale exactly x10 while the ppm probabilities — floor(n·10⁶/n_from),
    // a ratio of extensive quantities — are bit-identical. Replicating
    // raw rows instead would interleave 10 copies of each event at one
    // timestamp and CHANGE the transition structure; user-level
    // replication is the composition a grown corpus actually has.
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-trans-").toString
    Tables.events(spark, sfDir)
      .crossJoin(spark.range(rep.toLong))
      .withColumn("user_id", col("user_id") + col("id") * 1000000000L)
      .withColumn("event_id", col("event_id") + col("id") * 1000000000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val base = Relational.qEventTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val scaled = Relational.qEventTransitions(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(scaled === base.map { case (f, t, n, nf, ppm) => (f, t, n * rep, nf * rep, ppm) })
  }

  test("k-anonymity attained-k scales x10 under replicated customers; risky groups vanish") {
    // every QI group gains exactly 10 identical members, so the group
    // list is unchanged, attained k is x10, and no group can sit under
    // the k=5 bar anymore (min possible size is now 10)
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-kanon-").toString
    Tables.customer(spark, sfDir)
      .crossJoin(spark.range(rep.toLong))
      .withColumn("c_custkey", col("c_custkey") + col("id") * 1000000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val base = Relational.qKAnonymity(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val scaled = Relational.qKAnonymity(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(scaled === base.map { case (seg, groups, k) => (seg, groups, k * rep, 0L, 0L) })
  }

  test("CDC chunk dedup under 10x replication: every substantial chunk becomes a x10 group") {
    // chunk boundaries are content-pure, so each replica contributes an
    // identical chunk multiset: every distinct substantial (key, len)
    // appears as a group (even 1x-unique chunks are now 10-copy dups),
    // with copies and docs exactly x10
    val rep = 10
    val tmp = replicatedDocs(rep, "cdcdedup")
    val baseChunks = TextOps.qCdcChunks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
      .filter(_._2 >= 24) // (doc_id, len_cp, chunk_key) above the q_cdc_dedup floor
    val expected = baseChunks
      .groupBy(c => (c._3, c._2))
      .map { case ((key, len), xs) =>
        (key, len) -> (xs.length * rep.toLong, xs.map(_._1).distinct.length * rep.toLong,
          xs.map(_._1).min)
      }
    val scaled = TextOps.qCdcDedup(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(scaled.length === expected.size, "group count != distinct substantial chunks")
    scaled.foreach { case (key, len, copies, docs, firstDoc) =>
      val (eCopies, eDocs, eFirst) = expected((key, len))
      assert(copies === eCopies && docs === eDocs && firstDoc === eFirst,
        s"group ($key,$len): got ($copies,$docs,$firstDoc), expected ($eCopies,$eDocs,$eFirst)")
    }
  }

  test("retention cohorts scale x10 under replicated user streams") {
    // disjoint user-id replicas with identical day patterns: each (cohort,
    // week) cell gains exactly 10x the users, the cell set is unchanged
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-cohort-").toString
    Tables.events(spark, sfDir)
      .crossJoin(spark.range(rep.toLong))
      .withColumn("user_id", col("user_id") + col("id") * 1000000000L)
      .withColumn("event_id", col("event_id") + col("id") * 1000000000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val base = Analytics.qRetentionCohorts(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val scaled = Analytics.qRetentionCohorts(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(scaled === base.map { case (cw, ws, n) => (cw, ws, n * rep) })
  }

  test("MAD outliers scale x10 under replicated events: medians invariant, counts x10") {
    // replicating every row x10 preserves the value distribution exactly:
    // lower-median ranks land inside the same value blocks, so med/MAD are
    // bit-identical while the extensive counts scale
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-mad-").toString
    Tables.events(spark, sfDir)
      .crossJoin(spark.range(rep.toLong))
      .withColumn("event_id", col("event_id") + col("id") * 1000000000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val base = Analytics.qMadOutliers(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val scaled = Analytics.qMadOutliers(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(scaled === base.map { case (et, n, med, mad, out) => (et, n * rep, med, mad, out * rep) })
  }

  test("skyline under 10x replicated parts: every frontier point appears in 10 copies") {
    // fresh part keys, identical (price, size) pairs: dominance is
    // non-strict between copies, so each frontier point survives in all
    // replicas and nothing else enters
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-sky-").toString
    Tables.part(spark, sfDir)
      .crossJoin(spark.range(rep.toLong))
      .withColumn("p_partkey", col("p_partkey") + col("id") * 1000000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val base = Analytics.qSkyline(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getInt(2))).groupBy(identity).view.mapValues(_.size).toMap
    val scaled = Analytics.qSkyline(spark, tmp).collect()
      .map(r => (r.getLong(1), r.getInt(2))).groupBy(identity).view.mapValues(_.size).toMap
    assert(scaled === base.view.mapValues(_ * rep).toMap)
  }

  test("item-CF Jaccard is bit-invariant under 10x replicated orders; newcomers are bar-crossers") {
    // disjoint order-key replicas: every pair's cooc and both item counts
    // scale x10, and floor((10a·10⁶)/(10b)) = floor(a·10⁶/b) exactly —
    // the ratio statistic is invariant. The CfMinCooc=2 support bar is
    // ABSOLUTE, so pairs with base cooc 1 (below the bar) legitimately
    // enter at x10 — they must account for ALL new pairs, with cooc
    // exactly rep (the same thresholded-ranking caveat as q_pmi_pairs).
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-itemcf-").toString
    Tables.lineitem(spark, sfDir)
      .crossJoin(spark.range(rep.toLong))
      .withColumn("l_orderkey", col("l_orderkey") + col("id") * 1000000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val base = Analytics.itemCfScored(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("item"), r.getAs[Long]("neighbor")) ->
        (r.getAs[Long]("cooc"), r.getAs[Long]("jac_ppm"))).toMap
    val scaled = Analytics.itemCfScored(spark, tmp).collect()
      .map(r => (r.getAs[Long]("item"), r.getAs[Long]("neighbor")) ->
        (r.getAs[Long]("cooc"), r.getAs[Long]("jac_ppm"))).toMap
    base.foreach { case (k, (cooc, jac)) =>
      val (sc, sj) = scaled(k)
      assert(sc === cooc * rep, s"$k cooc not linear")
      assert(sj === jac, s"$k jaccard not invariant")
    }
    (scaled.keySet -- base.keySet).foreach { k =>
      assert(scaled(k)._1 === rep.toLong, s"unexpected newcomer $k with cooc ${scaled(k)._1}")
    }
  }

  test("centroid confusion counts scale x10 under replicated embeddings") {
    // centroids are floor-div means — invariant when every vector is
    // replicated (floor(k·s / k·n) = floor(s/n)), so each replica
    // predicts identically and every confusion cell scales exactly ×10.
    // A violation here means volume leaked into the classifier (e.g. a
    // sum overflow or a non-deterministic argmin).
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-centroid-").toString
    Tables.embeddings(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("vec_id", col("vec_id") + col("id") * 1000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val base = Evaluation.qCentroidConfusion(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val scaled = Evaluation.qCentroidConfusion(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(scaled.keySet === base.keySet)
    base.foreach { case (k, n) => assert(scaled(k) === n * rep, s"cell $k not linear") }
  }

  test("contract audit scales x10 under PK-disjoint replicated tables") {
    // replicas get disjoint order keys (both sides of the FK move
    // together), so every n_checked and every violation count — including
    // the two genuine generator artifacts — scales exactly ×10
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-contract-").toString
    Tables.lineitem(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("l_orderkey", col("l_orderkey") + col("id") * 1000000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    Tables.orders(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("o_orderkey", col("o_orderkey") + col("id") * 1000000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    for (t <- Seq("customer", "events", "documents"))
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    val base = Evaluation.qDataContract(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val scaled = Evaluation.qDataContract(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(scaled.keySet === base.keySet)
    Seq("lineitem_quantity_range", "lineitem_discount_range", "lineitem_price_positive",
      "lineitem_pk_unique", "lineitem_fk_orders", "lineitem_ship_after_order",
      "orders_pk_unique", "orders_price_positive").foreach { c =>
      assert(scaled(c)._1 === base(c)._1 * rep, s"$c n_checked not linear")
      assert(scaled(c)._2 === base(c)._2 * rep, s"$c violations not linear")
    }
    // replicated orders keep the ORIGINAL custkeys → customer FK stays clean
    assert(scaled("orders_fk_customer") === (base("orders_fk_customer")._1 * rep, 0L))
  }

  test("t-closeness ppm values are invariant under 10x user-level replication") {
    // replicate CUSTOMERS (with their orders, keys offset together): every
    // QI group's sensitive histogram scales by exactly rep, as does the
    // corpus distribution, so each group's TVD — a ratio of counts — is
    // bit-identical; only row totals scale. Catches any volume-dependent
    // drift in the DECIMAL arithmetic (an overflow nulling a product
    // would shift max_tvd_ppm, not just row counts).
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-tclose-").toString
    Tables.customer(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("c_custkey", col("c_custkey") + col("id") * 10000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Tables.orders(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("o_custkey", col("o_custkey") + col("id") * 10000000L)
      .withColumn("o_orderkey", col("o_orderkey") + col("id") * 1000000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val base = Relational.qTCloseness(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val scaled = Relational.qTCloseness(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(scaled.keySet === base.keySet)
    base.foreach { case (seg, (ng, ppm, farG, farR)) =>
      val s10 = scaled(seg)
      // replicas share their original's QI triple, so the GROUPS are the
      // same — group count and every per-group ppm are invariant; only
      // the row totals scale
      assert(s10._1 === ng, s"$seg n_groups changed under replication")
      assert(s10._2 === ppm, s"$seg max_tvd_ppm drifted under replication")
      assert(s10._3 === farG, s"$seg n_far_groups changed under replication")
      assert(s10._4 === farR * rep, s"$seg n_far_rows not linear")
    }
  }

  test("shard plan stays balanced and conserves totals under 10x replicated documents") {
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-shard-").toString
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("doc_id", col("doc_id") + col("id") * 1000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val base = Sampling.qShardPlan(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val scaled = Sampling.qShardPlan(spark, tmp).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(scaled.length === 16)
    assert(scaled.map(_._1).sum === base.map(_._1).sum * rep, "doc total not linear")
    assert(scaled.map(_._2).sum === base.map(_._2).sum * rep, "token total not linear")
    // the balance guarantees are volume-independent properties of the
    // round-robin, not of this corpus size
    val maxDoc = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.size(
        graft.functions.NativeExprs.tokens(col("text"))).cast("long"))
      .collect().map(_.getLong(0)).max
    assert(scaled.map(_._2).max - scaled.map(_._2).min <= maxDoc,
      "10x spread exceeds one maximal document")
    assert(scaled.map(_._1).max - scaled.map(_._1).min <= 1, "10x doc counts differ by more than 1")
  }

  test("vocab growth under 10x replication: tokens x10, types unchanged, hapax vanish") {
    // exact replication multiplies every (source, word) count by 10, so
    // every type now appears >= 10 times — the hapax count must drop to
    // EXACTLY zero, the sharpest form of the tail statistic's contract
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-vocab-").toString
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("doc_id", col("doc_id") + col("id") * 1000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def card(dir: String) = TextOps.qVocabGrowth(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val base = card(sfDir)
    val scaled = card(tmp)
    assert(scaled.keySet === base.keySet)
    base.foreach { case (src, (tok, types, _)) =>
      val (stok, stypes, shapax) = scaled(src)
      assert(stok === tok * rep, s"$src tokens not linear")
      assert(stypes === types, s"$src type count changed under replication")
      assert(shapax === 0L, s"$src hapax survived 10x replication")
    }
  }

  test("readability card under 10x replication: sums x10, Flesch score invariant") {
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-read-").toString
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(rep))
      .withColumn("doc_id", col("doc_id") + col("id") * 1000000L)
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def card(dir: String) = TextOps.qReadability(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val base = card(sfDir)
    val scaled = card(tmp)
    assert(scaled.keySet === base.keySet)
    base.foreach { case (src, (nd, w, s, y, fre)) =>
      // extensive components scale exactly; the score is a ratio of two
      // x10 sums — the SAME rational, so its truncation is bit-identical
      assert(scaled(src) === ((nd * rep, w * rep, s * rep, y * rep, fre)), src)
    }
  }

  test("distinct-shaped event cards are bit-invariant under 10x event replication") {
    // Replicating event ROWS (same users, same timestamps) changes no
    // distinct set: WAU series, audience overlap, and the HLL rollup's
    // exact+verdict columns must all reproduce exactly — catches any
    // accidental dependence on raw row counts in what claims to be
    // distinct-shaped
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-dist-").toString
    Tables.events(spark, sfDir)
      .crossJoin(spark.range(rep))
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    assert(Analytics.qRollingActive(spark, tmp).collect().toSeq ===
      Analytics.qRollingActive(spark, sfDir).collect().toSeq)
    assert(Analytics.qAudienceOverlap(spark, tmp).collect().toSeq ===
      Analytics.qAudienceOverlap(spark, sfDir).collect().toSeq)
    assert(Analytics.qHllRollup(spark, tmp).collect().toSeq ===
      Analytics.qHllRollup(spark, sfDir).collect().toSeq)
  }

  test("autocorrelation card is exactly invariant under 10x replicated events") {
    // Row replication multiplies every hourly count by rep, so dev scales
    // by rep and num/den both by rep² — the ratio is the SAME rational,
    // and floor of the same rational is bit-identical. The grid (min/max
    // hour) is unchanged, so the whole card must match exactly. Catches
    // any volume-dependent drift (overflow, a lag pairing across a
    // replica boundary) the fixed-size oracle can't see.
    val rep = 10
    val tmp = Files.createTempDirectory("graft-scale-acf-").toString
    Tables.events(spark, sfDir)
      .crossJoin(spark.range(rep))
      .drop("id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    def card(dir: String) = Relational.qAutocorr(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val base = card(sfDir)
    assert(base.nonEmpty)
    assert(card(tmp) === base)
  }
}
