package graft.operators

import java.time.{DayOfWeek, Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.time.temporal.TemporalAdjusters

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Third-opinion checks for the Analytics pack: every query already has a
  * DuckDB oracle twin; these recompute the same answers IN THE JVM with
  * straight-line Scala (different code path from both engines), plus
  * synthetic-graph semantics for BFS that the corpus-driven gate query
  * can't isolate. */
class AnalyticsSpec extends SparkSpec {

  private def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  /** Collected events as (event_id, epochMicros, user_id, event_type, cents). */
  private lazy val rawEvents: Seq[(Long, Long, Long, String, Long)] =
    Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .toSeq
      .map { r =>
        val ts = r.getTimestamp(1)
        val micros = math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
        (r.getLong(0), micros, r.getLong(2), r.getString(3), cents(r.getDouble(4)))
      }

  private def lowerMedian(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s((s.size + 1) / 2 - 1)
  }

  test("skyline equals the brute-force O(n^2) dominance filter") {
    val parts = Tables.part(spark, sfDir)
      .select("p_partkey", "p_retailprice", "p_size")
      .collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1)), r.getInt(2)))
    val want = parts.filter { case (_, pc, sz) =>
      !parts.exists { case (_, pc2, sz2) =>
        pc2 <= pc && sz2 >= sz && (pc2 < pc || sz2 > sz)
      }
    }.sortBy(p => (p._2, p._1)).toSeq
    val got = Analytics.qSkyline(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === want)
  }

  test("max concurrency equals an in-JVM sweep over the same session rule") {
    // sessions: per user, (ts, event_id) order, floor-second gap > 1800 splits
    val sessions = rawEvents
      .groupBy(_._3)
      .values
      .flatMap { evs =>
        val sorted = evs.sortBy(e => (e._2, e._1))
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (stMicros, enMicros)
        var st, en = -1L
        sorted.foreach { e =>
          val t = e._2
          if (st < 0) { st = t; en = t }
          else if (t / 1000000L - en / 1000000L > 1800) { out += ((st, en)); st = t; en = t }
          else en = math.max(en, t)
        }
        if (st >= 0) out += ((st, en))
        out
      }
    val deltas = scala.collection.mutable.TreeMap.empty[Long, Long]
    sessions.foreach { case (st, en) =>
      deltas(st) = deltas.getOrElse(st, 0L) + 1
      deltas(en + 1) = deltas.getOrElse(en + 1, 0L) - 1
    }
    val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS").withZone(ZoneOffset.UTC)
    var run = 0L
    val sweep = deltas.toSeq.map { case (t, d) =>
      run += d
      (fmt.format(Instant.ofEpochSecond(t / 1000000L, (t % 1000000L) * 1000L)), run)
    }
    val want = sweep.sortBy { case (ts, conc) => (-conc, ts) }.take(10)
    val got = Analytics.qMaxConcurrency(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("MAD outliers equal the in-JVM lower-median recomputation") {
    val want = rawEvents
      .groupBy(_._4)
      .map { case (et, evs) =>
        val vs = evs.map(_._5).toSeq
        val med = lowerMedian(vs)
        val devs = vs.map(v => math.abs(v - med))
        val mad = lowerMedian(devs)
        (et, vs.size.toLong, med, mad, devs.count(_ > 3 * mad).toLong)
      }
      .toSeq
      .sortBy(_._1)
    val got = Analytics.qMadOutliers(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
  }

  test("trimmed/winsorized sums equal the in-JVM sort-and-slice recomputation") {
    // independent algorithm: materialize, sort, drop/clamp k rows per
    // end — no histogram, no windows, no boundary-partial arithmetic
    val want = rawEvents
      .groupBy(_._4)
      .map { case (et, evs) =>
        val vs = evs.map(_._5).toSeq.sorted
        val n = vs.size
        val k = n / 10
        val kept = vs.slice(k, n - k)
        val winsor = Seq.fill(k)(vs(k)).sum + kept.sum + Seq.fill(k)(vs(n - k - 1)).sum
        (et, n.toLong, (n - 2 * k).toLong, kept.sum, winsor)
      }
      .toSeq
      .sortBy(_._1)
    val got = Analytics.qTrimmedStats(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
  }

  test("retention cohorts equal the in-JVM calendar recomputation") {
    val days = rawEvents.map { e =>
      (e._3, Instant.ofEpochSecond(e._2 / 1000000L).atZone(ZoneOffset.UTC).toLocalDate)
    }
    val cohort = days.groupBy(_._1).map { case (u, ds) =>
      u -> ds.map(_._2).min.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
    }
    val want = days
      .map { case (u, day) =>
        val cw = cohort(u)
        (u, cw, java.time.temporal.ChronoUnit.DAYS.between(cw, day) / 7)
      }
      .distinct
      .groupBy(t => (t._2, t._3))
      .map { case ((cw, ws), us) => (cw.toString, ws, us.size.toLong) }
      .toSeq
      .sortBy(t => (t._1, t._2))
    val got = Analytics.qRetentionCohorts(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
  }

  test("item-CF top-3 equals the in-JVM basket recomputation") {
    val baskets = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .distinct
      .groupBy(_._1)
      .values
      .map(_.map(_._2).sorted)
      .filter(_.size <= 50)
      .toSeq
    val n = baskets.flatten.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val cooc = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.foreach { b =>
      for (i <- b.indices; j <- i + 1 until b.size)
        cooc((b(i), b(j))) = cooc.getOrElse((b(i), b(j)), 0L) + 1
    }
    val directed = cooc.toSeq.filter(_._2 >= 2).flatMap { case ((a, b), c) =>
      Seq((a, b, c), (b, a, c))
    }
    val want = directed
      .map { case (item, nb, c) => (item, nb, c, c * 1000000L / (n(item) + n(nb) - c)) }
      .groupBy(_._1)
      .toSeq
      .flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._4, r._2)).take(3).zipWithIndex.map { case (r, i) =>
          (r._1, r._2, r._3, r._4, i + 1L)
        }
      }
      .sortBy(r => (r._1, r._5))
    val got = Analytics.qItemCf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
  }

  test("EWMA forecast equals the in-JVM dyadic kernel") {
    val hours = rawEvents.groupBy(e => (e._4, e._2 / 3600000000L)).map { case (k, evs) =>
      k -> evs.size.toLong
    }
    val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)
    val want = hours.keys.map(_._1).toSeq.distinct.sorted.flatMap { et =>
      val hs = hours.keys.filter(_._1 == et).map(_._2)
      val (mn, mx) = (hs.min, hs.max)
      (mn to mx).flatMap { h =>
        val nz = (1 to 8).map(i => hours.getOrElse((et, h - i), 0L))
        if (h - 8 < mn) None
        else {
          val num = nz.zipWithIndex.map { case (v, i) => v * (1L << (7 - i)) }.sum
          val f = num / 255L
          val actual = hours.getOrElse((et, h), 0L)
          Some((et, fmt.format(Instant.ofEpochSecond(h * 3600L)), actual, f, math.abs(actual - f)))
        }
      }
    }
    val got = Analytics.qEwmaForecast(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
  }

  test("gap fill carries the last observed value forward, exactly") {
    val rows = Analytics.qGapFill(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.head._5 === 0, "first spine hour per type must be observed")
      var lastObserved = Long.MinValue
      sorted.foreach { case (_, _, n, svF, isGap) =>
        if (isGap == 0) lastObserved = svF
        else {
          assert(n === 0L, "gap hour with events")
          assert(svF === lastObserved, "LOCF must carry the previous observed sum")
        }
      }
    }
    // sanity: the spine actually contains gaps at this SF, else LOCF is untested
    assert(rows.exists(_._5 == 1), "no gap hours at sf0.001 — fixture assumption broken")
  }

  test("poisson bootstrap brackets the point estimate, per type") {
    val got = Analytics.qPoissonBootstrap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length === 5)
    got.foreach { case (et, mean, lo, med, hi) =>
      assert(lo <= med && med <= hi, s"$et: bootstrap order violated ($lo, $med, $hi)")
      assert(lo <= mean && mean <= hi, s"$et: point mean $mean outside bootstrap range ($lo, $hi)")
      assert(hi - lo > 0, s"$et: degenerate bootstrap spread")
    }
  }

  test("k-core equals the in-JVM peeling fixpoint on the co-purchase graph") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val baskets = li.groupBy(_._1).values.map(_.map(_._2).sorted).filter(_.size <= 50)
    val cooc = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.foreach { b =>
      for (i <- b.indices; j <- i + 1 until b.size)
        cooc((b(i), b(j))) = cooc.getOrElse((b(i), b(j)), 0L) + 1
    }
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    cooc.filter(_._2 >= 2).keys.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    var cur = adj.keySet.toSet
    var done = false
    while (!done) {
      val next = cur.filter(n => (adj(n) & cur).size >= 2)
      done = next == cur
      cur = next
    }
    val want = cur.toSeq.sorted.map(n => (n, (adj(n) & cur).size.toLong))
    val got = Analytics.qKcore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("k-core peels a path tail round by round, keeps the cycle") {
    // cycle c0..c4 plus a pendant path c0-t1-t2-t3: the path peels from
    // the far end inward (3 genuine rounds), the cycle is the 2-core
    import spark.implicits._
    val cycle = (0 until 5).map(i => (s"c$i", s"c${(i + 1) % 5}"))
    val tail = Seq(("c0", "t1"), ("t1", "t2"), ("t2", "t3"))
    val und = (cycle ++ tail).map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .toDF("ia", "ib")
    val got = Analytics.kcoreFrom(und).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === (0 until 5).map(i => (s"c$i", 2L)))
  }

  test("delta-peeling k-core agrees with the rescan formulation on a layered graph") {
    // K4 core, a 5-cycle grafted to it, pendant paths off both, and an
    // isolated edge — exercises multi-round deltas, the degree
    // decrement path, and full-component elimination
    import spark.implicits._
    val k4 = for (i <- 0 until 4; j <- i + 1 until 4) yield (s"k$i", s"k$j")
    val cyc = (0 until 5).map(i => (s"y$i", s"y${(i + 1) % 5}")) :+ (("k0", "y0"))
    val tails = Seq(("k1", "a1"), ("a1", "a2"), ("y2", "b1"), ("b1", "b2"), ("b2", "b3"))
    val iso = Seq(("z1", "z2"))
    val und = (k4 ++ cyc ++ tails ++ iso)
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .toDF("ia", "ib")
    val delta = Analytics.kcoreFrom(und).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val rescan = Analytics.kcoreRescanFrom(und).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(delta === rescan)
    assert(delta.nonEmpty && delta.forall(_._2 >= 2))
  }

  test("rolling 7-day actives match hand-computed windows on a planted activity log") {
    import spark.implicits._
    // March 2024: u1 active days 1,5,12; u2 days 1,2; u3 day 12; u4 day 5.
    // Observed grid {1, 2, 5, 12}; 7-day windows count distinct users:
    //   day 1  [Feb 24..1]: u1, u2        = 2
    //   day 2  [Feb 25..2]: u1, u2        = 2
    //   day 5  [Feb 28..5]: u1, u2, u4    = 3
    //   day 12 [6..12]:     u1, u3        = 2  (u2's last activity, day 2,
    //                                          has aged out of the window)
    val act = Seq(
      (1L, "2024-03-01"), (1L, "2024-03-05"), (1L, "2024-03-12"),
      (2L, "2024-03-01"), (2L, "2024-03-02"),
      (3L, "2024-03-12"),
      (4L, "2024-03-05"), (4L, "2024-03-05")) // duplicate absorbed
      .toDF("user_id", "day_s")
      .select(col("user_id"), to_date(col("day_s")).as("day"))
    val got = Analytics.rollingActiveFrom(act).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(
      ("2024-03-01", 2L), ("2024-03-02", 2L), ("2024-03-05", 3L), ("2024-03-12", 2L)))
  }

  test("DAU/MAU stickiness matches hand-computed windows on the planted activity log") {
    import spark.implicits._
    // same fixture as the WAU spec: u1 days 1,5,12; u2 days 1,2; u3 day
    // 12; u4 day 5 — all March 2024, so every 30-day window reaches back
    // past the first activity:
    //   day 1:  dau {u1,u2}=2        mau {u1,u2}=2        → 1000000
    //   day 2:  dau {u2}=1           mau {u1,u2}=2        → 500000
    //   day 5:  dau {u1,u4}=2        mau {u1,u2,u4}=3     → 666666
    //   day 12: dau {u1,u3}=2        mau all 4            → 500000
    val act = Seq(
      (1L, "2024-03-01"), (1L, "2024-03-05"), (1L, "2024-03-12"),
      (2L, "2024-03-01"), (2L, "2024-03-02"),
      (3L, "2024-03-12"), (4L, "2024-03-05"))
      .toDF("user_id", "day_s")
      .select(col("user_id"), to_date(col("day_s")).as("day"))
    val got = Analytics.rollingDistinctFrom(act, 1, "dau")
      .join(Analytics.rollingDistinctFrom(act, 30, "mau"), "day")
      .withColumn("ppm", expr("dau * 1000000 div mau"))
      .orderBy("day")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      ("2024-03-01", 2L, 2L, 1000000L), ("2024-03-02", 1L, 2L, 500000L),
      ("2024-03-05", 2L, 3L, 666666L), ("2024-03-12", 2L, 4L, 500000L)))
  }

  test("audience overlap counts and Jaccard match a planted user-type log") {
    import spark.implicits._
    // types: u1 {a,b}, u2 {a,b,c}, u3 {a}, u4 {c}
    // pairs: (a,b): u1,u2 = 2; (a,c): u2 = 1; (b,c): u2 = 1
    // totals: a=3, b=2, c=2
    // jaccard_ppm: (a,b) 2*1e6 // (3+2-2) = 666666; (a,c) 1e6 // 4 = 250000;
    //              (b,c) 1e6 // 3 = 333333
    val ue = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (4L, "c"), (1L, "a")) // duplicate absorbed
      .toDF("user_id", "event_type")
    val got = Analytics.audienceOverlapFrom(ue).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      ("a", "b", 2L, 666666L), ("a", "c", 1L, 250000L), ("b", "c", 1L, 333333L)))
  }

  test("BFS levels are exact hop distances on a synthetic path + hub graph") {
    // path 0-1-2-...-9 plus a hub h connected to node 0 via 3 spokes
    import spark.implicits._
    val path = (0 until 9).map(i => (s"p$i", s"p${i + 1}"))
    val spokes = Seq(("hub", "p0"), ("hub", "s1"), ("hub", "s2"))
    val und = (path ++ spokes).toDF("src", "dst")
    val edges = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
    val seed = Seq(("hub", 0L)).toDF("node", "lvl")
    val got = TextOps.bfsFrom(edges, seed).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val want = Map("hub" -> 0L, "s1" -> 1L, "s2" -> 1L) ++
      (0 until 10).map(i => s"p$i" -> (i + 1L))
    assert(got === want)
  }

  test("BFS stops at the depth cap on a long path") {
    import spark.implicits._
    val und = (0 until 30).map(i => (f"n$i%02d", f"n${i + 1}%02d")).toDF("src", "dst")
    val edges = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
    val seed = Seq(("n00", 0L)).toDF("node", "lvl")
    val got = TextOps.bfsFrom(edges, seed).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(_._2).max === 20L, "depth cap not applied")
    assert(got.length === 21, "nodes beyond the cap must be absent")
  }

  test("RFM segments match an in-JVM recomputation of boundaries and buckets") {
    // independent implementation: sorted-distinct cumulative quartile
    // boundaries (lower-quantile), then 1 + Σ v>b_k bucketing
    val dayOf = (micros: Long) =>
      java.time.Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L))
        .atZone(ZoneOffset.UTC).toLocalDate
    val perUser = rawEvents.groupBy(_._3).map { case (uid, evs) =>
      val days = evs.map(e => dayOf(e._2))
      (uid, days.max, evs.size.toLong, evs.map(_._5).sum)
    }.toSeq
    val now = perUser.map(_._2).max
    val rfm = perUser.map { case (uid, last, freq, monC) =>
      (uid, java.time.temporal.ChronoUnit.DAYS.between(last, now), freq, monC,
        Math.floorDiv(monC, 100L))
    }
    def bounds(vs: Seq[Long]): (Long, Long, Long) = {
      val hist = vs.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val n = vs.size.toLong
      val cums = hist.scanLeft((0L, 0L)) { case ((_, c), (v, k)) => (v, c + k) }.drop(1)
      def b(k: Int) = cums.find { case (_, c) => c * 4 >= n * k }.get._1
      (b(1), b(2), b(3))
    }
    val rb = bounds(rfm.map(_._2)); val fb = bounds(rfm.map(_._3)); val mb = bounds(rfm.map(_._5))
    def bucket(v: Long, b: (Long, Long, Long)): Long =
      1L + (if (v > b._1) 1 else 0) + (if (v > b._2) 1 else 0) + (if (v > b._3) 1 else 0)
    val want = rfm
      .groupBy { case (_, rec, freq, _, monD) => (bucket(rec, rb), bucket(freq, fb), bucket(monD, mb)) }
      .map { case (k, us) => k -> (us.size.toLong, us.map(_._4).sum) }
    val got = Analytics.qRfmSegments(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(got === want)
    assert(got.values.map(_._1).sum === perUser.size.toLong, "every user in exactly one segment")
  }
}
