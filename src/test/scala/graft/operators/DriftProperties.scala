package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator properties for the round-9 measurement kernels:
  * for ARBITRARY random histograms/streams and arbitrary partition
  * counts, the distributed KS / TVD / χ² / Misra–Gries implementations
  * must match small in-JVM references implementing the published
  * formulas directly. The planted fixtures pin known boundaries; these
  * pin the inputs nobody thought to plant.
  *
  * (Generators sampled with fixed seeds — the scalatest-plus bridge is
  * not on the offline classpath; same convention as GraphProperties.)
  */
class DriftProperties extends SparkSpec {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default.withSize(40), Seed(seed))

  /** Random two-group observation list over a small value domain —
    * duplicates and one-sided values are the interesting cases. */
  private val twoGroupGen: Gen[Seq[(String, Long)]] = for {
    na <- Gen.chooseNum(1, 120)
    nb <- Gen.chooseNum(1, 120)
    va <- Gen.listOfN(na, Gen.chooseNum(0L, 12L))
    vb <- Gen.listOfN(nb, Gen.chooseNum(0L, 12L))
  } yield va.map(("a", _)) ++ vb.map(("b", _))

  test("KS statistic equals the direct sup-of-CDF-gap reference on random samples") {
    for (seed <- 1L to 12L) {
      val obs = sample(twoGroupGen, seed)
      val a = obs.filter(_._1 == "a").map(_._2)
      val b = obs.filter(_._1 == "b").map(_._2)
      val vals = obs.map(_._2).distinct.sorted
      val (na, nb) = (a.size.toLong, b.size.toLong)
      var (ca, cb, m) = (0L, 0L, 0L)
      vals.foreach { v =>
        ca += a.count(_ == v); cb += b.count(_ == v)
        m = math.max(m, math.abs(ca * nb - cb * na))
      }
      val r = Evaluation.ksPairsFrom(obs.toDF("grp", "v")).collect().head
      assert(r.getAs[Long]("ks_num") === m, s"seed=$seed")
      assert(r.getAs[Long]("n_a") === na, s"seed=$seed")
      assert(r.getAs[Long]("n_b") === nb, s"seed=$seed")
      // significance must agree with the BigInt form of the same inequality
      val sig = BigInt(m) * m * 1000000 > BigInt(1844164) * na * nb * (na + nb)
      assert(r.getAs[Long]("significant") === (if (sig) 1L else 0L), s"seed=$seed")
    }
  }

  test("Wasserstein equals the direct sum-of-CDF-gaps reference on random samples") {
    for (seed <- 21L to 32L) {
      val obs = sample(twoGroupGen, seed)
      val a = obs.filter(_._1 == "a").map(_._2)
      val b = obs.filter(_._1 == "b").map(_._2)
      val vals = obs.map(_._2).distinct.sorted
      val (na, nb) = (a.size.toLong, b.size.toLong)
      var (ca, cb) = (0L, 0L)
      var w1 = BigInt(0)
      vals.zipWithIndex.foreach { case (v, i) =>
        ca += a.count(_ == v); cb += b.count(_ == v)
        val dv = if (i + 1 < vals.size) vals(i + 1) - v else 0L
        w1 += BigInt((ca * nb - cb * na).abs) * dv
      }
      val r = Evaluation.wassersteinPairsFrom(obs.toDF("grp", "v")).collect().head
      assert(r.getAs[Long]("w1_num") === w1.toLong, s"seed=$seed")
      assert(r.getAs[Long]("w1_milli") === (w1 * 1000 / (BigInt(na) * nb)).toLong,
        s"seed=$seed")
    }
  }

  test("chi-square cells equal the floored-term reference on random contingency tables") {
    val gen: Gen[Seq[(String, String)]] = for {
      n <- Gen.chooseNum(4, 200)
      rows <- Gen.listOfN(n, for {
        x <- Gen.oneOf("p", "q", "r")
        y <- Gen.oneOf("u", "v")
      } yield (x, y))
    } yield rows
    for (seed <- 1L to 12L) {
      val obs = sample(gen, seed)
      val as = obs.map(_._1).distinct.sorted
      val bs = obs.map(_._2).distinct.sorted
      val n = obs.size.toLong
      val cnt = obs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val terms = for (x <- as; y <- bs) yield {
        val o = cnt.getOrElse((x, y), 0L)
        val r = obs.count(_._1 == x).toLong
        val c = obs.count(_._2 == y).toLong
        val d = BigInt(o) * n - BigInt(r) * c
        (x, y, (d * d * 1000 / (BigInt(r) * c * n)).toLong)
      }
      val chi2 = terms.map(_._3).sum
      val got = Evaluation.chiSquareCells(obs.toDF("a", "b")).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getAs[Long]("term_milli"), r.getAs[Long]("chi2_milli")))
        .toMap
      assert(got.size === as.size * bs.size, s"seed=$seed: grid size")
      terms.foreach { case (x, y, t) =>
        assert(got((x, y))._1 === t, s"seed=$seed cell ($x,$y)")
        assert(got((x, y))._2 === chi2, s"seed=$seed total")
      }
    }
  }

  test("MG invariants hold on random streams across random partition counts") {
    val gen: Gen[(Seq[String], Int, Int)] = for {
      distinct <- Gen.chooseNum(5, 80)
      n <- Gen.chooseNum(30, 400)
      items <- Gen.listOfN(n, Gen.chooseNum(0, distinct - 1).map(i => f"i$i%03d"))
      k <- Gen.chooseNum(3, 25)
      parts <- Gen.chooseNum(1, 9)
    } yield (items, k, parts)
    for (seed <- 1L to 10L) {
      val (items, k, parts) = sample(gen, seed)
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toLong
      val mg = org.apache.spark.sql.functions.udaf(new graft.functions.MisraGriesAgg(k))
      val est = items.toDF("term").repartition(parts)
        .agg(mg(org.apache.spark.sql.functions.col("term")).as("sk"))
        .collect()(0).getAs[Map[String, Long]]("sk")
      assert(est.size <= k, s"seed=$seed: size cap")
      est.foreach { case (t, e) =>
        assert(e >= 1 && e <= truth(t), s"seed=$seed: $t est $e vs ${truth(t)}")
        assert((truth(t) - e) * (k + 1) <= n, s"seed=$seed: $t under-read bound")
      }
      // guaranteed retention: every item heavier than n/(k+1) must survive
      truth.foreach { case (t, f) =>
        if (f * (k + 1) > n)
          assert(est.contains(t), s"seed=$seed: heavy $t (f=$f, n=$n, k=$k) evicted")
      }
    }
  }
}
