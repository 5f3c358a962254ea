package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator properties for the distributed graph kernels that
  * were re-derived for scale (CC with the partition-local contraction
  * pre-pass; delta-peeling k-core): for ARBITRARY random graphs and
  * ARBITRARY partition counts, each must equal a small in-JVM reference
  * implementing the published definition directly. The planted fixtures
  * pin known shapes; these pin the shapes nobody thought to plant —
  * especially partition boundaries slicing components in adversarial
  * ways, which is exactly the surface the contraction pre-pass added.
  *
  * (Generators are sampled with fixed seeds rather than through the
  * scalatest-plus bridge, which isn't on the offline classpath.)
  */
class GraphProperties extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default.withSize(40), Seed(seed))

  /** Random simple undirected graph: node ids are SPARSE (×1000 + offset)
    * so accidental id-arithmetic bugs can't hide behind dense 0..n ids. */
  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.chooseNum(2, 120)
    m <- Gen.chooseNum(1, 300)
    raw <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(0L, n - 1L)
      b <- Gen.chooseNum(0L, n - 1L)
    } yield (a, b))
  } yield raw
    .filter { case (a, b) => a != b }
    .map { case (a, b) => (math.min(a, b) * 1000 + 7, math.max(a, b) * 1000 + 7) }
    .distinct

  private def adjacency(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] = {
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    adj.toMap
  }

  /** Reference CC: min node id per component, BFS from each node. */
  private def refCc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = adjacency(edges)
    val label = scala.collection.mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { root =>
      if (!label.contains(root)) {
        var frontier = Set(root)
        val seen = scala.collection.mutable.Set(root)
        while (frontier.nonEmpty) {
          frontier.foreach(n => label(n) = root)
          frontier = frontier.flatMap(adj).filterNot(seen)
          seen ++= frontier
        }
      }
    }
    label.toMap
  }

  /** Reference k=2 core with the SAME 16-round cap as the operator (the
    * oracle's unrolled-stage contract): peel nodes of degree < 2 among
    * survivors, at most 16 rounds, then report within-survivor degrees. */
  private def refKcore(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = adjacency(edges)
    var cur = adj.keySet
    var rounds = 0
    var changed = true
    while (changed && rounds < 16) {
      val next = cur.filter(n => (adj(n) & cur).size >= 2)
      changed = next != cur
      cur = next
      rounds += 1
    }
    cur.iterator.map(n => n -> (adj(n) & cur).size.toLong).toMap
  }

  test("CC labels equal the BFS reference on random graphs across random partitionings") {
    import spark.implicits._
    (1L to 6L).foreach { s =>
      val edges = sample(graphGen, s * 131)
      val parts = 1 + (s % 7).toInt
      val df = edges.toDF("da", "db").repartition(parts)
      val got = Dedup.ccLabelsFrom(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === refCc(edges), s"seed $s parts $parts edges ${edges.size}")
    }
  }

  test("delta-peeling k-core equals the capped peeling reference on random graphs") {
    import spark.implicits._
    (1L to 6L).foreach { s =>
      val edges = sample(graphGen, s * 977)
      val parts = 1 + ((s + 3) % 7).toInt
      val df = edges.toDF("ia", "ib").repartition(parts)
      val got = Analytics.kcoreFrom(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === refKcore(edges), s"seed $s parts $parts edges ${edges.size}")
    }
  }

  /** Reference SSSP: textbook Dijkstra over the doubled weighted edges. */
  private def refSssp(edges: Seq[(Long, Long, Long)], src: Long): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[(Long, Long)]].withDefaultValue(Nil)
    edges.foreach { case (a, b, w) => adj(a) ::= (b, w); adj(b) ::= (a, w) }
    val dist = scala.collection.mutable.Map(src -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, src))(Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (d0, n) = pq.dequeue()
      if (d0 == dist(n))
        adj(n).foreach { case (m, w) =>
          if (dist.get(m).forall(_ > d0 + w)) { dist(m) = d0 + w; pq.enqueue((d0 + w, m)) }
        }
    }
    dist.toMap
  }

  test("relaxation SSSP equals Dijkstra on random weighted graphs across partitionings") {
    import spark.implicits._
    (1L to 6L).foreach { s =>
      val und = sample(graphGen, s * 457)
        .zipWithIndex.map { case ((a, b), i) => (a, b, 1L + (i * 37 + s) % 19) }
      val parts = 1 + ((s + 5) % 7).toInt
      val src = und.map(_._1).min
      val edges = (und ++ und.map { case (a, b, w) => (b, a, w) })
        .toDF("src", "dst", "w").repartition(parts)
      val seed = Seq((src, 0L)).toDF("node", "dmin")
      val got = TextOps.ssspFrom(edges, seed).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === refSssp(und, src), s"seed $s parts $parts edges ${und.size}")
    }
  }

  test("LPA separates two planted triangles joined by a bridge (DuckDB-replayed labeling)") {
    import spark.implicits._
    // expected labels computed by replaying the identical 4-round
    // synchronous min-tiebreak recursion in DuckDB when the card was
    // written — an independent engine, same pure function
    val und = Seq(("1", "2"), ("2", "3"), ("1", "3"), ("4", "5"), ("5", "6"), ("4", "6"), ("3", "4"))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = TextOps.lpaFrom(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("1" -> "1", "2" -> "1", "3" -> "1", "4" -> "3", "5" -> "3", "6" -> "3"))
  }

  test("SSSP takes a cheap multi-hop detour over a heavy direct edge (weighted, not BFS)") {
    import spark.implicits._
    // 1 --100-- 4 ; 1 -1- 2 -1- 3 -1- 4 : dist(4) must be 3, lvl would be 1
    val und = Seq((1L, 4L, 100L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    val edges = (und ++ und.map { case (a, b, w) => (b, a, w) }).toDF("src", "dst", "w")
    val got = TextOps.ssspFrom(edges, Seq((1L, 0L)).toDF("node", "dmin")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }
}
