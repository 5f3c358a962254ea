package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generator properties for the unigram-LM trainer: for
  * ARBITRARY random type tables (the planted ExtrasSpec fixture pins one
  * hand-derived trajectory; these pin the inputs nobody thought to
  * plant), the trainer must hold its structural contract — full
  * coverage, character-mass conservation, the exact vocabulary-size
  * formula, permutation invariance of the inputs, and agreement between
  * the vocabulary counts and the per-type segmentation it returns.
  *
  * Pure JVM (no Spark session needed — the trainer core is the in-JVM
  * half by design). Generators sampled with fixed seeds — the
  * scalatest-plus bridge is not on the offline classpath; same
  * convention as GraphProperties. */
class UnigramProperties extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default.withSize(40), Seed(seed))

  /** Random type table over a 4-letter alphabet: short words, skewed
    * frequencies, duplicates of substructure everywhere. */
  private val typesGen: Gen[Seq[(String, Long)]] = for {
    n <- Gen.chooseNum(1, 25)
    ws <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(1, 10)
      cs <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
    } yield cs.mkString)
    fs <- Gen.listOfN(n, Gen.chooseNum(1L, 50L))
  } yield ws.zip(fs).groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)

  /** The distributed seed build's semantics, in-JVM: every substring up
    * to 8 cps, occurrence-position-counted, weighted by freq; all single
    * chars + top-256 multis. (Small alphabets never hit the 256 cap, so
    * the cap branch is exercised by the real-corpus gate instead.) */
  private def seedOf(types: Seq[(String, Long)]): Array[(String, Long)] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, f) <- types; i <- 0 until w.length; l <- 1 to math.min(8, w.length - i))
      counts.updateWith(w.substring(i, i + l))(c => Some(c.getOrElse(0L) + f))
    counts.toArray
  }

  test("structural invariants hold under x10 frequency replication too") {
    // NOTE: the trained VOCABULARY itself is not exactly
    // replication-invariant — the zero-count smoothing floor (max(c,1))
    // scales 1→1 while true counts scale ×10, so a near-tie between a
    // never-used piece and a barely-used one can legitimately flip
    // (observed on a random vocabulary; SentencePiece's probability
    // floor has the same character). What MUST survive replication are
    // the structural contracts: coverage, mass conservation, the size
    // formula, and count agreement.
    for (seed <- 1L to 10L) {
      val types = sample(typesGen, seed).map { case (w, f) => (w, f * 10L) }
      val seedTbl = seedOf(types)
      val res = TextOps.unigramTrainCollected(types.toArray, seedTbl, 3)
      val chars = types.flatMap(_._1.toSeq).map(_.toString).distinct.toSet
      assert(res.vocab.count(_._1.length == 1) === chars.size)
      assert(res.vocab.map { case (p, c) => c * p.length }.sum ===
        types.map { case (w, f) => f * w.length }.sum, s"seed=$seed mass at x10")
      assert(res.typePieces.zip(types).map { case ((_, k), (_, f)) => k * f }.sum ===
        res.vocab.map(_._2).sum, s"seed=$seed count agreement at x10")
    }
  }

  test("random vocabularies: coverage, mass conservation, size formula, count agreement") {
    for (seed <- 1L to 20L) {
      val types = sample(typesGen, seed)
      val seedTbl = seedOf(types)
      val target = (seed % 5L).toInt + 1 // vary the prune target too
      // trainer raises on an uncoverable type; not raising IS coverage
      val res = TextOps.unigramTrainCollected(types.toArray, seedTbl, target)
      val chars = types.flatMap(_._1.toSeq).map(_.toString).distinct.toSet
      val multis = seedTbl.map(_._1).count(_.length > 1)
      // vocabulary size formula: all chars + min(target, multi candidates)
      assert(res.vocab.count(_._1.length == 1) === chars.size, s"seed=$seed chars dropped")
      assert(res.vocab.count(_._1.length > 1) === math.min(target, multis),
        s"seed=$seed multi count off")
      // character-mass conservation through the final segmentation
      val wantMass = types.map { case (w, f) => f * w.length }.sum
      assert(res.vocab.map { case (p, c) => c * p.length }.sum === wantMass,
        s"seed=$seed char mass not conserved")
      // vocab counts and per-type piece counts describe the SAME segmentation
      assert(res.typePieces.zip(types).map { case ((_, k), (_, f)) => k * f }.sum ===
        res.vocab.map(_._2).sum, s"seed=$seed piece-count disagreement")
      // every type got at least one piece, never more than its length
      res.typePieces.zip(types).foreach { case ((w, k), _) =>
        assert(k >= 1 && k <= w.length, s"seed=$seed type '$w' pieces=$k")
      }
      // permutation invariance: input order must not change the result
      val perm = scala.util.Random.javaRandomToRandom(
        new java.util.Random(seed)).shuffle(types.toList)
      val res2 = TextOps.unigramTrainCollected(perm.toArray, seedTbl.reverse, target)
      assert(res2.vocab === res.vocab, s"seed=$seed vocab depends on input order")
      assert(res2.typePieces.sortBy(_._1).toSeq === res.typePieces.sortBy(_._1).toSeq,
        s"seed=$seed segmentation depends on input order")
    }
  }
}
