package graft.engine

import java.nio.file.Files
import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import scala.jdk.CollectionConverters._

/** ScalaCheck-generator properties over the engine core (SURVEY.md §5: the
  * reference's test suite has no property tests — we add the invariants it
  * only implies): for ARBITRARY corpora and parallelism hints, wordcount
  * equals an independently computed reference, i.e. the result is
  * independent of split/partition choices and input file layout.
  *
  * (Generators are sampled with fixed seeds rather than through the
  * scalatest-plus bridge, which isn't on the offline classpath.)
  */
class EngineProperties extends SparkSpec {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
  private val line = Gen.listOf(word).map(_.mkString(" "))
  private val corpus = Gen.nonEmptyListOf(line).map(_.take(12))
  private val mGen = Gen.chooseNum(1, 8)
  private val rGen = Gen.chooseNum(1, 4)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default.withSize(12), Seed(seed))

  test("KV parse matches stream-extraction semantics under arbitrary whitespace") {
    // fuzz the exact parity surface the reference's `iss >> key` defines:
    // random leading whitespace (any kind), mixed separators, and blank
    // lines — keyed on the first real token, blanks contribute nothing
    val wsRun = Gen.oneOf(" ", "\t", "  ", "\t ", " \t")
    val messyLine: Gen[String] = for {
      lead <- Gen.oneOf("", " ", "\t", " \t\t")
      ws <- wsRun
      words <- Gen.listOf(word)
    } yield lead + words.mkString(ws)
    val messyCorpus = Gen.nonEmptyListOf(messyLine).map(_.take(10))
    (1L to 8L).foreach { s =>
      val lines = sample(messyCorpus, s * 101)
      // reference model: skip whitespace-only lines; key = first \s+ token
      val expected = lines
        .map(_.replaceFirst("^\\s+", ""))
        .filter(_.nonEmpty)
        .map(_.split("\\s+", 2)(0))
        .groupBy(identity)
        .map { case (k, ks) => k -> ks.size.toString }
      val in = Files.createTempDirectory("graft-prop-ws-in-")
      lines.zipWithIndex.foreach { case (l, i) =>
        Files.writeString(in.resolve(i.toString), l + "\n")
      }
      val out = Files.createTempDirectory("graft-prop-ws-out-").resolve("dest")
      Engine.run(
        spark,
        BatchSpec(List("identity"), List("count"), in.toString, out.toString, -1, 1))
      val got = Files.list(out).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .flatMap(p => Files.readAllLines(p).asScala)
        .filter(_.nonEmpty)
        .map { l => val Array(k, v) = l.split(" ", 2); k -> v }
        .toMap
      assert(got === expected, s"seed=$s corpus=${lines.map(l => s"[$l]")}")
    }
  }

  test("wordcount is correct and M/R-invariant for arbitrary corpora") {
    (1L to 8L).foreach { s =>
      val lines = sample(corpus, s)
      val m = sample(mGen, s * 31)
      val r = sample(rGen, s * 73)
      val expected = lines
        .flatMap(_.split("\\s+"))
        .filter(_.nonEmpty)
        .groupBy(identity)
        .map { case (w, ws) => w -> ws.size.toString }
      val in = Files.createTempDirectory("graft-prop-in-")
      lines.zipWithIndex.foreach { case (l, i) =>
        Files.writeString(in.resolve(i.toString), l + "\n")
      }
      val out = Files.createTempDirectory("graft-prop-out-").resolve("dest")
      Engine.run(
        spark,
        BatchSpec(List("tokenize"), List("sum_ints"), in.toString, out.toString, m, r))
      val got = Files.list(out).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .flatMap(p => Files.readAllLines(p).asScala)
        .filter(_.nonEmpty)
        .map { l => val Array(k, v) = l.split(" ", 2); k -> v }
        .toMap
      assert(got === expected, s"seed=$s M=$m R=$r corpus=$lines")
    }
  }
}
