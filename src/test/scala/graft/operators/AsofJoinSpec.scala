package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Unit tests of the generic as-of join construction on hand-built frames:
  * backward match, no-earlier-match nulls, equal-time inclusivity, and the
  * max-tiebreak on duplicate right timestamps. */
class AsofJoinSpec extends SparkSpec {

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("asofBackward: backward match, inclusive time, tie and null semantics") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), "l-a"), // after r at 5 → matches r5
      (1L, ts(5), "l-b"),  // equal time → inclusive, matches r5 (max tb)
      (1L, ts(1), "l-c"),  // before any right → null
      (2L, ts(99), "l-d")  // key with no right rows at all → null
    ).toDF("k", "t", "payload")
    val right = Seq(
      (1L, ts(5), 100L, "r-low"),
      (1L, ts(5), 200L, "r-high"), // same ts: greatest tiebreak wins
      (1L, ts(8), 50L, "r-later")
    ).toDF("k", "rt", "tb", "rv")

    val out = TemporalJoins.asofBackward(
      left, right,
      key = "k", leftTime = "t", rightTime = "rt",
      rightTiebreak = "tb", rightCols = Seq("tb", "rv"))
      .select("payload", "tb", "rv")
      .collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2))))
      .toSet

    assert(out === Set(
      ("l-a", Some(50L), Some("r-later")), // 8 ≤ 10 is the latest
      ("l-b", Some(200L), Some("r-high")), // inclusive + max tiebreak
      ("l-c", None, None),
      ("l-d", None, None)))
  }

  test("asofForward: forward match, inclusive time, min-tiebreak, tolerance gate") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(4), "l-a"),  // next right at 5 → within 2-min tolerance
      (1L, ts(5), "l-b"),  // equal time → inclusive, min tiebreak wins
      (1L, ts(6), "l-c"),  // next right at 60 → BEYOND tolerance → null
      (1L, ts(70), "l-d"), // after all rights → null
      (2L, ts(1), "l-e"),  // key with no right rows → null
      (1L, null.asInstanceOf[Timestamp], "l-f") // NULL left time → null match
    ).toDF("k", "t", "payload")
    val right = Seq(
      (1L, ts(5), 200L, "r-high"),
      (1L, ts(5), 100L, "r-low"), // same ts: SMALLEST tiebreak wins forward
      (1L, ts(60), 50L, "r-late")
    ).toDF("k", "rt", "tb", "rv")

    val out = TemporalJoins.asofForward(
      left, right,
      key = "k", leftTime = "t", rightTime = "rt",
      rightTiebreak = "tb", rightCols = Seq("tb", "rv"),
      toleranceUs = Some(2L * 60 * 1000000))
      .select("payload", "tb", "rv")
      .collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2))))
      .toSet

    assert(out === Set(
      ("l-a", Some(100L), Some("r-low")), // 5 ≥ 4, within 2 min
      ("l-b", Some(100L), Some("r-low")), // inclusive + min tiebreak
      ("l-c", None, None),                // earliest candidate at 60 is out of tolerance
      ("l-d", None, None),
      ("l-e", None, None),
      ("l-f", None, None)))               // null left time never matches

    // the same frame WITHOUT tolerance must also null the null-time row
    // (the tolerance branch otherwise masks the null-handling path)
    val noTol = TemporalJoins.asofForward(
      left, right,
      key = "k", leftTime = "t", rightTime = "rt",
      rightTiebreak = "tb", rightCols = Seq("tb", "rv"))
      .select("payload", "tb")
      .collect()
      .map(r => (r.getString(0), Option(r.get(1))))
      .toMap
    assert(noTol("l-f") === None, "null left time matched without tolerance")
    assert(noTol("l-c") === Some(50L), "without tolerance l-c matches the 60-min right")
  }
}
