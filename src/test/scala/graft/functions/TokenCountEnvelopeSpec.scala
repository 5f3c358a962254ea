package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The derived length-envelope optimizer rule: plan effect, safety under
  * disjunction, and end-to-end result equivalence on a real dedup query. */
class TokenCountEnvelopeSpec extends SparkSpec {

  private def tokens = graft.functions.NativeExprs.tokens(col("text"))

  test("size(tokens(text)) >= 3 derives length(text) >= 5, evaluated BEFORE the tokenizer") {
    val df = graft.Tables.documents(spark, sfDir)
      .filter(size(tokens) >= 3)
      .select("doc_id")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("length(text") && p.contains(">= 5"),
      s"derived length envelope missing from plan:\n$p")
    // And short-circuits left to right: the cheap length() check must be
    // the LEFT conjunct or the rule is functionally inert (the expensive
    // tokenize+count would still run on every row)
    val lenIdx = p.indexOf("length(text")
    val sizeIdx = p.indexOf("size(graft_tokens")
    assert(lenIdx >= 0 && sizeIdx >= 0 && lenIdx < sizeIdx,
      s"envelope not evaluated before the token count:\n$p")
  }

  test("a token-count predicate under OR derives nothing (soundness guard)") {
    // size>=3 OR doc_id=0 admits doc 0 regardless of its length; ANDing
    // the envelope would wrongly drop a short doc 0. The rule must only
    // fire on whole conjuncts.
    val df = graft.Tables.documents(spark, sfDir)
      .filter(size(tokens) >= 3 || col("doc_id") === 0)
      .select("doc_id")
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.contains("length(text"),
      s"envelope unsoundly derived under a disjunction:\n$p")
  }

  test("rule on/off is result-identical on the real shingle-blocked dedup query") {
    val withRule = Dedup.qNgramJaccard(spark, sfDir).collect().toSeq
    val saved = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations =
        saved.filterNot(_ == TokenCountEnvelope)
      val withoutRule = Dedup.qNgramJaccard(spark, sfDir).collect().toSeq
      assert(withRule === withoutRule)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("the rule is idempotent: re-optimizing an enveloped filter adds nothing") {
    val once = graft.Tables.documents(spark, sfDir)
      .filter(size(tokens) >= 3)
      .queryExecution.optimizedPlan
    val twice = TokenCountEnvelope(once)
    assert(once.toString === twice.toString, "second application changed the plan")
  }
}
