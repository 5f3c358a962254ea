package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Equivalence guards: each native expression must produce EXACTLY the
  * values of the declarative formulation it replaced (that equivalence is
  * what keeps the DuckDB oracles valid). Checked on the real documents /
  * embeddings tables, not toy strings. */
class NativeExprsSpec extends SparkSpec {

  test("cosineSim is bit-identical to the zip_with/aggregate HOF formulation") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("a")
      .join(e.as("b"), col("a.vec_id") + 7 === col("b.vec_id"))
      .select(
        NativeExprs.cosineSim(col("a.v"), col("b.v")).as("native"),
        VectorOps.cosine(col("a.v"), col("b.v")).as("hof"))
    val diff = pairs.filter(col("native") =!= col("hof")).count()
    assert(diff === 0, s"$diff pairs differ between native and HOF cosine")
  }

  test("cosineSim/dotProd yield NULL on ragged arrays (zip_with semantics)") {
    val df = spark.sql(
      "SELECT cast(array(1.0, 2.0) as array<double>) a, cast(array(1.0) as array<double>) b")
    val out = df.select(
      NativeExprs.cosineSim(col("a"), col("b")).as("cos"),
      NativeExprs.dotProd(col("a"), col("b")).as("dot"),
      NativeExprs.cosineSim(col("a"), col("a")).as("cos_ok")).collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
    assert(math.abs(out.getDouble(2) - 1.0) < 1e-12)
  }

  test("Tokens matches filter(split(lower)) exactly on all documents") {
    val d = Tables.documents(spark, sfDir)
      .select(
        NativeExprs.tokens(col("text")).as("native"),
        filter(split(lower(col("text")), "\\s+"), t => t =!= lit("")).as("hof"))
    assert(d.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("NormalizeWs matches regexp_replace(lower, \\s+, ' ') exactly") {
    val d = Tables.documents(spark, sfDir)
      .select(
        NativeExprs.normalizeWs(col("text")).as("native"),
        regexp_replace(lower(col("text")), "\\s+", " ").as("hof"))
    assert(d.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("WordShingles matches the sequence/transform/array_distinct chain") {
    val t = filter(split(lower(col("text")), "\\s+"), x => x =!= lit(""))
    val hof = array_distinct(
      transform(
        sequence(lit(1), greatest(size(t) - 2, lit(0))),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
    val d = Tables.documents(spark, sfDir)
      .filter(size(t) >= 3)
      .select(NativeExprs.wordShingles(col("text"), 3).as("native"), hof.as("hof"))
    assert(d.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("SimHash64 matches the HOF bit-vote formulation") {
    val hs = transform(
      filter(split(lower(col("text")), "\\s+"), x => x =!= lit("")),
      t => xxhash64(t))
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), NativeExprs.simHash64(NativeExprs.tokens(col("text"))).as("native"), hs.as("hs"))
      .withColumn(
        "hof",
        expr(
          """aggregate(sequence(0, 63), 0L, (acc, b) ->
            |  acc + if(aggregate(hs, 0L,
            |             (a, h) -> a + (shiftright(h, b) & 1L) * 2L - 1L) > 0,
            |           shiftleft(1L, b), 0L))""".stripMargin))
    assert(d.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("TextStats fields match the individual HOF computations") {
    val t = filter(split(lower(col("text")), "\\s+"), x => x =!= lit(""))
    val d = Tables.documents(spark, sfDir)
      .select(
        NativeExprs.textStats(col("text"), Seq("the", "a", "of")).as("st"),
        size(t).cast("long").as("h_tokens"),
        aggregate(transform(t, x => length(x)), lit(0), (a, x) => a + x).cast("long").as("h_len"),
        size(filter(split(lower(col("text")), "[^a-z0-9]+"), x => x =!= lit("")))
          .cast("long").as("h_words"),
        size(filter(t, x => x.isin("the", "a", "of"))).cast("long").as("h_stop"),
        length(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).cast("long").as("h_alnum"))
    val bad = d.filter(
      col("st.n_tokens") =!= col("h_tokens") ||
        col("st.sum_token_len") =!= col("h_len") ||
        col("st.n_words") =!= col("h_words") ||
        col("st.stop_hits") =!= col("h_stop") ||
        col("st.n_alnum") =!= col("h_alnum")).count()
    assert(bad === 0)
  }
}
