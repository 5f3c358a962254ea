package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter semi-join reduction — the runtime-filter technique for
  * the 100 TB join regime where the dimension side is too big to
  * broadcast as ROWS but its KEY SET compresses into a fixed-size bit
  * array: build an 8 KiB bloom over the (filtered) dimension keys with a
  * distributed OR-merge aggregate, broadcast the bits, and pre-filter
  * the fact side BEFORE its shuffle, so rows that cannot join never
  * cross the wire. The join itself still runs — bloom false positives
  * are eliminated there — so the result is EXACTLY the plain join's
  * (which is what lets a plain-SQL oracle gate this).
  *
  * Everything is deterministic by construction: the filter size and hash
  * seeds are fixed, the build is a commutative bitwise OR (any
  * partitioning/merge order yields the same bits), and probes are pure.
  * Spark's own `InjectRuntimeFilter` automates exactly this rewrite when
  * its size thresholds trigger; this operator is the explicit form — the
  * plan shape is pinned by `PlanShapeSpec` instead of depending on
  * optimizer heuristics tuned for cluster-scale inputs.
  */
object GraftBloom {

  /** 2¹⁶ bits = 8 KiB — key-set-size independent; at the ~4.7k filtered
    * keys of the sf0.1 build side the false-positive rate is
    * ≈ (1−e^(−kn/m))^k ≈ 0.4%, and a 100 TB deployment scales
    * `NumBits`, not the design. */
  val NumBits: Int = 1 << 16
  val NumWords: Int = NumBits / 64
  val NumHashes: Int = 4

  private val Seed1 = 0x9747b28c1234abcdL
  private val Seed2 = 0x243f6a8885a308d3L

  /** Kirsch–Mitzenmacher double hashing: bit_i = h1 + i·h2 mod NumBits.
    * The two base hashes are computed ONCE per key — the probe runs per
    * fact row in the pre-shuffle filter, the hot path this operator
    * exists for. */
  @inline private def bitOf(h1: Long, h2: Long, i: Int): Int =
    (((h1 + i * h2) % NumBits + NumBits) % NumBits).toInt

  @inline private[functions] def set(bits: Array[Long], key: Long): Unit = {
    val h1 = XXH64.hashLong(key, Seed1)
    val h2 = XXH64.hashLong(key, Seed2)
    var i = 0
    while (i < NumHashes) {
      val b = bitOf(h1, h2, i)
      bits(b >> 6) |= 1L << (b & 63)
      i += 1
    }
  }

  @inline private[functions] def test(bits: Array[Long], key: Long): Boolean = {
    val h1 = XXH64.hashLong(key, Seed1)
    val h2 = XXH64.hashLong(key, Seed2)
    var i = 0
    while (i < NumHashes) {
      val b = bitOf(h1, h2, i)
      if ((bits(b >> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Distributed build: map-side partial bit arrays, OR-merged — the
    * same partial-aggregate shape as any algebraic agg, so the keys
    * never concentrate anywhere; only 8 KiB crosses each merge. */
  private object BloomAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](NumWords)
    override def reduce(b: Array[Long], key: Long): Array[Long] = { set(b, key); b }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < NumWords) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.javaSerialization(classOf[Array[Long]])
    override def outputEncoder: Encoder[Array[Long]] =
      Encoders.javaSerialization(classOf[Array[Long]])
  }

  /** Build the filter over `keys` (a single LONG column). One
    * distributed aggregate job; the driver receives the fixed 8 KiB. */
  def build(keys: DataFrame): Array[Long] = {
    val s = keys.sparkSession
    import s.implicits._
    keys.as[Long].select(BloomAgg.toColumn).head()
  }

  /** Probe column: true iff `key` may be in the set (no false
    * negatives). Codegen'd like every graft kernel. */
  def mightContain(key: Column, bits: Array[Long]): Column =
    GraftBridge.column(BloomMightContainLong(GraftBridge.expression(key), bits.toSeq))
}

/** `bits` rides the expression tree as an immutable Seq (the case-class
  * field must be value-comparable for Catalyst equality/canonicalization);
  * the probe kernel works on the primitive array, materialized once per
  * expression instance. */
case class BloomMightContainLong(child: Expression, bits: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {
  require(bits.length == GraftBloom.NumWords, s"bloom bits length ${bits.length}")
  override def inputTypes: Seq[org.apache.spark.sql.GraftBridge.AbstractDT] = Seq(LongType)
  override def dataType: DataType = BooleanType

  @transient private lazy val bitsArr: Array[Long] = bits.toArray

  def kernel(key: Long): Boolean = GraftBloom.test(bitsArr, key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContainLong].getName)
      s"${ev.value} = $ref.kernel($c);"
    })

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
  override def prettyName: String = "graft_bloom_might_contain"
}
