package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter build + probe for runtime join prefilters.
  *
  * The technique AQE's injected runtime filter applies automatically
  * (when its thresholds line up), made explicit and deterministic as
  * an operator: build a Bloom filter over the filtered dim side's
  * join keys, push the membership probe into the fact scan as a
  * codegen'd predicate, and confirm exactly with the real join. The
  * bloom has no false negatives, so prefilter + exact confirm ≡ the
  * plain join; false positives only cost a little confirm work.
  *
  * Scale shape: the BUILD is a distributed aggregate (per-partition
  * partial bit arrays, OR-merged — `Aggregator` gets map-side partials
  * for free); only the finished filter reaches the driver, and it is
  * bounded metadata (`numWords` longs, fixed at construction —
  * 2048 words = 16 KiB — independent of table size, like IVF
  * centroids). The PROBE ships those same words to every task once
  * via the codegen reference-object channel and evaluates inside
  * whole-stage codegen, so at 100 TB the non-matching ~98% of the
  * fact never reaches the join shuffle.
  */
object BloomKernels {

  /** splitmix64 finalizer — same public construction as the rpBands
    * Rademacher source (VectorExprs.scala); duplicated rather than
    * shared because THIS copy is pinned by the Bloom double-hashing
    * contract: bits written by [[insert]] must be found by
    * [[contains]] forever, independent of any rpBands evolution. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z ^= (z >>> 30); z *= 0xbf58476d1ce4e5b9L
    z ^= (z >>> 27); z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Kirsch–Mitzenmacher double hashing: position_i = h1 + i·h2
    * (mod m), h2 forced odd so the stride never degenerates on the
    * power-of-two word grid. */
  private def h1(v: Long): Long = mix(v)
  private def h2(v: Long): Long = mix(v ^ 0x6a09e667f3bcc909L) | 1L

  def insert(bits: Array[Long], numHashes: Int, v: Long): Unit = {
    val m = bits.length.toLong << 6
    val a = h1(v); val b = h2(v)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(a + i * b, m)
      bits((pos >>> 6).toInt) |= 1L << (pos & 63L).toInt
      i += 1
    }
  }

  def contains(bits: Array[Long], numHashes: Int, v: Long): Boolean = {
    val m = bits.length.toLong << 6
    val a = h1(v); val b = h2(v)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(a + i * b, m)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** Aggregation buffer: one partial filter per partition. A product
    * wrapper because `Encoders` exposes no bare primitive-array
    * encoder; the ObjectHashAggregate path keeps the buffer as this
    * object between rows and serializes it only at the merge
    * shuffle. */
  case class BloomBuf(words: Array[Long])

  /** Distributed build: reduce inserts into the partition-local
    * buffer in place, merge ORs word-wise (commutative + associative
    * + idempotent, so the result is independent of partitioning and
    * merge order — duplicate keys are harmless by construction). */
  case class BloomAgg(numWords: Int, numHashes: Int)
      extends Aggregator[Long, BloomBuf, Array[Long]] {
    override def zero: BloomBuf = BloomBuf(new Array[Long](numWords))
    override def reduce(b: BloomBuf, v: Long): BloomBuf = {
      insert(b.words, numHashes, v); b
    }
    override def merge(a: BloomBuf, b: BloomBuf): BloomBuf = {
      val aw = a.words; val bw = b.words
      var i = 0
      while (i < aw.length) { aw(i) |= bw(i); i += 1 }
      a
    }
    override def finish(b: BloomBuf): Array[Long] = b.words
    override def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Build a Bloom filter over `keys` (a LongType column of `df`).
    * One distributed aggregate job; the single-row result the driver
    * takes is the finished filter — `numWords` longs of bounded
    * metadata, NOT data (the same boundedness class as IVF
    * centroids). */
  def build(df: DataFrame, keys: Column,
      numWords: Int, numHashes: Int): Array[Long] = {
    val agg = udaf(BloomAgg(numWords, numHashes))
    val row = df.select(agg(keys).as("bloom")).head()
    row.getAs[scala.collection.Seq[Long]](0).toArray
  }
}

/** graft_bloom_contains(key) → boolean, the filter's bits bound at
  * construction (they are not SQL-literal-expressible, so this
  * expression is wrapped via Bridge.column rather than registered in
  * the function registry). Codegen ships the words once per task as a
  * reference object and keeps the probe inside whole-stage codegen —
  * the predicate sits directly on the fact scan. */
case class BloomContains(child: Expression, bits: Array[Long], numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains requires a bigint key, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(v: Any): Any =
    BloomKernels.contains(bits, numHashes, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomKernels.contains($bitsRef, $numHashes, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
