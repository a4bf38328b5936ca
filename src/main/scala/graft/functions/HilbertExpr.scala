package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** graft_hilbert(xq, yq) → long: the Hilbert-curve index of a
  * quantized 2-D cell — the standard bitwise xy2d conversion
  * (Wikipedia "Hilbert curve", Applications) as ONE codegen'd scalar
  * kernel.
  *
  * Why an Expression and not the 8-level chained-CASE projection the
  * oracle uses: the unrolled walk is bit-identical and portable SQL
  * (which is why the ORACLE keeps it — see `LayoutOps.hilbertCtesSql`),
  * but on the engine side its first-plan codegen compile cost ~5 s of
  * the sf0.1 cold pass (8 stacked Projects of nested CASEs), all
  * flat in data size. The kernel is one static-method call inside the
  * same WholeStageCodegen span — identical output (the DuckDB hash
  * gate proves kernel ≡ unrolled SQL on the whole corpus), ~zero
  * compile weight. The loop bound is `bits` (≤ 16), known at plan
  * time, so the JIT unrolls it better than javac'd CASE chains.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert requires two int arguments, got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.xy2d(a.asInstanceOf[Int], b.asInstanceOf[Int], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertIndex.xy2d($a, $b, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Shared by interpreted eval and codegen. Exactly the oracle's
    * unrolled walk: Gray-code the quadrant bit pair into d, then
    * rotate/flip the frame within the CURRENT quadrant size s (the
    * s-convention rot — bijection + Manhattan-1 adjacency pinned in
    * LayoutSpec on the full grid). */
  def xy2d(x0: Int, y0: Int, bits: Int): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1 << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
