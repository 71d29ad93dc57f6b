package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd squared-L2 distance over two `ArrayType(FloatType)`
  * columns — the kernel under product quantization (ScaleOps q105/q107)
  * and any Euclidean ANN path.
  *
  * Same rationale as [[CosineSimilarity]]: the composable
  * `aggregate(zip_with(a, b, (p,q) -> (p-q)*(p-q)), 0.0, +)` allocates an
  * intermediate array and walks three lambda chains per pair; PQ evaluates
  * this |corpus| × subspaces × centroids times. This is one fused loop in
  * whole-stage codegen — no allocation, one running sum in a register.
  *
  * Arithmetic order is IDENTICAL to the composable form (sequential fold
  * over min-length prefix, each term (x-y)² in double) so swapping it in
  * changes no result bit — asserted in FunctionsSpec. A null ELEMENT in
  * the scanned prefix yields a null result, exactly as the lambda form's
  * null-propagating `+` does — not a silent 0.0 contribution (the
  * null-element branch is only emitted when the array type says
  * containsNull, so null-free schemas keep the tight loop). */
case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {

  private def elemNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })
  override def nullable: Boolean = super.nullable || elemNullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nd = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < nd) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val nd = ctx.freshName("nd")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val nullCheck =
        if (elemNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
        |int $nd = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $nd; $i++) {
        |  $nullCheck
        |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
        |  $s += $d * $d;
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}
