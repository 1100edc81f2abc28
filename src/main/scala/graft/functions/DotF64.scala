package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static kernel for [[DotF64]] — callable from generated code. */
object DotF64Kernel {

  /** Dot product of two FLOAT arrays as the left-to-right DOUBLE fold
    * — bit-identical to the SQL formulation it replaces
    * (`aggregate(zip_with(x, y, (p,q) -> double(p)*double(q)), 0.0,
    * (acc,v) -> acc+v)`), including its null semantics: zip_with pads
    * the shorter side with NULL and the fold then yields NULL, so
    * unequal lengths (and any NULL element) return null here too.
    * Boxed return: null IS a legal result for non-null inputs.
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Native `dot_f64(array<float>, array<float>)` — the cosine/rerank
  * hot-path kernel as a single codegen'd loop over the unsafe array
  * bytes. The higher-order-function formulation it replaces
  * (VectorOps.dot's aggregate-over-zip_with) is CodegenFallback:
  * every pair paid an interpreted fold PLUS a materialized zip array —
  * the guide-§4 "non-codegen expression in the hot path" class. Values
  * are identical by construction (same left fold, same null
  * semantics); the DuckDB mirror (list_reduce over list_prepend) is
  * untouched.
  */
case class DotF64(left: Expression, right: Expression) extends BinaryExpression {

  private def okType(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f64 requires two ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_f64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotF64Kernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $tmp = graft.functions.DotF64Kernel.dot($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)
}
