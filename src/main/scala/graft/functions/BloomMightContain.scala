package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native `bloom_might_contain(hash BIGINT, filter BINARY-literal)` —
  * probe a serialized [[org.apache.spark.util.sketch.BloomFilter]]
  * from inside whole-stage codegen (no UDF, no boxing: one static-ish
  * virtual call per row against a per-plan deserialized filter).
  *
  * The filter argument must be a foldable BINARY literal (the
  * driver-built sketch travels to executors inside the plan; it is
  * deserialized ONCE per plan via a transient lazy, and codegen pins
  * the deserialized object as a plan reference — rows never touch the
  * serialized bytes). Used by TextOps.decontaminateBloom as the
  * corpus-side pre-filter that replaces a broadcast of the eval-gram
  * STRINGS with ~10 bits per gram: false positives are filtered back
  * out by an exact confirm join, false negatives are impossible, so
  * the composed operator stays exactly equal to the unfiltered one.
  */
case class BloomMightContain(valueExpr: Expression, filterExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = valueExpr
  override def right: Expression = filterExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    if (valueExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain arg 1 must be BIGINT, got ${valueExpr.dataType.sql}")
    else if (filterExpr.dataType != BinaryType || !filterExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain arg 2 must be a BINARY literal (serialized BloomFilter)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter = {
    val bytes = filterExpr.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(value: Any, bits: Any): Any =
    filter.mightContainLong(value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, (v, _) => s"$ref.mightContainLong($v)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(valueExpr = newLeft, filterExpr = newRight)
}
