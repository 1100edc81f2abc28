package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels callable from generated code (whole-stage codegen
  * emits a plain static call — no virtual dispatch, no boxing).
  */
object GraftFunctions {

  /** 64-bit SimHash over whitespace-separated word unigrams, computed
    * DIRECTLY on the UTF8String's bytes (no String decode, no split
    * allocation). Matches graft.ops.TextOps.simhash bit-for-bit:
    * FNV-1a 64 over each word's UTF-8 bytes, +/-1 per bit, sign →
    * output bit (asserted equal in FunctionsSpec).
    */
  def simhash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      // skip separators
      while (i < n && bytes(i) == ' '.toByte) i += 1
      if (i < n) {
        var h = 0xcbf29ce484222325L
        while (i < n && bytes(i) != ' '.toByte) {
          h ^= (bytes(i) & 0xffL)
          h *= 0x100000001b3L
          i += 1
        }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** splitmix64 finalizer — the shared deterministic hash kernel
    * (sampling, corpus synthesis, minhash seeds). Exposed as a native
    * expression because SQL-level `*`/`+` on longs throw under ANSI
    * mode on overflow; JVM arithmetic wraps mod 2^64 by definition.
    */
  def splitmix64(x: Long): Long = graft.sources.PageSource.splitmix64(x)
}

/** Native `splitmix64(bigint)` — wrap-around 64-bit hash finalizer
  * usable from whole-stage codegen regardless of spark.sql.ansi.enabled
  * (deterministic hash-threshold sampling at the scan, no UDF).
  */
case class Splitmix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"splitmix64 requires BIGINT input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "splitmix64"

  override protected def nullSafeEval(input: Any): Any =
    GraftFunctions.splitmix64(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftFunctions.splitmix64($c)")

  override protected def withNewChildInternal(newChild: Expression): Splitmix64 =
    copy(child = newChild)
}

/** Native Catalyst expression (SURVEY.md §4.3b / M7): `simhash64(text)`
  * stays inside WholeStageCodegen — the typed-map formulation
  * (TextOps.simhash) breaks codegen with a Deserialize/Serialize pair;
  * this one compiles to a static call on the UTF8String, so simhash
  * dedup runs fully codegen'd at the scan.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    GraftFunctions.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftFunctions.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** SparkSessionExtensions module: registers graft's native functions.
  * Use via `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
  }
}

object GraftExtensions {
  private val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)),
    (new FunctionIdentifier("extract_page"),
      new ExpressionInfo(classOf[ExtractPage].getName, "extract_page"),
      (children: Seq[Expression]) => ExtractPage(children)),
    (new FunctionIdentifier("splitmix64"),
      new ExpressionInfo(classOf[Splitmix64].getName, "splitmix64"),
      (children: Seq[Expression]) => Splitmix64(children.head)),
    (new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => BloomMightContain(children(0), children(1))),
    (new FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotF64].getName, "dot_f64"),
      (children: Seq[Expression]) => DotF64(children(0), children(1)))
  )

  /** Imperative registration for an already-built session (tests,
    * driver-harness sessions the builder does not construct).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
