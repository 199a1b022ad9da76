package graft.exprs

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `rolling_min_hash(text)` — the minimum
  * polynomial rolling hash over all 8-char windows of the input
  * (Rabin–Karp hash, base 257 mod 2^31−1). The standard content-defined
  * fingerprint primitive for document dedup/winnowing.
  *
  * This is the engine's UDF/extension surface exemplar (SURVEY §4.2): a
  * real `Expression` with `doGenCode` — it participates in whole-stage
  * codegen (one static JVM call per row, no interpreted fallback, no
  * serialization), which is the preference order's step above a Scala UDF.
  * Registered via `SparkSessionExtensions.injectFunction` in GraftSession,
  * so it is callable from both the Column API and SQL text.
  *
  * Returns null for inputs shorter than the window (8 chars). Hash values
  * are defined over UTF-16 code units; for ASCII inputs this equals the
  * per-character codepoint arithmetic any SQL engine can replicate.
  */
case class RollingMinHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_min_hash requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_min_hash"

  override def nullSafeEval(input: Any): Any =
    RollingMinHash.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.exprs.RollingMinHash.compute($c.toString());
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  val K = 8
  val B = 257L
  val P = 2147483647L // 2^31 - 1

  /** Reference implementation, O(n) via the rolling update
    * h' = ((h − c_out·B^(K−1)) · B + c_in) mod P. All intermediates fit a
    * long: h < 2^31, so h·B < 2^40 and c_out·B^(K-1) < 2^47.
    */
  def compute(s: String): java.lang.Long = {
    val n = s.length
    if (n < K) return null
    var bk = 1L
    var j = 1
    while (j < K) { bk = bk * B % P; j += 1 }
    var h = 0L
    var i = 0
    while (i < K) { h = (h * B + s.charAt(i)) % P; i += 1 }
    var min = h
    i = K
    while (i < n) {
      h = ((h + P - s.charAt(i - K) * bk % P) % P * B + s.charAt(i)) % P
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
      (children: Seq[Expression]) => RollingMinHash(children.head))
}
