package graft.exprs

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ivf_probe(vec, centroid_spec, p)` — the IVF cell-assignment / probe
  * primitive as ONE native expression: the `p` nearest centroids of `vec`
  * by cosine, returned as `array<struct<cid: bigint, ccos: double>>`
  * ranked (cosine desc, NaN greatest — Spark's double ordering — then
  * smaller cid).
  *
  * This is the scale path past literal-centroid assignment
  * ([[graft.ops.Similarity]] previously inlined one `array_dot` struct
  * per centroid into an `array_max` tree): generated-code size there is
  * O(cells · dim) and hits Janino method limits long before production
  * cell counts. Here the centroid MATRIX rides along as a codegen
  * reference object (the [[LexiconCounts]] pattern) — parsed once on the
  * driver, shipped once per task, O(1) generated code in the number of
  * cells — while per-row work is the same k·dim multiply-adds either way.
  *
  * Bit-compatibility contract (IvfNativeSpec pins it against the literal
  * path; the DuckDB oracle replays it): cosine = double ascending-index
  * fold of e·c divided by (||e|| · ||c||) with both norms ascending-index
  * folds — identical operand order to [[ArrayDot]] / `sqrt(array_dot)` —
  * and the rank order is exactly `ORDER BY ccos DESC, cid` under Java
  * double ordering (NaN sorts greatest on both engines).
  *
  * A zero-norm vector's cosines are all NaN: the best struct is then
  * (smallest cid, NaN) — same as the literal `array_max` construction —
  * and callers map `isnan(ccos)` to the out-of-domain cell −1.
  */
case class IvfProbe(child: Expression, spec: String, p: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ivf_probe requires array<float|double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("cid", LongType, nullable = false),
      StructField("ccos", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_probe"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val centroids: Array[IvfProbe.Cent] = IvfProbe.parse(spec)

  override def nullSafeEval(input: Any): Any =
    IvfProbe.compute(input.asInstanceOf[ArrayData], isFloat, centroids, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // the parsed centroid matrix is a reference object: generated code
      // stays one call regardless of cell count
      val ref = ctx.addReferenceObj("centroids", centroids, "graft.exprs.IvfCent[]")
      s"${ev.value} = graft.exprs.IvfProbe.compute($c, $isFloat, $ref, $p);"
    })

  override protected def withNewChildInternal(newChild: Expression): IvfProbe =
    copy(child = newChild)

  // keep the (potentially large) centroid literal out of plan strings:
  // toString renders a fingerprint, not 64×64 doubles
  override def toString: String =
    s"ivf_probe($child, cells=${centroids.length}, p=$p)"
  override def sql: String = s"ivf_probe(${child.sql}, <${centroids.length} centroids>, $p)"
}

/** One centroid: id, components (double), precomputed norm. Top-level (not
  * nested in the companion) so the codegen reference-object type name is
  * plain Java-resolvable (`graft.exprs.IvfCent[]`).
  */
final class IvfCent(val cid: Long, val ce: Array[Double], val cn: Double)
  extends Serializable

object IvfProbe {
  type Cent = IvfCent

  /** Serialize centroids for the function-argument string literal:
    * `cid:norm:v1,v2,…;…` with doubles via `Double.toString` (exact
    * round-trip). The norm is carried explicitly so the query path uses
    * the SAME norm bits the caller derived (e.g. from Spark-side
    * `sqrt(array_dot)`), not a re-derivation.
    */
  def render(cents: Seq[(Long, Array[Double], Double)]): String =
    cents.map { case (cid, ce, cn) =>
      s"$cid:$cn:${ce.map(_.toString).mkString(",")}"
    }.mkString(";")

  def parse(spec: String): Array[Cent] =
    spec.split(";").map { s =>
      val parts = s.split(":", 3)
      new IvfCent(parts(0).toLong, parts(2).split(",").map(_.toDouble), parts(1).toDouble)
    }

  def compute(e: ArrayData, isFloat: Boolean, cents: Array[Cent], p: Int): ArrayData = {
    val n = e.numElements()
    def at(i: Int): Double = if (isFloat) e.getFloat(i).toDouble else e.getDouble(i)
    // ||e||: ascending-index double fold, same operand order as ArrayDot
    var s = 0.0
    var i = 0
    while (i < n) { val x = at(i); s += x * x; i += 1 }
    val nrm = math.sqrt(s)
    val k = cents.length
    val cos = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = cents(j)
      require(c.ce.length == n,
        s"ivf_probe: vector dim $n != centroid dim ${c.ce.length} (cid ${c.cid})")
      var d = 0.0
      i = 0
      while (i < n) { d += at(i) * c.ce(i); i += 1 }
      cos(j) = d / (nrm * c.cn)
      j += 1
    }
    // rank: cosine desc (Java double ordering — NaN greatest, matching
    // Spark's struct-max and ORDER BY semantics), ties → smaller cid
    val order = Array.range(0, k).sortWith { (a, b) =>
      val c = java.lang.Double.compare(cos(a), cos(b))
      if (c != 0) c > 0 else cents(a).cid < cents(b).cid
    }
    val m = math.min(p, k)
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      val j2 = order(i)
      out(i) = new GenericInternalRow(Array[Any](cents(j2).cid, cos(j2)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("ivf_probe"),
      new ExpressionInfo(classOf[IvfProbe].getName, "ivf_probe"),
      (cs: Seq[Expression]) => {
        if (cs.length != 3 || !cs(1).foldable || !cs(2).foldable)
          throw new IllegalArgumentException(
            "ivf_probe expects (vector, constant centroid spec, constant p)")
        IvfProbe(cs.head, cs(1).eval().asInstanceOf[UTF8String].toString,
          cs(2).eval().asInstanceOf[Number].intValue())
      })
}
