package graft.exprs

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** `vector_sum_scaled(vec, scale)` — component-wise exact scaled-integer
  * sum of a vector column: element j of the result is
  * `Σ_rows floor(vec_j · scale)` as a 64-bit integer.
  *
  * This is the order-insensitive aggregation primitive behind
  * deterministic centroid training ([[graft.ops.Similarity]] Lloyd's
  * loop): floating-point sums change bits under Spark's partial-agg
  * order, but floored scaled integers are exact, so any engine — and any
  * partitioning — produces identical centroids. Previously the training
  * update posexploded every vector into dim× rows through a hash
  * aggregate; this aggregates arrays in place, one buffer of dim longs
  * per group, mergeable map-side like any sketch.
  *
  * Vectors of mismatched length in one group fail loudly (a silent
  * truncation would corrupt the model).
  */
case class VectorSumScaled(
    child: Expression,
    scale: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vector_sum_scaled requires array<float|double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vector_sum_scaled"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): Array[Long] = Array.empty

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buf.isEmpty) new Array[Long](n) else buf
    require(acc.length == n,
      s"vector_sum_scaled: vector length $n != group's ${acc.length}")
    var j = 0
    while (j < n) {
      // fail-loud like the length check: a null element silently reading
      // as 0 would corrupt the model it feeds
      require(!arr.isNullAt(j),
        s"vector_sum_scaled: null element at index $j")
      val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      acc(j) += math.floor(x * scale).toLong
      j += 1
    }
    acc
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    require(buf.length == other.length,
      s"vector_sum_scaled: merging buffers of length ${buf.length} and ${other.length}")
    var j = 0
    while (j < buf.length) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(v => v: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumScaled =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumScaled =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorSumScaled =
    copy(child = newChildren.head)
}

object VectorSumScaled {
  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("vector_sum_scaled"),
      new ExpressionInfo(classOf[VectorSumScaled].getName, "vector_sum_scaled"),
      (cs: Seq[Expression]) => {
        if (cs.length != 2) throw new IllegalArgumentException(
          s"vector_sum_scaled expects exactly 2 arguments (vector, scale), got ${cs.length}")
        if (!cs(1).foldable) throw new IllegalArgumentException(
          "vector_sum_scaled: scale must be a constant")
        VectorSumScaled(cs.head, cs(1).eval().asInstanceOf[Number].doubleValue())
      })
}
