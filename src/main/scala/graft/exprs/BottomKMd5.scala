package graft.exprs

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bottom_k_md5(col, k)` — the engine's UDAF extension exemplar: a
  * `TypedImperativeAggregate` computing the bottom-k sketch (KMV) of a
  * group: the k lexicographically smallest DISTINCT md5 hex digests of the
  * input values, returned sorted ascending.
  *
  * This is the mergeable-sketch primitive behind distinct-count estimation
  * and near-dup fingerprinting (t4 computes it per row over shingles; this
  * computes it per GROUP over rows). Properties that matter at 100 TB:
  * the buffer is bounded at k strings regardless of group size, updates
  * are O(log k), and merge is associative+commutative — so Spark runs it
  * as partial aggregation with map-side combine, shuffling only k hashes
  * per group per mapper.
  *
  * Deterministic and engine-independent (md5 hex, lexicographic order):
  * DuckDB replicates it as `list_sort(list_distinct(list(md5(x))))[1:k]`.
  */
case class BottomKMd5(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k > 0, "bottom_k_md5: k must be positive")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottom_k_md5 requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_md5"

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def trim(buf: java.util.TreeSet[String]): Unit =
    while (buf.size > k) buf.pollLast()

  override def update(buf: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = BottomKMd5.md5Hex(v.asInstanceOf[UTF8String].getBytes)
      // only insert if it can make the bottom k (avoids churn on big groups)
      if (buf.size < k || hex.compareTo(buf.last()) < 0) {
        buf.add(hex)
        trim(buf)
      }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[String], other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    buf.addAll(other)
    trim(buf)
    buf
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val sb = new java.lang.StringBuilder()
    val it = buf.iterator()
    while (it.hasNext) { sb.append(it.next()); sb.append('\n') }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val buf = new java.util.TreeSet[String]()
    val s = new String(bytes, StandardCharsets.UTF_8)
    if (s.nonEmpty) s.split('\n').foreach(buf.add)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKMd5 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKMd5 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKMd5 =
    copy(child = newChildren.head)
}

object BottomKMd5 {
  private val hexDigits = "0123456789abcdef".toCharArray

  def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bottom_k_md5"),
      new ExpressionInfo(classOf[BottomKMd5].getName, "bottom_k_md5"),
      (cs: Seq[Expression]) => {
        // analysis-time errors, not internal crashes, on misuse
        if (cs.length != 2) throw new IllegalArgumentException(
          s"bottom_k_md5 expects exactly 2 arguments (column, k), got ${cs.length}")
        if (!cs(1).foldable) throw new IllegalArgumentException(
          "bottom_k_md5: k must be a constant")
        BottomKMd5(cs.head, cs(1).eval().asInstanceOf[Number].intValue())
      })
}
