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

/** `misra_gries(col, capacity)` — the Misra-Gries heavy-hitters summary
  * as a mergeable `TypedImperativeAggregate`: returns the candidate
  * tokens (sorted, ≤ capacity of them) whose true frequency COULD exceed
  * total/(capacity+1).
  *
  * The guarantee (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): every item with true count
  * > N/(capacity+1) is in the summary — deletions via the shared
  * decrement can eat at most N/(capacity+1) of any single item's count.
  * The merge (sum counts, then subtract the (capacity+1)-th largest and
  * drop non-positive) preserves exactly that bound, so Spark can run it
  * as map-side partial aggregation: each mapper ships ≤ capacity
  * (token, count) entries, NEVER the full distinct-token table. That is
  * the 100 TB point — a frequency top-k whose shuffle is
  * O(partitions × capacity) instead of O(distinct tokens).
  *
  * The summary's counts are lower bounds, not facts — so this expression
  * deliberately returns only the candidate SET; an exact second pass
  * over the candidates (see `TextAnalysis.heavyHitters`) turns it into a
  * provably-exact top-k.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    weight: Option[Expression] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(capacity > 0, "misra_gries: capacity must be positive")

  override def children: Seq[Expression] = child +: weight.toSeq

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string argument, got ${child.dataType.sql}")
    else if (weight.exists(w => !Seq[DataType](IntegerType, LongType, ShortType)
        .contains(w.dataType)))
      TypeCheckResult.TypeCheckFailure(
        s"misra_gries weight must be integral, got ${weight.get.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight match {
        case None => 1L
        case Some(we) => we.eval(input) match {
          case null => 0L
          case n: Number => n.longValue()
        }
      }
      if (w > 0) {
        val key = v.asInstanceOf[UTF8String].toString
        val cur = buf.get(key)
        if (cur != null) buf.put(key, cur + w)
        else if (buf.size < capacity) buf.put(key, w)
        else if (weight.isEmpty) {
          // classic MG shared decrement: every tracked count -1, zeros
          // evicted — O(capacity) but amortized O(1) (each decrement pays
          // for one prior increment)
          val it = buf.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
          }
        } else {
          // weighted update = merge with a singleton summary: insert, then
          // the (capacity+1)-th-largest reduction restores the bound
          // (every reduction retires offset × (capacity+1) total weight,
          // so accumulated error stays ≤ N/(capacity+1))
          buf.put(key, w)
          reduceToCapacity(buf)
        }
      }
    }
    buf
  }

  /** Subtract the (capacity+1)-th largest count from all entries and drop
    * the non-positive — the mergeable-summaries reduction (only called
    * when the buffer exceeds capacity).
    */
  private def reduceToCapacity(buf: java.util.HashMap[String, Long]): Unit = {
    val counts = new Array[Long](buf.size)
    var i = 0
    val vit = buf.values().iterator()
    while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
    java.util.Arrays.sort(counts)
    val offset = counts(buf.size - capacity - 1) // (capacity+1)-th largest
    val eit = buf.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      if (e.getValue <= offset) eit.remove() else e.setValue(e.getValue - offset)
    }
  }

  override def merge(buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    // subtract the (capacity+1)-th largest count from all, drop <= 0:
    // the summed error plus this offset stays within the merged bound
    if (buf.size > capacity) reduceToCapacity(buf)
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new java.util.ArrayList[String](buf.keySet())
    java.util.Collections.sort(keys)
    val out = new Array[Any](keys.size())
    var i = 0
    while (i < keys.size()) { out(i) = UTF8String.fromString(keys.get(i)); i += 1 }
    new GenericArrayData(out)
  }

  // length-prefixed binary: tokens are arbitrary strings (a delimiter
  // format would corrupt on control characters in the data)
  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getValue)
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val count = in.readLong()
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.put(new String(kb, StandardCharsets.UTF_8), count)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head,
      weight = if (newChildren.length > 1) Some(newChildren(1)) else None)
}

object MisraGries {
  /** Registration triple for SparkSessionExtensions.injectFunction:
    * `misra_gries(col, capacity)` counts rows; `misra_gries(col, weight,
    * capacity)` counts pre-aggregated weights (the incremental-state form,
    * where the input is already a (token, n) partial table).
    */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (cs: Seq[Expression]) => {
        if (cs.length != 2 && cs.length != 3) throw new IllegalArgumentException(
          s"misra_gries expects (column, capacity) or (column, weight, capacity), got ${cs.length} args")
        if (!cs.last.foldable) throw new IllegalArgumentException(
          "misra_gries: capacity must be a constant")
        val cap = cs.last.eval().asInstanceOf[Number].intValue()
        MisraGries(cs.head, cap,
          weight = if (cs.length == 3) Some(cs(1)) else None)
      })
}
