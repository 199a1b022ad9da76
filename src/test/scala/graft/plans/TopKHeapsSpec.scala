package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, SortOrder}
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Direct tests of the bounded-heap pass, exercising the flush path that
  * query-level tests can't reach (PartialTopKPerKeyExec.maxKeys is far
  * above any test corpus's key count).
  */
class TopKHeapsSpec extends AnyFunSuite {
  private val key = AttributeReference("key", LongType, nullable = false)()
  private val v = AttributeReference("v", LongType, nullable = false)()
  private val output = Seq(key, v)
  private val ordering = Seq(SortOrder(v, Ascending))

  private def run(rows: Seq[InternalRow], k: Int, maxKeys: Int): Seq[InternalRow] =
    TopKHeaps.retain(rows.iterator, Seq(key), ordering, output, k, maxKeys)
      .map(_.copy()).toSeq

  test("partial flush at tiny maxKeys re-merges to the exact per-key top-k") {
    // 31 keys interleaved so a maxKeys=3 partial flushes dozens of times
    val rows = (0 until 997).map(i => InternalRow((i % 31).toLong, i.toLong))
    val partial = run(rows, k = 2, maxKeys = 3)
    val fin = run(partial, k = 2, maxKeys = Int.MaxValue)
    val expect = rows.groupBy(_.getLong(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).sorted.take(2).toSet }
    val got = fin.groupBy(_.getLong(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).toSet }
    assert(got == expect)
    // flushing emits MORE than k per key overall, never fewer
    assert(partial.size >= fin.size)
    // perfectly interleaved keys above the cap degrade to pass-through
    // (each flush window sees each key once) — same as partial aggregation
    assert(partial.size == rows.size)
  }

  test("partial flush still reduces when keys are locally clustered") {
    // ~32 keys, 31 contiguous rows each: a maxKeys=3 partial flushes every
    // 3rd key change but each heap has absorbed a full run first.
    val rows = (0 until 997).map(i => InternalRow((i / 31).toLong, i.toLong))
    val partial = run(rows, k = 2, maxKeys = 3)
    assert(partial.size <= 2 * 33) // ≤ k rows per key per flush window
    val fin = run(partial, k = 2, maxKeys = Int.MaxValue)
    val expect = rows.groupBy(_.getLong(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).sorted.take(2).toSet }
    val got = fin.groupBy(_.getLong(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).toSet }
    assert(got == expect)
  }

  test("unbounded pass emits exactly min(k, group size) rows per key") {
    val rows = (0 until 100).map(i => InternalRow((i % 7).toLong, i.toLong))
    val out = run(rows, k = 5, maxKeys = Int.MaxValue)
    val sizes = out.groupBy(_.getLong(0)).map { case (g, rs) => g -> rs.size }
    assert(sizes.values.forall(_ == 5))
    val single = run(Seq(InternalRow(1L, 42L)), k = 9, maxKeys = Int.MaxValue)
    assert(single.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 42L)))
  }
}
