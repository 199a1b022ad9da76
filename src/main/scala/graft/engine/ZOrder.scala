package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for MULTI-dimensional data skipping —
  * the layout tool directory partitioning can't provide. A partitioned
  * sink (q53) prunes on ONE coarse column; sorting prunes on ONE fine
  * column; at 100 TB a query that boxes two dimensions (user × day,
  * region × price, …) needs every file's min/max statistics TIGHT on
  * BOTH columns, which is exactly what clustering by interleaved bits
  * buys: consecutive z-values are near in every interleaved dimension, so
  * a range-partitioned, z-sorted write yields files whose per-column
  * parquet stats cover small boxes — and the vectorized reader's
  * stats-based row-group/file skipping (plain `PushedFilters`, no engine
  * extension needed) drops most of the layout for any 2-D box predicate.
  *
  * The z-value is a pure Column expression (bit shifts and masks, fully
  * codegen) and is used ONLY for layout: it is dropped before the write,
  * so the files carry the original schema and any reader benefits without
  * knowing the layout exists. This is the standard lakehouse OPTIMIZE
  * ZORDER BY shape, built from Spark primitives.
  */
object ZOrder {

  /** Bit-interleave two non-negative integer columns (a's bit i lands at
    * output bit 2i+1, b's at 2i) over the low `bits` bits of each.
    * Columns must fit in `bits` bits for locality to hold (values beyond
    * collapse onto the same high positions; correctness of any QUERY is
    * unaffected — z is layout-only).
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1), 2 * i))
    }

  /** Write `df` clustered along the z-curve of (a, b) into `numFiles`
    * range partitions (each file = one compact z-range, sorted within so
    * row groups nest the same property). The helper column is dropped
    * before the write — projection preserves intra-partition order.
    */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("_z", zValue(a, b, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
