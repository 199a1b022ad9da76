package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge.PlanBridge.{column, expression}

/** Column-API access to Spark's OWN Bloom-filter expressions —
  * `BloomFilterAggregate` (the distributed build: map-side partial filters
  * OR-merged at the reduce, a TypedImperativeAggregate like the engine's
  * MisraGries/BottomKMd5) and `BloomFilterMightContain` (the codegen'd
  * probe). Spark registers both only in its INTERNAL function registry
  * (they back the runtime-filter join optimization), so they are not
  * reachable by SQL name; these wrappers build the expressions directly
  * and bridge them through the classic Column API.
  *
  * Contract notes: both sides hash with `xxhash64` — the aggregate puts
  * LONGS and the probe calls `mightContainLong`, so the caller must feed
  * the SAME hash to both (the c16 call sites do). The probe's filter side
  * must be FOLDABLE (a literal of the serialized filter bytes) — that is
  * Spark's own check, and it is what makes the probe a map-side constant:
  * the filter deserializes once per task, not per row.
  */
object BloomScreen {

  /** Aggregate a LongType column (an xxhash64) into a serialized Bloom
    * filter (BinaryType, one row). `numBits` trades size for false-positive
    * rate: n·8 bits ≈ 2% FPP — false positives only cost verify work (the
    * exact join behind the screen removes them), never correctness.
    */
  def bloomAgg(hashed: Column, estimatedItems: Long, numBits: Long): Column =
    column(new BloomFilterAggregate(expression(hashed),
      expression(lit(estimatedItems)), expression(lit(numBits)))
      .toAggregateExpression())

  /** Codegen'd membership probe of a serialized filter literal against a
    * LongType hash column. Returns true for every member (no false
    * negatives) and a bounded fraction of non-members.
    */
  def mightContain(filterBytes: Array[Byte], hashed: Column): Column =
    column(BloomFilterMightContain(expression(lit(filterBytes)), expression(hashed)))
}
