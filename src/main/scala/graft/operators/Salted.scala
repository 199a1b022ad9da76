package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Salted join for skewed keys — the static counterpart of AQE's runtime
  * skew-join splitting.
  *
  * When one join key carries a disproportionate share of the fact rows, a
  * plain shuffle join serializes that key into a single task. AQE splits
  * such partitions at runtime *when it sees the stats*; explicit salting is
  * the pattern for the cases AQE cannot cover — stream-stream joins,
  * pre-AQE engines, or when the skew is inside a single key (AQE splits
  * partitions, not keys).
  *
  * Mechanics: the fact side gets a deterministic per-row salt in [0, S);
  * the dimension side is replicated S× (one copy per salt value); the join
  * key becomes (key, salt), spreading each hot key over S tasks. The salt
  * affects only placement — the join RESULT is byte-identical to the
  * unsalted join, which is exactly what the correctness gate checks (q29
  * shares its oracle semantics with a plain join).
  *
  * Cost model at 100 TB: fact rows shuffle once either way; the dimension
  * shuffles S× its (small) size — salting trades bounded dimension
  * replication for eliminating the per-key straggler, the same trade
  * broadcast makes, but it still works when the dimension is too big to
  * broadcast.
  */
object SaltedJoin {

  val numSalts = 8

  /** lineitem ⋈ orders on orderkey through the salted path, aggregated to
    * order-priority totals (the aggregation makes the result compact and
    * deterministic; the join itself is the operator under test).
    */
  def lineitemOrdersSalted(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_linenumber"))
      // per-row deterministic salt: spreads every orderkey over numSalts
      // partitions regardless of its frequency
      .withColumn("_salt",
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(numSalts.toLong)))
    val dim = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("_salt", explode(sequence(lit(0L), lit(numSalts - 1L))))
      // The pattern exists for dimensions too big to broadcast — force the
      // shuffle join so the executed plan is the one being demonstrated
      // (at test scale AQE would otherwise just broadcast the dim and the
      // salt would never touch the wire).
      .hint("shuffle_merge")
    fact.join(dim,
        fact("l_orderkey") === dim("o_orderkey") && fact("_salt") === dim("_salt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }
}
