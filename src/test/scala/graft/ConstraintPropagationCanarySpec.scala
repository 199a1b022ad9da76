package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Canary for the Spark constraint-propagation crash that
  * ConnectedComponents works around (see
  * `ConnectedComponents.withoutConstraintPropagation`): `localCheckpoint`
  * preserves the origin plan's constraints on the LogicalRDD, those can
  * reference attributes pruned from the checkpointed projection, and
  * `Union.rewriteConstraints` then dies with `key not found: <attr>`.
  *
  * The repro below is the label-propagation round shape (checkpointed
  * union + pointer-jump left-join, iterated). The canary has two jobs:
  *
  *   1. PIN that the workaround still works: the same loop under
  *      propagation OFF must succeed.
  *   2. WATCH upstream: the loop under propagation ON is EXPECTED to
  *      crash on current Spark. The day a Spark upgrade makes it pass,
  *      this test fails loudly with instructions to delete the
  *      workaround — so the conf toggle can't outlive the bug it papers
  *      over.
  */
class ConstraintPropagationCanarySpec extends SparkSpec {

  private val key = "spark.sql.constraintPropagation.enabled"

  /** Three label-propagation rounds (neighbor-min + pointer jump, each
    * side checkpointed) — the minimal shape that trips the bug.
    */
  private def loopRounds(): Long = {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val sym = pairs.union(pairs.select(col("dst"), col("src")).toDF("src", "dst"))
    var labels: DataFrame = sym.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .select(col("src").as("node"), col("label")).localCheckpoint(true)
    var i = 0
    var n = 0L
    while (i < 3) {
      val prop = sym.as("e")
        .join(labels.as("l"), col("e.src") === col("l.node"))
        .select(col("e.dst").as("node"), col("l.label").as("label"))
        .union(labels)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      labels = prop.as("x")
        .join(prop.select(col("node").as("jn"), col("label").as("jl")).as("y"),
          col("x.label") === col("jn"), "left")
        .select(col("x.node").as("node"),
          least(col("x.label"), coalesce(col("jl"), col("x.label"))).as("label"))
        .localCheckpoint(true)
      n = labels.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
      i += 1
    }
    n
  }

  private def withPropagation[T](on: Boolean)(f: => T): T = {
    val prev = spark.conf.get(key)
    spark.conf.set(key, on.toString)
    try f finally spark.conf.set(key, prev)
  }

  test("the workaround's guarantee: the CC loop shape succeeds with propagation OFF") {
    // components {1,2,3} → label 1, {4,5} → label 4: Σ = 1+1+1+4+4
    assert(withPropagation(on = false)(loopRounds()) == 11L)
  }

  test("canary: Spark still crashes on checkpointed-union plans with propagation ON") {
    val outcome = try { Left(withPropagation(on = true)(loopRounds())) }
    catch { case e: Throwable => Right(e) }
    outcome match {
      case Right(e) =>
        val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
          .map(x => String.valueOf(x.getMessage)).mkString(" | ")
        assert(msgs.contains("key not found"),
          s"the loop crashed, but not with the known constraint-rewrite signature: $msgs")
        info(s"upstream bug still present (${e.getClass.getSimpleName}: " +
          s"${String.valueOf(e.getMessage).take(80)}) — workaround still required")
      case Left(_) =>
        fail("Spark no longer crashes on the checkpointed-union CC shape with " +
          "constraint propagation ON — delete " +
          "ConnectedComponents.withoutConstraintPropagation and this canary together")
    }
  }
}
