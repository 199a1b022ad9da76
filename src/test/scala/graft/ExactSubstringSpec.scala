package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** d13: the anchor-index + diagonal-run construction must compute the TRUE
  * longest shared token span — the spec pins it on hand-built corpora
  * where the answer is known by construction, including the repeated-token
  * case where anchors collide within a document.
  */
class ExactSubstringSpec extends SparkSpec {

  /** Write a documents table with the given texts to a scratch sf dir. */
  private def corpus(texts: Seq[String]): String = {
    val dir = graft.util.TmpDirs.scratch("graft_d13_spec_").toString
    import spark.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "web", t.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("longest shared span is exact on a constructed pair") {
    // docs 0/1 share exactly a 14-token span; doc 2 shares nothing long
    val span = (1 to 14).map(i => s"w$i").mkString(" ")
    val dir = corpus(Seq(
      s"alpha beta $span gamma delta",
      s"eps zeta eta $span theta",
      "iota kappa lambda mu nu xi omicron pi rho sigma"))
    val rows = Dedup.exactSubstringPairs(spark, dir, minSpan = 10).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((0L, 1L, 14L)))
  }

  test("repeated tokens: overlapping in-doc anchors still yield the true span") {
    // shared run of five 'a' tokens — anchors repeat within each doc
    val dir = corpus(Seq(
      "a a a a a b unique1 unique2 unique3",
      "c a a a a a distinct1 distinct2 distinct3"))
    val rows = Dedup.exactSubstringPairs(spark, dir, minSpan = 5).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((0L, 1L, 5L)))
  }

  test("pairs below the span threshold are not emitted") {
    val span = (1 to 6).map(i => s"s$i").mkString(" ")
    val dir = corpus(Seq(s"one two $span", s"three four $span"))
    assert(Dedup.exactSubstringPairs(spark, dir, minSpan = 7).collect().isEmpty)
    val ok = Dedup.exactSubstringPairs(spark, dir, minSpan = 6).collect()
    assert(ok.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((0L, 1L, 6L)))
  }

  test("plan shape: candidates only through the anchor equi-join, no cartesian") {
    val plan = Dedup.exactSubstringPairs(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"d13 plan contains a cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"d13 plan contains a nested-loop join:\n$plan")
  }

  test("the tokenize+explode pipeline runs ONCE: self-join reuses the anchor exchange") {
    val df = Dedup.exactSubstringPairs(spark, sf0001)
    df.collect() // AQE reuses stages at runtime — inspect the FINAL plan
    val plan = df.queryExecution.executedPlan.toString
    val fin = plan.linesIterator.takeWhile(!_.contains("Initial Plan")).mkString("\n")
    assert("documents.parquet".r.findAllIn(fin).size == 1,
      s"d13 final plan scans the corpus more than once:\n$fin")
  }
}
