package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ops.{Text, TextAnalysis}
import graft.sources.Tables

/** The native `lexicon_counts` expression (graft.exprs.LexiconCounts) must
  * equal the N-pass HOF formulation it replaced — reproduced here verbatim
  * as the reference oracle — over real table data plus the edge cases the
  * tables don't hit (empty text, cross-lexicon tokens, duplicate tokens).
  */
class LexiconCountsSpec extends SparkSpec {
  import spark.implicits._

  // --- HOF reference formulation (the pre-optimization scorer) -----------

  private def tokensH(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  private def countsH(text: Column, lexicons: Seq[Seq[String]]): Column = {
    val t = tokensH(text)
    array(lexicons.map(ws =>
      size(filter(t, w => w.isin(ws: _*))).cast("long")) ++
      Seq(size(t).cast("long"), size(array_distinct(t)).cast("long")): _*)
  }

  private val lexicons = Seq(
    Seq("the", "a", "of", "and"), Seq("der", "die", "und", "nicht"),
    Seq("el", "la", "los", "que"), Seq("le", "les", "des", "est"))

  private def mismatches(df: org.apache.spark.sql.DataFrame): Long =
    df.where(not(col("want") <=> col("got"))).count()

  test("lexicon_counts == HOF reference over sf0.001 documents") {
    val df = Tables.documents(spark, sf0001).select(
      countsH(col("text"), lexicons).as("want"),
      Text.lexiconCounts(col("text"), lexicons).as("got"))
    assert(mismatches(df) == 0)
  }

  test("lexicon_counts: stopword lexicon over sf0.001 documents") {
    val df = Tables.documents(spark, sf0001).select(
      countsH(col("text"), Seq(Text.stopwords)).as("want"),
      Text.lexiconCounts(col("text"), Seq(Text.stopwords)).as("got"))
    assert(mismatches(df) == 0)
  }

  test("edge cases: empty, spaces-only, duplicate and multi-lexicon tokens, null") {
    val rows = Seq(Some(""), Some("   "), Some("the the the"),
      Some("the und le el que"), Some("a  b"), Some("zzz"), None).toDF("text")
    // the HOF reference wraps per-element nulls in a non-null array, the
    // native expression propagates null for null input (UnaryExpression
    // semantics) — compare on non-null rows, pin null-in → null-out apart
    val df = rows.where(col("text").isNotNull).select(
      countsH(col("text"), lexicons).as("want"),
      Text.lexiconCounts(col("text"), lexicons).as("got"))
    assert(mismatches(df) == 0)
    assert(rows.select(Text.lexiconCounts(col("text"), lexicons).as("lc"))
      .where(col("text").isNull && col("lc").isNotNull).count() == 0)
  }

  test("a token present in two lexicons counts for both") {
    val df = Seq("shared word").toDF("text").select(
      Text.lexiconCounts(col("text"), Seq(Seq("shared"), Seq("shared", "word"))).as("lc"))
    assert(df.head().getSeq[Long](0) == Seq(1L, 2L, 2L, 2L))
  }

  test("callable from SQL text (extension surface)") {
    val n = spark.sql(
      "SELECT lexicon_counts('the a x', 'the,a|x') AS lc").head().getSeq[Long](0)
    assert(n == Seq(2L, 1L, 3L, 3L))
  }

  test("t2 lang-id plan carries ONE lexicon_counts pass, no HOF lambdas") {
    val plan = TextAnalysis.langId(spark, sf0001).queryExecution.optimizedPlan.toString
    assert(plan.contains("lexicon_counts"))
    assert(!plan.contains("lambdafunction"),
      s"interpreted HOF lambda survived in the t2 plan:\n$plan")
  }
}
