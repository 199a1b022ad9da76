package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.Dedup

/** d26 semantics against an INDEPENDENT reference: dynamic-programming
  * longest-common-suffix marking (no anchors, no diagonals-as-windows) —
  * a position of doc D is cut iff some common substring of ≥ minSpan
  * tokens with an EARLIER doc contains it, which is provably the same
  * predicate as the anchor method's maximal-diagonal-run union.
  */
class SpanRemovalSpec extends SparkSpec {

  /** Stage a synthetic corpus as a documents.parquet the loaders accept. */
  private def stage(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = graft.util.TmpDirs.scratch("graft_spanrm_spec_").toString
    docs.map { case (id, text) => (id, text, "en", "srcX", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** DP reference: covered positions of `b` against one earlier doc `a`. */
  private def coveredBy(a: Array[String], b: Array[String], minSpan: Int): Set[Int] = {
    val L = Array.ofDim[Int](a.length + 1, b.length + 1)
    val out = scala.collection.mutable.Set[Int]()
    for (i <- 1 to a.length; j <- 1 to b.length) {
      L(i)(j) = if (a(i - 1) == b(j - 1)) L(i - 1)(j - 1) + 1 else 0
      if (L(i)(j) >= minSpan) out ++= (j - L(i)(j)) until j // 0-based [start, j)
    }
    out.toSet
  }

  private def reference(docs: Seq[(Long, Array[String])],
      minSpan: Int = Dedup.minSpanTokens): Map[Long, (Int, Int, String)] = {
    def sha(s: String): String = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sorted = docs.sortBy(_._1)
    sorted.map { case (id, t) =>
      val cov = sorted.filter(_._1 < id)
        .map(e => coveredBy(e._2, t, minSpan)).foldLeft(Set.empty[Int])(_ ++ _)
      val kept = t.zipWithIndex.collect { case (w, i) if !cov.contains(i) => w }
      id -> ((t.length, t.length - kept.length, sha(kept.mkString(" "))))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (Int, Int, String)] = {
    val dir = stage(docs)
    Dedup.spanRemoval(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
  }

  private def toks(s: String): Array[String] = s.split(" ").filter(_.nonEmpty)

  test("planted spans: exact-threshold, sub-threshold, full copy, chains") {
    val w = (0 until 40).map(i => s"w$i")
    val shared21 = w.slice(5, 26) // 21 tokens
    val docs = Seq(
      0L -> w.mkString(" "),
      // 21-token block from doc 0 between unique prefix/suffix
      1L -> ((0 until 10).map(i => s"x$i") ++ shared21 ++ (0 until 6).map(i => s"y$i")).mkString(" "),
      // shares only a 10-token run (< 12) with doc 1 -> untouched
      2L -> ((0 until 4).map(i => s"z$i") ++ (0 until 10).map(i => s"x$i")).mkString(" "),
      // verbatim copy of doc 0 -> fully covered, empties
      3L -> w.mkString(" "),
      // within-doc repetition only: cross-doc semantics leave it alone
      4L -> (((0 until 12).map(i => s"r$i") ++ (0 until 12).map(i => s"r$i")).mkString(" ")),
      // subset of the span shared by docs 0 AND 1 (chain) -> fully covered
      5L -> shared21.mkString(" "))
    val got = run(docs)
    val ref = reference(docs.map { case (id, s) => id -> toks(s) })
    assert(got == ref)
    // spot-verify the reference itself agrees with hand counts
    assert(got(1L)._2 == 21)
    assert(got(2L)._2 == 0)
    assert(got(3L)._2 == 40)
    assert(got(4L)._2 == 0)
    assert(got(5L)._2 == 21)
  }

  test("boundary: spans at document start and end, exactly minSpan long") {
    val s12 = (0 until Dedup.minSpanTokens).map(i => s"s$i")
    val docs = Seq(
      0L -> ((0 until 5).map(i => s"a$i") ++ s12 ++ (0 until 5).map(i => s"b$i")).mkString(" "),
      1L -> (s12 ++ (0 until 7).map(i => s"c$i")).mkString(" "),      // span at start
      2L -> ((0 until 7).map(i => s"d$i") ++ s12).mkString(" "),      // span at end
      // one token short of the threshold -> untouched
      3L -> s12.init.mkString(" "))
    val got = run(docs)
    val ref = reference(docs.map { case (id, s) => id -> toks(s) })
    assert(got == ref)
    assert(got(1L)._2 == Dedup.minSpanTokens && got(2L)._2 == Dedup.minSpanTokens)
    assert(got(3L)._2 == 0)
  }

  test("randomized corpora: anchor-run removal equals the DP reference") {
    // small vocab forces accidental shared runs; blocks copied between
    // docs force real ones
    val vocab = (0 until 8).map(i => s"v$i")
    val genDoc = Gen.listOfN(30, Gen.oneOf(vocab)).map(_.toArray)
    val genCorpus = for {
      n <- Gen.choose(2, 5)
      base <- Gen.listOfN(n, genDoc)
      // splice a block of doc 0 into doc n-1 to guarantee a long span
      at <- Gen.choose(0, 10)
    } yield {
      val block = base.head.slice(3, 3 + 15)
      val last = base.last.take(at) ++ block ++ base.last.drop(at)
      (base.init :+ last).zipWithIndex.map { case (t, i) => i.toLong -> t }
    }
    val prop = Prop.forAllNoShrink(genCorpus) { corpus =>
      val got = run(corpus.map { case (id, t) => id -> t.mkString(" ") })
      val ref = reference(corpus)
      if (got != ref) {
        println(s"MISMATCH corpus=${corpus.map(_._2.mkString(" "))}")
        println(s"got=$got ref=$ref")
      }
      got == ref
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
