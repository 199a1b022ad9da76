package graft

import java.security.MessageDigest

import graft.ops.Corpus
import graft.sources.Tables

/** c11 DSIR importance selection — exactness pinned against a from-scratch
  * driver-side reimplementation on sf0.001 (tokenize → hash → count →
  * smooth → integer micro-nat weights → integer dot product → top-N), so
  * a drift in any stage (tokenizer, bucket hash, smoothing constant,
  * scaling, tie-break) fails loudly here before it reaches the DuckDB
  * gate.
  */
class ImportanceSelectSpec extends SparkSpec {

  private def buckets(text: String): Seq[Int] = {
    val t = text.split(" ").filter(_.nonEmpty).toSeq
    val feats = t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    feats.map { f =>
      val hex = MessageDigest.getInstance("MD5").digest(f.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 2), 16)
    }
  }

  test("scores, ranks and membership match a from-scratch reimplementation") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val nb = Corpus.dsirBuckets
    val tCnt = new Array[Long](nb)
    val rCnt = new Array[Long](nb)
    docs.foreach { case (_, src, text) =>
      val arr = if (src == Corpus.benchmarkSource) tCnt else rCnt
      buckets(text).foreach(b => arr(b) += 1)
    }
    val lw = Array.tabulate(nb)(b =>
      math.round((math.log(tCnt(b) + 1.0) - math.log(rCnt(b) + 1.0)) * 1e6))
    val c = math.round((math.log(rCnt.sum + nb.toDouble)
      - math.log(tCnt.sum + nb.toDouble)) * 1e6)
    // a doc with zero features never reaches the engine's scorer (its
    // explode emits no rows) — mirror that here
    val expected = docs.filter(_._2 != Corpus.benchmarkSource)
      .map { case (id, _, text) => (id, buckets(text)) }
      .filter(_._2.nonEmpty)
      .map { case (id, bs) => (id, bs.map(b => lw(b)).sum + bs.length * c) }
      .sortBy { case (id, ss) => (-ss, id) }
      .take(Corpus.dsirSelectN)

    val got = Corpus.importanceSelect(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.length == expected.length)
    got.zip(expected).zipWithIndex.foreach {
      case (((gid, grnk, gscore), (eid, ess)), i) =>
        assert(grnk == i + 1, s"rank at $i")
        assert(gid == eid, s"doc at rank ${i + 1}: got $gid expected $eid")
        val escore = BigDecimal(ess.toDouble / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(gscore - escore) < 1e-9,
          s"score at rank ${i + 1}: got $gscore expected $escore")
    }
  }

  test("plan: distributed top-N and broadcast weight join — no global sort") {
    val plan = Corpus.importanceSelect(spark, sf0001)
      .queryExecution.executedPlan.toString
    // top-N must be TakeOrderedAndProject (per-partition heads merged on
    // the driver), never a full Sort + Limit over the corpus
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject in:\n$plan")
    // the 256-row weight table joins broadcast — the corpus-side count
    // table never shuffles for it
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast weight join in:\n$plan")
  }

  test("selection excludes the benchmark slice and is deterministic") {
    val a = Corpus.importanceSelect(spark, sf0001).collect()
    val benchIds = Tables.documents(spark, sf0001)
      .where(org.apache.spark.sql.functions.col("source") === Corpus.benchmarkSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.nonEmpty && a.forall(r => !benchIds.contains(r.getLong(0))))
    val scores = a.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
      "scores must be non-increasing in rank")
    val b = Corpus.importanceSelect(spark, sf0001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
