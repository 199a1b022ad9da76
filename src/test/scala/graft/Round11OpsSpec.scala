package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.ops.{Corpus, Dedup}

/** Round-11 corpus operators: soft dedup (d25), deterministic shuffle
  * export (c14), streaming decontamination (q72). Each checked against an
  * independent JVM re-derivation or the already-verified one-shot twin.
  */
class Round11OpsSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  test("d25: accept test matches a JVM md5 re-derivation; sizes match d7") {
    val rows = Dedup.softDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    val d7 = Dedup.dupClusters(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.length == nDocs) // every doc decided, clustered or not
    rows.foreach { case (id, size, bucket, kept) =>
      assert(size == d7.getOrElse(id, 1L))
      val b = (java.lang.Long.parseLong(md5hex(s"soft:$id").take(8), 16) % 100).toInt
      assert(bucket == b)
      assert(kept == (if (bucket.toLong * size < 100L) 1 else 0))
      if (size == 1L) assert(kept == 1) // singletons always survive
    }
  }

  test("c14: a permutation — every doc once, contiguous pos, derivable order") {
    val rows = Corpus.shuffleExport(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.length == nDocs)
    assert(rows.map(_._3).distinct.length == nDocs)
    assert(rows.forall { case (s, _, _) => s >= 0 && s < Corpus.exportShards })
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).sorted.toSeq == (1L to g.length).toSeq)
    }
    // independent JVM re-derivation of shard and within-shard order
    rows.groupBy(_._1).foreach { case (shard, g) =>
      val expected = g.map(_._3).sortBy(id => (md5hex(s"shuf:$id"), id))
      assert(g.sortBy(_._2).map(_._3).toSeq == expected.toSeq)
      g.foreach { case (s, _, id) =>
        val b = java.lang.Long.parseLong(md5hex(s"shuf:$id").take(8), 16) % Corpus.exportShards
        assert(s == b.toInt)
      }
    }
  }

  test("t23/q76: count-distinct card maintenance equals one-shot, survives redelivery + compaction") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7))).toSeq
    val oneShot = rows(graft.ops.TextAnalysis.datasetCard(spark, sf0001))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val state = graft.util.TmpDirs.scratch("graft_t23_spec_").toString
    (0 until 4).foreach(r => graft.ops.IncrementalCard.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(4)) === r), Some(s"k$r")))
    assert(rows(graft.ops.IncrementalCard.serve(spark, state)) == oneShot)
    // re-delivered batch key: no new generation, card unchanged (the
    // additive half would otherwise double-count)
    val before = graft.ops.IncrementalCard.completeVersions(spark, state)
    graft.ops.IncrementalCard.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(4)) === 1), Some("k1"))
    assert(graft.ops.IncrementalCard.completeVersions(spark, state) == before)
    assert(rows(graft.ops.IncrementalCard.serve(spark, state)) == oneShot)
    // compaction folds to one generation, keys dedup, card unchanged,
    // markers survive (k2 redelivery still a no-op)
    graft.ops.IncrementalCard.compact(spark, state)
    assert(graft.ops.IncrementalCard.completeVersions(spark, state).size == 1)
    assert(rows(graft.ops.IncrementalCard.serve(spark, state)) == oneShot)
    graft.ops.IncrementalCard.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(4)) === 2), Some("k2"))
    assert(rows(graft.ops.IncrementalCard.serve(spark, state)) == oneShot)
    // streaming drain == one-shot
    val streamed = rows(graft.streaming.DocumentsStream
      .runCardMaintenanceAvailableNow(spark, sf0001))
    assert(streamed == oneShot)
  }

  test("d26: removal is consistent with the d13 pair detector") {
    val removed = Dedup.spanRemoval(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    val pairs = Dedup.exactSubstringPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val laterDocs = pairs.map(_._2).toSet
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "filter(split(text, ' '), x -> x != '') AS t")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(removed.keySet == docs.keySet)
    def sha(s: String): String = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    removed.foreach { case (id, (nTok, nRem, h)) =>
      assert(nTok == docs(id).length)
      assert(nRem >= 0 && nRem <= nTok)
      if (laterDocs.contains(id))
        // the longest shared run with an earlier doc is >= minSpan, and
        // all its positions are cut — so at least that many tokens go
        assert(nRem >= Dedup.minSpanTokens,
          s"doc $id is a d13 later-doc but lost only $nRem tokens")
      else {
        assert(nRem == 0, s"doc $id has no earlier-doc span but lost $nRem")
        assert(h == sha(docs(id).mkString(" ")))
      }
    }
    // the transform must actually fire on this duplicate-dense corpus
    assert(laterDocs.nonEmpty)
  }

  test("d27/q75: state-served removal equals the one-shot d26, any split") {
    val oneShot = Dedup.spanRemoval(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    // 3-way split (different from the registered 4-way entry)
    val state = graft.util.TmpDirs.scratch("graft_d27_spec_").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    (0 until 3).foreach(r => graft.ops.IncrementalSubstring.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(3)) === r), Some(s"s$r")))
    val inc = graft.ops.IncrementalSubstring.removal(spark, sf0001, state).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(inc == oneShot)
    val streamed = graft.streaming.DocumentsStream
      .runSpanRemovalAvailableNow(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(streamed == oneShot)
  }

  test("t21: gauntlet rows normalize as Unicode says they must") {
    val rows = graft.ops.TextAnalysis.normalizeAudit(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    def sha(s: String): String = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // -1: e + combining acute composes to é: one char shorter, changed
    assert(rows(-1L) == ((1, 10, 9, sha("café menu"))))
    // -2: A + combining ring -> Å
    assert(rows(-2L) == ((1, 14, 13, sha("Åland islands"))))
    // -3: Hangul jamo pair composes to one syllable
    assert(rows(-3L) == ((1, 14, 13, sha("가 hangul jamo"))))
    // -4: tab, VT, BEL are all Cc -> stripped
    assert(rows(-4L) == ((1, 16, 13, sha("tabandbellend"))))
    // -5: NBSP is Zs, not Cc/Cf/\s -> untouched
    assert(rows(-5L)._1 == 0)
    // -6: collapse + trim
    assert(rows(-6L) == ((1, 25, 19, sha("double spaced words"))))
    // -7: ZWJ and ZWSP are Cf -> stripped
    assert(rows(-7L) == ((1, 15, 13, sha("zerowidthjoin"))))
    // -8: identity
    assert(rows(-8L)._1 == 0)
    // the ASCII corpus is already normal: every real doc unchanged
    assert(rows.filter(_._1 >= 0).values.forall(_._1 == 0))
    // expression fast path: already-NFC input returns the SAME string
    val direct = graft.exprs.NfcNormalize.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("plain"))
    assert(direct.toString == "plain")
  }

  test("q73: streaming soft dedup equals the one-shot d25") {
    val streamed = graft.streaming.DocumentsStream
      .runSoftDedupAvailableNow(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
    val oneShot = Dedup.softDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
    assert(streamed == oneShot)
  }

  test("q72: streaming per-batch screens drain to the one-shot contamination") {
    val streamed = graft.streaming.DocumentsStream
      .runDecontaminationAvailableNow(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val oneShot = Corpus.contamination(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == oneShot)
  }
}
