package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.IncrementalMinHash

/** Corpus-growth measurement for the MinHash-LSH dedup state (the d15
  * family) — the second text decade table round 18's VERDICT asked for.
  * [[TextScaleProbe]] measured the d12 SimHash family and FOUND its
  * 32-bit saturation cliff; d15 has a different state shape (4×3 MinHash
  * band signatures + the persisted per-doc shingle SETS the exact-Jaccard
  * verification joins back), a different candidate geometry (band-equality
  * buckets over 96-bit band values — incidental collisions are
  * cryptographic-hash rare, unlike hamming≤3-of-32's ~1.3e-6), and a
  * heavier per-doc ingest cost (one md5 per shingle). The question this
  * probe answers with numbers: does the d15 geometry stay in the flat
  * regime across 10k→100k→1M where d12's 32-bit geometry cliffed?
  *
  * Corpus: identical construction to [[TextScaleProbe]] (deterministic
  * 50-token docs from a 5000-word lexicon, 5% planted twins with
  * IDENTICAL text — Jaccard 1.0, inside any threshold, so recall is a
  * hard gate while the remainder gives the band index realistic
  * selectivity); the corpora cache is SHARED with TextScaleProbe, so the
  * two tables measure the same bytes.
  *
  * Usage: runMain graft.tools.MinHashScaleProbe [sizes...]
  *   (default 10000 100000 1000000)
  */
object MinHashScaleProbe {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** text(id, salt): 50 pseudo-random lexicon words, fully codegen —
    * byte-identical to [[TextScaleProbe.textOf]] so the cached corpora
    * are shared.
    */
  private def textOf(id: org.apache.spark.sql.Column) =
    array_join(transform(sequence(lit(0), lit(49)),
      k => concat(lit("w"), pmod(xxhash64(id, k), lit(5000)))), " ")

  private def corpus(spark: SparkSession, n: Long): String = {
    val dir = s"/tmp/graft_textscale_$n"
    val f = new java.io.File(dir)
    if (!new java.io.File(f, "_SUCCESS").exists()) {
      val base = spark.range(n)
        .select(col("id").as("doc_id"), textOf(col("id")).as("text"))
      val twins = spark.range(n).where(pmod(col("id"), lit(20)) === 0)
        .select((col("id") + n).as("doc_id"), textOf(col("id")).as("text"))
      base.unionAll(twins).repartition(32).write.mode("overwrite").parquet(dir)
    }
    dir
  }

  private def planted(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).where(pmod(col("id"), lit(20)) === 0)
      .select(col("id").as("d1"), (col("id") + n).as("d2"))

  private def assertRecall(spark: SparkSession, state: String, n: Long,
      tag: String): Unit = {
    val labels = IncrementalMinHash.clusters(spark, state)
      .select(col("doc_id"), col("cluster_id"))
    val matched = planted(spark, n)
      .join(labels.toDF("d1", "c1"), "d1")
      .join(labels.toDF("d2", "c2"), "d2")
      .where(col("c1") === col("c2"))
      .count()
    val want = planted(spark, n).count()
    require(matched == want,
      s"$tag@$n: only $matched of $want planted twin pairs co-clustered " +
        "(missing-from-serve or split)")
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(10000L, 100000L, 1000000L)
    val spark = GraftSession.create("minhash-scale-probe")

    println("| n docs | one-shot s | split-ingest s | serve s | fixed-1k-batch s | delete+serve s |")
    println("|---|---|---|---|---|---|")
    val rows = for (n <- sizes) yield {
      val dir = corpus(spark, n)
      def docs = spark.read.parquet(dir)
      docs.count() // warm the read + codegen

      // ONE-SHOT: the whole corpus as a single merge into fresh state
      val s1 = graft.util.TmpDirs.scratch(s"graft_mhprobe_one_${n}_").toString
      val (_, tOneShot) = time {
        IncrementalMinHash.merge(spark, s1, docs, batchKey = Some("all"))
      }
      assertRecall(spark, s1, n, "one-shot")

      // SPLIT-INGEST: two hash-parity merges (twins split across batches
      // by id hash, so cross-batch pair discovery is on the hook)
      val s2 = graft.util.TmpDirs.scratch(s"graft_mhprobe_split_${n}_").toString
      val parity = pmod(xxhash64(col("doc_id")), lit(2))
      val (_, tIngest) = time {
        IncrementalMinHash.merge(spark, s2, docs.where(parity === 0), batchKey = Some("h0"))
        IncrementalMinHash.merge(spark, s2, docs.where(parity === 1), batchKey = Some("h1"))
      }
      val (_, tServe) = time { IncrementalMinHash.clusters(spark, s2).count() }
      assertRecall(spark, s2, n, "split-ingest")

      // FIXED-BATCH: 1k brand-new docs into the n-sized state — the
      // marginal per-batch cost a continuous-ingest deployment pays
      val fresh = spark.range(2L * n + 7, 2L * n + 7 + 1000)
        .select(col("id").as("doc_id"), textOf(col("id")).as("text"))
      val (_, tBatch) = time {
        IncrementalMinHash.merge(spark, s2, fresh, batchKey = Some("fix1k"))
        IncrementalMinHash.clusters(spark, s2).count()
      }

      // DELETE 1% of base docs, serve again
      val victims = spark.range(n).where(pmod(col("id"), lit(100)) === 0)
        .select(col("id").as("doc_id"))
      val (_, tDelete) = time {
        IncrementalMinHash.delete(spark, s2, victims)
        IncrementalMinHash.clusters(spark, s2).count()
      }
      val dead = IncrementalMinHash.clusters(spark, s2)
        .join(victims, "doc_id").count()
      require(dead == 0, s"delete@$n: $dead tombstoned docs survive in the serve")

      println(f"| $n | $tOneShot%.2f | $tIngest%.2f | $tServe%.2f | $tBatch%.2f | $tDelete%.2f |")
      (n, tOneShot, tIngest, tServe, tBatch, tDelete)
    }

    println("\ndecade ratios (step/previous; data grows 10x per step):")
    println("| step | one-shot | split-ingest | serve | fixed-1k-batch | delete+serve |")
    println("|---|---|---|---|---|---|")
    rows.sliding(2).foreach {
      case Seq(s, l) =>
        println(f"| ${s._1}→${l._1} | ${l._2 / s._2}%.1f | ${l._3 / s._3}%.1f | " +
          f"${l._4 / s._4}%.1f | ${l._5 / s._5}%.1f | ${l._6 / s._6}%.1f |")
      case _ => ()
    }
    spark.stop()
  }
}
