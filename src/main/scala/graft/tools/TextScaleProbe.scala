package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.IncrementalDedup

/** Corpus-growth measurement for the flagship TEXT dedup state (the d12
  * SimHash cluster family): the media modalities have measured
  * 1k→10k→100k decades (SCALE.md, MediaScaleProbe); this probe gives the
  * text state store the same evidence — one-shot vs split-ingest vs
  * serve vs delete timings across 10k→100k→1M synthetic documents, with
  * recall asserted against planted duplicate pairs, plus the
  * FIXED-BATCH ingest the streaming deployment actually pays (a 1k-doc
  * merge into a state one/two decades larger).
  *
  * Corpus: deterministic 50-token documents (token = hash-derived word
  * from a 5000-word lexicon), 5% of base docs twinned under a distinct
  * id with IDENTICAL text — SimHash distance 0, so every planted pair is
  * within any verification radius and recall is a hard gate, while the
  * hash-random remainder gives the band index realistic selectivity.
  *
  * Usage: runMain graft.tools.TextScaleProbe [w32|w64] [sizes...]
  *   (default w32 10000 100000 1000000; corpora cache under
  *   /tmp/graft_textscale_<n>). The width dial matters at the top of the
  *   range: 32-bit SimHash under hamming≤3 admits ~1.3e-6 of RANDOM doc
  *   pairs, so past ~10^5 docs the incidental-pair graph grows
  *   quadratically and the label machinery pays for it — the measured
  *   saturation that makes the 64-bit regime the documented corpus-scale
  *   path (incidental rate ~2.4e-15: planted pairs only, at any n here).
  */
object TextScaleProbe {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** text(id, salt): 50 pseudo-random lexicon words, fully codegen. */
  private def textOf(id: org.apache.spark.sql.Column) =
    array_join(transform(sequence(lit(0), lit(49)),
      k => concat(lit("w"), pmod(xxhash64(id, k), lit(5000)))), " ")

  /** Generate (or reuse) the corpus at /tmp/graft_textscale_<n>: base ids
    * [0, n) plus a twin id+n for every id % 20 == 0.
    */
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

  /** Planted pairs (base id, twin id) as a frame — recall is checked
    * distributed (a 1M-label collect would measure the driver, not the
    * engine).
    */
  private def planted(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).where(pmod(col("id"), lit(20)) === 0)
      .select(col("id").as("d1"), (col("id") + n).as("d2"))

  private def assertRecall(spark: SparkSession, state: String, n: Long,
      tag: String): Unit = {
    val labels = IncrementalDedup.clusters(spark, state)
      .select(col("doc_id"), col("cluster_id"))
    // count MATCHED pairs against the planted total (inner joins would
    // otherwise silently drop a twin missing from the serve entirely and
    // pass vacuously — the exact regression a recall gate exists to catch)
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
    val width = if (args.headOption.exists(_.startsWith("w"))) args.head.drop(1).toInt else 32
    val rest = args.toSeq.filterNot(_.startsWith("w"))
    val sizes = if (rest.nonEmpty) rest.map(_.toLong)
      else Seq(10000L, 100000L, 1000000L)
    val spark = GraftSession.create("text-scale-probe")
    println(s"signature width: $width bits")

    println("| n docs | one-shot s | split-ingest s | serve s | fixed-1k-batch s | delete+serve s |")
    println("|---|---|---|---|---|---|")
    val rows = for (n <- sizes) yield {
      val dir = corpus(spark, n)
      def docs = spark.read.parquet(dir)
      docs.count() // warm the read + codegen

      // ONE-SHOT: the whole corpus as a single merge into fresh state
      val s1 = graft.util.TmpDirs.scratch(s"graft_textprobe_one_${n}_").toString
      val (_, tOneShot) = time {
        IncrementalDedup.merge(spark, s1, docs, width = width, batchKey = Some("all"))
      }
      assertRecall(spark, s1, n, "one-shot")

      // SPLIT-INGEST: two hash-parity merges (twins split across batches
      // by id hash, so cross-batch pair discovery is on the hook)
      val s2 = graft.util.TmpDirs.scratch(s"graft_textprobe_split_${n}_").toString
      val parity = pmod(xxhash64(col("doc_id")), lit(2))
      val (_, tIngest) = time {
        IncrementalDedup.merge(spark, s2, docs.where(parity === 0), width = width, batchKey = Some("h0"))
        IncrementalDedup.merge(spark, s2, docs.where(parity === 1), width = width, batchKey = Some("h1"))
      }
      val (_, tServe) = time { IncrementalDedup.clusters(spark, s2).count() }
      assertRecall(spark, s2, n, "split-ingest")

      // FIXED-BATCH: 1k brand-new docs into the n-sized state — the
      // marginal per-batch cost a continuous-ingest deployment pays
      val fresh = spark.range(2L * n + 7, 2L * n + 7 + 1000)
        .select(col("id").as("doc_id"), textOf(col("id")).as("text"))
      val (_, tBatch) = time {
        IncrementalDedup.merge(spark, s2, fresh, width = width, batchKey = Some("fix1k"))
        IncrementalDedup.clusters(spark, s2).count()
      }

      // DELETE 1% of base docs, serve again
      val victims = spark.range(n).where(pmod(col("id"), lit(100)) === 0)
        .select(col("id").as("doc_id"))
      val (_, tDelete) = time {
        IncrementalDedup.delete(spark, s2, victims)
        IncrementalDedup.clusters(spark, s2).count()
      }
      val dead = IncrementalDedup.clusters(spark, s2)
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
