package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.IncrementalMedia

/** Corpus-scale measurement of the media modalities (the one op family
  * whose SCALE.md rows were previously inherited by argument from d21/d33
  * rather than measured): generate [[MediaCorpus]] directories at two
  * sizes, run each modality's one-shot near-dup THROUGH THE PUBLIC
  * dir-threaded signature plus the d21-shaped incremental
  * ingest/serve/delete cycle, assert planted recall (every
  * kernel-measured planted pair is found), and print the sf-ratio table
  * rows for SCALE.md.
  *
  * Usage: runMain graft.tools.MediaScaleProbe [nSmall nLarge [modalities]]
  *   (defaults 1000 10000 ppm,png,wav,y4m; corpora cache under
  *   /tmp/graft_media_<mod>_<n>; the modality filter exists so the
  *   100k-decade run can probe just the cheapest codec)
  */
object MediaScaleProbe {

  private case class OneShot(op: (SparkSession, String) => DataFrame,
    codec: String, maxHamming: Int)

  private val oneShots: Seq[(String, OneShot)] = Seq(
    "ppm" -> OneShot((s, d) => graft.ops.Multimodal.ppmNearDup(s, d), "ppm-dhash", 3),
    "png" -> OneShot((s, d) => graft.ops.Png.imageNearDup(s, d), "png-dhash", 3),
    "tiff" -> OneShot((s, d) => graft.ops.Png.imageNearDup(s, d), "tiff-dhash", 3),
    "wav" -> OneShot((s, d) => graft.ops.Audio.wavNearDup(s, d), "wav-denergy", 3),
    "y4m" -> OneShot((s, d) => graft.ops.Video.videoNearDup(s, d), "y4m-framehash", 6))

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.length >= 2) Seq(args(0).toInt, args(1).toInt) else Seq(1000, 10000)
    val mods = if (args.length >= 3) args(2).split(',').toSet
      else oneShots.map(_._1).toSet
    val spark = GraftSession.create("media-scale-probe")
    import spark.implicits._

    println(s"| modality | n assets | pairs | one-shot s | ingest s | serve s | delete+serve s |")
    println("|---|---|---|---|---|---|---|")
    val rows = for ((mod, os) <- oneShots if mods(mod); n <- sizes) yield {
      val dir = s"/tmp/graft_media_${mod}_$n"
      val planted = MediaCorpus.generate(spark, dir, mod, n, seed = 77L)
      require(planted.nonEmpty, s"$mod corpus planted no pairs — generator drift")

      def media = spark.read.format("binaryFile").load(dir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
        .where(!col("name").startsWith("_"))

      // warm: first read + codegen paid outside the timed runs
      media.count()
      os.op(spark, dir).count()

      // ONE-SHOT through the public signature, recall-asserted
      val (found, tOneShot) = time {
        os.op(spark, dir).collect().map(r => (r.getString(0), r.getString(1))).toSet
      }
      val missing = planted.filterNot(p => found.contains((p.name1, p.name2)))
      require(missing.isEmpty,
        s"$mod@$n: ${missing.size}/${planted.size} planted pairs MISSED: ${missing.take(5)}")

      // INCREMENTAL: two merges split by asset parity, then serve
      val state = graft.util.TmpDirs.scratch(s"graft_mediaprobe_${mod}_${n}_").toString
      val parity = pmod(xxhash64(col("name")), lit(2))
      val (_, tIngest) = time {
        IncrementalMedia.merge(spark, state, media.where(parity === 0),
          maxHamming = os.maxHamming, codec = os.codec)
        IncrementalMedia.merge(spark, state, media.where(parity === 1),
          maxHamming = os.maxHamming, codec = os.codec)
      }
      val (served, tServe) = time {
        IncrementalMedia.pairs(spark, state).collect()
          .map(r => (r.getString(0), r.getString(1))).toSet
      }
      val missingInc = planted.filterNot(p => served.contains((p.name1, p.name2)))
      require(missingInc.isEmpty,
        s"$mod@$n incremental: ${missingInc.size} planted pairs MISSED: ${missingInc.take(5)}")

      // DELETE 1% of base assets, serve again: tombstoned pairs leave
      val delNames = media.select("name").as[String].collect()
        .filter(!_.contains("_")).sorted.zipWithIndex
        .collect { case (nm, k) if k % 100 == 0 => nm }.toSeq
      val (_, tDelete) = time {
        IncrementalMedia.delete(spark, state, delNames.toDF("name"))
        IncrementalMedia.pairs(spark, state).count()
      }
      val afterDel = IncrementalMedia.pairs(spark, state).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val deadSet = delNames.toSet
      require(afterDel.forall(p => !deadSet.contains(p._1) && !deadSet.contains(p._2)),
        s"$mod@$n: tombstoned asset survived in the served pair table")
      val survivors = planted.filterNot(p =>
        deadSet.contains(p.name1) || deadSet.contains(p.name2))
      require(survivors.forall(p => afterDel.contains((p.name1, p.name2))),
        s"$mod@$n: delete dropped an unrelated planted pair")

      println(f"| $mod | $n | ${found.size} | $tOneShot%.2f | $tIngest%.2f | $tServe%.2f | $tDelete%.2f |")
      (mod, n, tOneShot, tIngest, tServe, tDelete)
    }

    println("\nratios (large/small per modality; data grows by the size factor):")
    println("| modality | one-shot | ingest | serve | delete+serve |")
    println("|---|---|---|---|---|")
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (mod, rs) =>
      val s = rs.minBy(_._2); val l = rs.maxBy(_._2)
      println(f"| $mod | ${l._3 / s._3}%.1f | ${l._4 / s._4}%.1f | ${l._5 / s._5}%.1f | ${l._6 / s._6}%.1f |")
    }
    spark.stop()
  }
}
