package graft

import org.apache.spark.sql.functions._

import graft.ops.{IncrementalRotMedia, Multimodal}

/** d24: the orbit row of the incremental media matrix — split-ingest must
  * equal m6's one-shot pair table for any split, compaction must preserve
  * it, and re-delivery must not change it.
  */
class IncrementalRotMediaSpec extends SparkSpec {

  private def media = spark.read.format("binaryFile")
    .load(Multimodal.ppmRotFixtureDir)
    .select(substring_index(col("path"), "/", -1).as("name"), col("content"))

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.select("name1", "name2", "hamming")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  private lazy val oneShot = sorted(Multimodal.ppmRotNearDup(spark))

  test("split-ingest == one-shot m6 pairs, originals-first and alphabetical splits") {
    // originals first: every golden pair resolves cross-batch or new-new
    val s1 = graft.util.TmpDirs.scratch("graft_d24_t1_").toString
    IncrementalRotMedia.merge(spark, s1, media.where(!col("name").contains("_")))
    IncrementalRotMedia.merge(spark, s1, media.where(col("name").contains("_")))
    assert(sorted(IncrementalRotMedia.pairs(spark, s1)) == oneShot)
    // a different split (alphabetical halves)
    val s2 = graft.util.TmpDirs.scratch("graft_d24_t2_").toString
    IncrementalRotMedia.merge(spark, s2, media.where(col("name") < "imga_rot"))
    IncrementalRotMedia.merge(spark, s2, media.where(col("name") >= "imga_rot"))
    assert(sorted(IncrementalRotMedia.pairs(spark, s2)) == oneShot)
    // and a one-batch ingest degenerates to the one-shot
    val s3 = graft.util.TmpDirs.scratch("graft_d24_t3_").toString
    IncrementalRotMedia.merge(spark, s3, media)
    assert(sorted(IncrementalRotMedia.pairs(spark, s3)) == oneShot)
  }

  test("compaction folds to one generation, preserves pairs; later merges keep working") {
    val state = graft.util.TmpDirs.scratch("graft_d24_c_").toString
    IncrementalRotMedia.merge(spark, state, media.where(col("name") < "imgb"))
    val vc = IncrementalRotMedia.compact(spark, state)
    assert(IncrementalRotMedia.completeVersions(spark, state) == Seq(vc))
    IncrementalRotMedia.merge(spark, state, media.where(col("name") >= "imgb"))
    assert(sorted(IncrementalRotMedia.pairs(spark, state)) == oneShot)
  }

  test("re-delivered batch (no key) leaves the pair table unchanged") {
    val state = graft.util.TmpDirs.scratch("graft_d24_r_").toString
    val b1 = media.where(col("name").contains("_"))
    IncrementalRotMedia.merge(spark, state, media.where(!col("name").contains("_")))
    IncrementalRotMedia.merge(spark, state, b1)
    IncrementalRotMedia.merge(spark, state, b1)
    assert(sorted(IncrementalRotMedia.pairs(spark, state)) == oneShot)
  }
}
