package graft

import graft.ops.{MediaRecord, Multimodal}

/** Multimodal plumbing: typed binary Dataset, partition-parallel feature
  * extraction, frame sampling. (Cross-engine feature equality is covered
  * by the m1_media_features CORRECTNESS entry.)
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.mediaFromDocuments(spark, sf0001).cache()

  test("media table: one binary record per document with typed metadata") {
    assert(media.count() == 500)
    val m = media.head()
    assert(m.kind == "text" && m.format == "utf-8" && m.payload.nonEmpty)
  }

  test("byte histogram is a distribution (sums to 1) with 8 buckets") {
    val f = Multimodal.extractFeatures(media).head()
    assert(f.features.length == 8)
    assert(math.abs(f.features.sum - 1.0) < 1e-9)
    assert(f.n_bytes > 0)
  }

  test("feature extraction is shuffle-free and covers every record") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == 500)
    assert(!feats.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("frame sampling yields n evenly-spaced in-bounds byte ranges") {
    val frames = Multimodal.frameSample(media, n = 4, frameBytes = 16).collect()
    assert(frames.length == 2000)
    assert(frames.forall(f => f.frame.length <= 16 && f.offset >= 0))
    val byDoc = frames.groupBy(_.media_id)
    assert(byDoc.values.forall(_.map(_.frame_no).sorted.sameElements(0 until 4)))
  }

  test("frame sample flat query: text frames equal substring extraction") {
    import org.apache.spark.sql.functions._
    val flat = Multimodal.frameSampleFlat(spark, sf0001).collect()
    assert(flat.length == 2000) // 500 docs x 4 frames
    // ASCII payloads: the decoded frame must equal the char-wise substring
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(flat.forall { r =>
      val t = docs(r.getLong(0)); val off = r.getInt(2)
      r.getString(3) == t.substring(off, math.min(off + 16, t.length))
    })
  }

  test("decode stub is deterministic and shaped like pixels") {
    val px = Multimodal.decodePixelsStub("abc".getBytes("UTF-8"))
    assert(px.length == 64)
    assert(px sameElements Multimodal.decodePixelsStub("abc".getBytes("UTF-8")))
    assert(px.forall(v => v >= 0 && v <= 255))
  }

  test("typed round-trip: custom MediaRecord datasets work end-to-end") {
    val ds = Seq(MediaRecord(1L, "image", Array[Byte](1, 2, 3, -1), "raw")).toDS()
    val f = Multimodal.extractFeatures(ds).head()
    assert(f.n_bytes == 4)
    // byte 255 lands in the top bucket
    assert(f.features(7) == 0.25)
  }
}
