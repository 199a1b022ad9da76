package graft

import org.apache.spark.sql.functions._

import graft.ops.{GenState, IncrementalCard, IncrementalClassifier,
  IncrementalSubstring, IncrementalView}

/** Pointer-publish smoke across the STRUCTURALLY DISTINCT family chassis
  * — [[PointerPublishSpec]] proves the protocol itself (exact + MinHash);
  * this suite drives the conversion slips only pointer mode can expose in
  * the other shapes, each on [[NoRenameFs]] so any protocol rename throws:
  *
  *   - the 5-table count-distinct card (docs/hashes/langs/sketches +
  *     partials commit — the widest per-generation table fan);
  *   - the 4-table substring chassis (anchors/docs/occ/hits), whose merge
  *     READS ITS OWN in-flight tables (the occ fold and the anchor probe
  *     must resolve through the claim token's nonce before the pointer
  *     exists);
  *   - the additive view with RETRACTIONS and the change feed (negated
  *     partials through the same fenced commit);
  *   - the classifier (model counts + per-doc sidecar, subtraction-style
  *     deletes).
  *
  * Every scenario asserts VALUE PARITY against the same operations under
  * the default rename mode on the plain local FS — pointer publish is a
  * storage-layout dial, never a semantics dial.
  */
class PointerPublishFamiliesSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)
  private def events = graft.sources.Tables.events(spark, sf0001)

  private def registerNoRename(): Unit =
    spark.sparkContext.hadoopConfiguration.setClass("fs.norename.impl",
      classOf[NoRenameFs], classOf[org.apache.hadoop.fs.FileSystem])

  private def withPointerMode[T](body: => T): T = {
    val before = GenState.publishMode
    GenState.publishMode = GenState.PointerPublish
    try body finally GenState.publishMode = before
  }

  private def noRenameState(prefix: String): String = {
    registerNoRename()
    s"norename://${graft.util.TmpDirs.scratch(prefix)}"
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("count-distinct card (5 tables) on a rename-less store: merge/delete/compact parity with rename mode") {
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val dead = docs.where(col("doc_id") < 20).select(col("doc_id"))
    def drive(state: String): Seq[Seq[String]] = {
      IncrementalCard.merge(spark, state, b1, Some("b0"))
      IncrementalCard.merge(spark, state, b2, Some("b1"))
      val served = rows(IncrementalCard.serve(spark, state))
      IncrementalCard.delete(spark, state, dead)
      val afterDel = rows(IncrementalCard.serve(spark, state))
      IncrementalCard.compact(spark, state)
      Seq(served, afterDel, rows(IncrementalCard.serve(spark, state)),
        rows(IncrementalCard.serveApprox(spark, state)))
    }
    val got = withPointerMode { drive(noRenameState("graft_ptrfam_card_")) }
    val want = drive(graft.util.TmpDirs.scratch("graft_ptrfam_card_ref_").toString)
    assert(got == want, "the card family must serve identically under pointer publish")
  }

  test("substring chassis (4 tables, own-generation reads) on a rename-less store: span parity with rename mode") {
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    def drive(state: String): Seq[Seq[String]] = {
      IncrementalSubstring.merge(spark, state, b1, Some("b0"))
      IncrementalSubstring.merge(spark, state, b2, Some("b1"))
      val served = rows(IncrementalSubstring.spans(spark, state))
      IncrementalSubstring.compact(spark, state)
      Seq(served, rows(IncrementalSubstring.spans(spark, state)))
    }
    val got = withPointerMode { drive(noRenameState("graft_ptrfam_sub_")) }
    val want = drive(graft.util.TmpDirs.scratch("graft_ptrfam_sub_ref_").toString)
    assert(got == want, "the substring family must serve identically under pointer publish")

    // MIXED-MODE regression: a rename-committed predecessor has no
    // pointer, and the substring merge passes its claim token blanketly
    // across its own in-flight generation AND the predecessors (the occ
    // fold) — tablePath must defer to the predecessor's existing plain
    // path instead of mis-resolving it to a never-written nonce dir
    val mixed = graft.util.TmpDirs.scratch("graft_ptrfam_sub_mixed_").toString
    IncrementalSubstring.merge(spark, mixed, b1, Some("b0")) // rename mode
    withPointerMode {
      IncrementalSubstring.merge(spark, mixed, b2, Some("b1")) // pointer mode
    }
    assert(rows(IncrementalSubstring.spans(spark, mixed)) == want.head,
      "a mixed-mode substring store must serve the same spans")
  }

  test("incremental view with retractions and change feed on a rename-less store: parity with rename mode") {
    val h1 = events.where(pmod(col("event_id"), lit(2)) === 0)
    val h2 = events.where(pmod(col("event_id"), lit(2)) === 1)
    val bad = h1.limit(50)
    def drive(state: String): Seq[Seq[String]] = {
      val v0 = IncrementalView.merge(spark, state, h1, Some("w0"))
      val v1 = IncrementalView.merge(spark, state, h2, Some("w1"))
      val served = rows(IncrementalView.serve(spark, state))
      val feed = rows(IncrementalView.changeFeed(spark, state, v0, v1))
      IncrementalView.retract(spark, state, bad, Some("fix"))
      val afterRetract = rows(IncrementalView.serve(spark, state))
      IncrementalView.compact(spark, state)
      Seq(served, feed, afterRetract, rows(IncrementalView.serve(spark, state)))
    }
    val got = withPointerMode { drive(noRenameState("graft_ptrfam_view_")) }
    val want = drive(graft.util.TmpDirs.scratch("graft_ptrfam_view_ref_").toString)
    assert(got == want, "the view family must serve identically under pointer publish")
  }

  test("embedding family (SRP buckets, own-generation vec reads) on a rename-less store: cluster parity with rename mode") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val b1 = vecs.where(pmod(col("vec_id"), lit(2)) === 0)
    val b2 = vecs.where(pmod(col("vec_id"), lit(2)) === 1)
    def drive(state: String): Seq[Seq[String]] = {
      graft.ops.IncrementalEmbedding.merge(spark, state, b1, batchKey = Some("b0"))
      graft.ops.IncrementalEmbedding.merge(spark, state, b2, batchKey = Some("b1"))
      val served = rows(graft.ops.IncrementalEmbedding.clusters(spark, state))
      graft.ops.IncrementalEmbedding.compact(spark, state)
      Seq(served, rows(graft.ops.IncrementalEmbedding.clusters(spark, state)))
    }
    val got = withPointerMode { drive(noRenameState("graft_ptrfam_emb_")) }
    val want = drive(graft.util.TmpDirs.scratch("graft_ptrfam_emb_ref_").toString)
    assert(got == want, "the embedding family must serve identically under pointer publish")
  }

  test("media family (binary codec, own-generation sig reads) on a rename-less store: pair parity with rename mode") {
    val media = spark.read.format("binaryFile")
      .load(graft.ops.Png.pngFixtureDir)
      .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
    val originals = media.where(!col("name").contains("_"))
    val variants = media.where(col("name").contains("_"))
    def drive(state: String): Seq[Seq[String]] = {
      graft.ops.IncrementalMedia.merge(spark, state, originals, codec = "png-dhash")
      graft.ops.IncrementalMedia.merge(spark, state, variants, codec = "png-dhash")
      val served = rows(graft.ops.IncrementalMedia.pairs(spark, state))
      graft.ops.IncrementalMedia.compact(spark, state)
      Seq(served, rows(graft.ops.IncrementalMedia.pairs(spark, state)))
    }
    val got = withPointerMode { drive(noRenameState("graft_ptrfam_media_")) }
    val want = drive(graft.util.TmpDirs.scratch("graft_ptrfam_media_ref_").toString)
    assert(got == want, "the media family must serve identically under pointer publish")
  }

  test("classifier (sidecar subtraction deletes) on a rename-less store: model parity with rename mode") {
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val dead = docs.where(col("doc_id") < 30).select(col("doc_id"))
    def drive(state: String): Seq[Seq[String]] = {
      IncrementalClassifier.merge(spark, state, b1, Some("b0"))
      IncrementalClassifier.merge(spark, state, b2, Some("b1"))
      val model = rows(IncrementalClassifier.modelCounts(spark, state))
      IncrementalClassifier.delete(spark, state, dead)
      val afterDel = rows(IncrementalClassifier.modelCounts(spark, state))
      IncrementalClassifier.compact(spark, state)
      Seq(model, afterDel, rows(IncrementalClassifier.modelCounts(spark, state)))
    }
    val got = withPointerMode { drive(noRenameState("graft_ptrfam_cls_")) }
    val want = drive(graft.util.TmpDirs.scratch("graft_ptrfam_cls_ref_").toString)
    assert(got == want, "the classifier family must serve identically under pointer publish")
  }
}
