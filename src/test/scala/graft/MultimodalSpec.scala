package graft

import graft.ops.{MediaRecord, Multimodal, PpmImage}

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

  test("PPM decoder: header variants, comments, pixel extraction") {
    def ppm(header: String, px: Array[Byte]): Array[Byte] =
      header.getBytes("US-ASCII") ++ px
    val img = Multimodal.decodePpm(ppm("P6 2 1 255\n",
      Array[Byte](10, 20, 30, 40, 50, 60))).get
    assert(img.width == 2 && img.height == 1 && img.maxval == 255)
    assert(img.pixels sameElements Array[Byte](10, 20, 30, 40, 50, 60))
    // comments and mixed whitespace between header tokens
    val c = Multimodal.decodePpm(ppm("P6\n# comment\n1\t1\n# again\n255 ",
      Array[Byte](1, 2, 3))).get
    assert(c.width == 1 && c.height == 1)
  }

  test("PPM decoder rejects malformed payloads whole") {
    assert(Multimodal.decodePpm("P5 1 1 255 x".getBytes).isEmpty) // wrong magic
    assert(Multimodal.decodePpm("P6 1 1 65535 ".getBytes ++ Array[Byte](1, 2, 3)).isEmpty) // 2-byte maxval unsupported
    assert(Multimodal.decodePpm("P6 2 2 255\n".getBytes ++ Array[Byte](1, 2, 3)).isEmpty) // truncated
    assert(Multimodal.decodePpm("P6 0 1 255\n".getBytes).isEmpty) // zero dim
    assert(Multimodal.decodePpm(Array[Byte]()).isEmpty)
  }

  test("m4 decodes the checked-in fixtures; corrupt file yields a NULL row") {
    val rows = Multimodal.ppmDecode(spark).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("corrupt.ppm", "img0.ppm", "img1.ppm", "img2.ppm"))
    assert(rows.head.isNullAt(1) && rows.head.isNullAt(4))
    val img0 = rows(1)
    assert(img0.getInt(1) == 8 && img0.getInt(2) == 6 && img0.getLong(3) == 48)
  }

  test("m5: perceptual near-dup finds the planted re-encoded and retouched copies") {
    val pairs = Multimodal.ppmNearDup(spark)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(pairs == Seq(
      ("imga.ppm", "imga_bright.ppm", 3),
      ("imga.ppm", "imga_recode.ppm", 0),
      ("imga_bright.ppm", "imga_recode.ppm", 3)),
      s"planted near-dups not found exactly: $pairs")
    // corrupt.ppm decodes to nothing and is dropped whole; the 5 rasters sign
    assert(Multimodal.ppmNearSigs(spark).count() == 5)
  }

  test("d21: media split-ingest == m5's one-shot pairs; re-delivery and compaction invariant") {
    import org.apache.spark.sql.functions.{col, substring_index}
    val media = spark.read.format("binaryFile").load(Multimodal.ppmNearFixtureDir)
      .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
    def got(state: String) = graft.ops.IncrementalMedia.pairs(spark, state)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    val want = Multimodal.ppmNearDup(spark)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(want.nonEmpty)
    // split chosen so a planted pair crosses the batch boundary (imga and
    // imga_bright ingest before imga_recode arrives)
    val b1 = media.where(col("name") < "imga_r")
    val b2 = media.where(col("name") >= "imga_r")
    val state = graft.util.TmpDirs.scratch("graft_d21_spec_").toString
    graft.ops.IncrementalMedia.merge(spark, state, b1)
    graft.ops.IncrementalMedia.merge(spark, state, b2)
    assert(got(state) == want, "split-ingest diverged from the one-shot m5 pairs")
    // re-delivered batch: duplicate sigs and pairs collapse at read
    graft.ops.IncrementalMedia.merge(spark, state, b2)
    assert(got(state) == want, "re-delivered media batch changed the pair table")
    // compaction folds to one generation and changes nothing; a further
    // merge against compacted state stays exact (empty batch commits too)
    val v = graft.ops.IncrementalMedia.compact(spark, state)
    assert(graft.ops.IncrementalMedia.completeVersions(spark, state) == Seq(v))
    assert(got(state) == want)
    // decode happens at ingest only: sigs state never stores payloads
    val sigCols = spark.read.parquet(s"$state/v$v/sigs").columns.toSeq
    assert(sigCols == Seq("name", "frame_no", "sig"),
      s"sigs generation carries extra columns: $sigCols")

    // d33: tombstone a member — its incident pairs drop; survivors keep
    import spark.implicits._
    graft.ops.IncrementalMedia.delete(spark, state,
      Seq("imga_bright.ppm").toDF("name"))
    assert(got(state) == want.filterNot(p =>
      p._1 == "imga_bright.ppm" || p._2 == "imga_bright.ppm"),
      "tombstoned-incident pairs must drop from the served table")
    // compact purges physically and keeps serving the survivors
    val v2 = graft.ops.IncrementalMedia.compact(spark, state)
    val f = graft.ops.GenState.fs(spark, state)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$state/v$v2/tombstones")))
    assert(spark.read.parquet(s"$state/v$v2/sigs")
      .where(col("name") === "imga_bright.ppm").count() == 0,
      "purged sigs still hold the deleted name")
    assert(got(state) == want.filterNot(p =>
      p._1 == "imga_bright.ppm" || p._2 == "imga_bright.ppm"))
    // re-ingest after delete: live again (s9), full pair table restored
    graft.ops.IncrementalMedia.merge(spark, state,
      media.where(col("name") === "imga_bright.ppm"))
    assert(got(state) == want,
      "re-ingested media must rejoin its pairs after its tombstone")
  }

  test("m5 vs m3: exact hashing misses the re-encoded copy, dHash pins it at Hamming 0") {
    import org.apache.spark.sql.functions.{col, sha2}
    // the raster is identical but the BYTES differ (header comment), so
    // sha256 splits them — the gap m5 exists to close
    val hashes = spark.read.format("binaryFile").load(Multimodal.ppmNearFixtureDir)
      .where(col("path").contains("imga"))
      .select(sha2(col("content"), 256))
      .collect().map(_.getString(0)).toSet
    assert(hashes.size == 3, "all three imga encodings should hash distinctly")
    // while the decoded rasters of imga and imga_recode dHash identically
    val sigs = Multimodal.ppmNearSigs(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sigs("imga.ppm") == sigs("imga_recode.ppm"))
    assert(sigs("imga.ppm") != sigs("imgb.ppm"))
  }

  test("dHash is brightness-shift invariant and raster-size tolerant") {
    // uniform +25 shift with no clamping (all bytes < 200): zero bit flips
    val px = Array.tabulate(16 * 12 * 3)(i => ((i * 7) % 200).toByte)
    val img = PpmImage(16, 12, 255, px)
    val shifted = PpmImage(16, 12, 255, px.map(b => ((b & 0xff) + 25).toByte))
    assert(Multimodal.dHash64(img) == Multimodal.dHash64(shifted))
    // sub-grid rasters (smaller than the 9x8 sampling grid) still sign:
    // the non-empty-cell bound makes up-scaling deterministic
    val tiny = PpmImage(2, 2, 255, Array.tabulate(12)(i => (i * 19).toByte))
    assert(Multimodal.dHash64(tiny) == Multimodal.dHash64(tiny))
    // and a wide-but-short raster (the img2 16x4 shape) signs too
    val wide = PpmImage(16, 4, 255, Array.tabulate(16 * 4 * 3)(i => (i % 251).toByte))
    assert(Multimodal.dHash64(wide) == Multimodal.dHash64(wide))
  }

  test("m6: dihedral orbit is group-closed; orbit of a rotation equals the original's orbit") {
    val px = Array.tabulate(16 * 12 * 3)(i => ((i * 31 + 5) % 256).toByte)
    val img = PpmImage(16, 12, 255, px)
    def key(p: PpmImage) = (p.width, p.height, p.pixels.toSeq)
    val orb = Multimodal.dihedralOrbit(img).map(key).toSet
    assert(orb.size == 8)
    // closure: the orbit of any member is the same set — the property that
    // makes the orbit distance coordinate-convention independent (the
    // Python reference in tools/gen_ppmrot_fixtures.py may enumerate the
    // group differently and still agree)
    assert(Multimodal.dihedralOrbit(Multimodal.rotCW(img)).map(key).toSet == orb)
    assert(Multimodal.dihedralOrbit(Multimodal.flipH(img)).map(key).toSet == orb)
    // sanity on the primitives: rotCW has order 4, flipH order 2
    val r4 = Iterator.iterate(img)(Multimodal.rotCW).drop(4).next()
    assert(key(r4) == key(img))
    assert(key(Multimodal.flipH(Multimodal.flipH(img))) == key(img))
  }

  test("m6: rotation-robust near-dup equals the naive all-pairs orbit distance on the fixtures") {
    val got = Multimodal.ppmRotNearDup(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    // naive reference: decode every fixture locally, all-pairs min Hamming
    // of identity-vs-orbit in both directions, threshold 3 — no block
    // index, no Spark
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(Multimodal.ppmRotFixtureDir)
    val imgs: Seq[(String, PpmImage)] = {
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala.toSeq.map(p =>
        p.getFileName.toString ->
          Multimodal.decodePpm(java.nio.file.Files.readAllBytes(p)).get)
      finally s.close()
    }.sortBy(_._1)
    def orbitDist(a: PpmImage, b: PpmImage): Int = {
      def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
      val sa = Multimodal.dHash64(a); val sb = Multimodal.dHash64(b)
      math.min(
        Multimodal.dihedralOrbit(b).map(t => ham(sa, Multimodal.dHash64(t))).min,
        Multimodal.dihedralOrbit(a).map(t => ham(sb, Multimodal.dHash64(t))).min)
    }
    val want = for {
      i <- imgs.indices; j <- (i + 1) until imgs.size
      d = orbitDist(imgs(i)._2, imgs(j)._2) if d <= 3
    } yield (imgs(i)._1, imgs(j)._1, d)
    assert(got == want)
    // the m5 plain-dHash sweep misses the rotated copies m6 pins at 0
    assert(got.count(_._3 == 0) == 2)
  }

  test("typed round-trip: custom MediaRecord datasets work end-to-end") {
    val ds = Seq(MediaRecord(1L, "image", Array[Byte](1, 2, 3, -1), "raw")).toDS()
    val f = Multimodal.extractFeatures(ds).head()
    assert(f.n_bytes == 4)
    // byte 255 lands in the top bucket
    assert(f.features(7) == 0.25)
  }
}
