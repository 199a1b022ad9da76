package graft

import graft.ops.Video

/** The video column of the multimodal matrix: the Y4M decoder's header
  * walk and reject paths, the 4-frame signature's invariances (re-wrap,
  * uniform luma lift), and the m9/m10 fixture pins against the
  * independent Python reference (tools/gen_y4m_fixtures.py).
  */
class VideoSpec extends SparkSpec {

  private def y4m(w: Int, h: Int, frames: Seq[Array[Byte]],
      header: String = "", frameParam: String = ""): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg$header\n".getBytes("US-ASCII"))
    frames.foreach { luma =>
      bos.write(s"FRAME$frameParam\n".getBytes("US-ASCII"))
      bos.write(luma)
      bos.write(new Array[Byte]((w / 2) * (h / 2) * 2)) // chroma planes
    }
    bos.toByteArray
  }

  private def grad(w: Int, h: Int, shift: Int): Array[Byte] =
    Array.tabulate(w * h)(i => (((i % w) * 5 + (i / w) * 3 + shift) % 256).toByte)

  test("Y4M decoder: header params, frame params, luma extraction, fps") {
    val f0 = grad(16, 8, 0); val f1 = grad(16, 8, 40)
    val v = Video.decodeY4m(y4m(16, 8, Seq(f0, f1))).get
    assert(v.width == 16 && v.height == 8 && v.fpsNum == 25 && v.fpsDen == 1)
    assert(v.lumaFrames.length == 2 && v.lumaFrames(0).toSeq == f0.toSeq)
    // extra header and FRAME parameters are walked over, frames identical
    val rewrap = Video.decodeY4m(
      y4m(16, 8, Seq(f0, f1), header = " XREWRAP", frameParam = " Xq=1")).get
    assert(rewrap.lumaFrames.map(_.toSeq).toSeq == v.lumaFrames.map(_.toSeq).toSeq)
  }

  test("Y4M decoder rejects malformed payloads whole") {
    val good = y4m(16, 8, Seq(grad(16, 8, 0), grad(16, 8, 9)))
    assert(Video.decodeY4m(good).isDefined)
    assert(Video.decodeY4m(Array[Byte]()).isEmpty)
    assert(Video.decodeY4m("MPEG4 W16 H8\n".getBytes).isEmpty)
    // truncated mid-frame
    assert(Video.decodeY4m(java.util.Arrays.copyOf(good, good.length - 5)).isEmpty)
    // zero frames, missing dims, non-420 chroma, bad FRAME magic
    assert(Video.decodeY4m("YUV4MPEG2 W16 H8 F25:1\n".getBytes).isEmpty)
    val noDim = "YUV4MPEG2 H8 F25:1\nFRAME\n".getBytes
    assert(Video.decodeY4m(noDim).isEmpty)
    val badChroma = new String(good, "ISO-8859-1").replace("C420jpeg", "C444zzzz")
    assert(Video.decodeY4m(badChroma.getBytes("ISO-8859-1")).isEmpty)
    val badFrame = new String(good, "ISO-8859-1").replace("FRAME", "FRUME")
    assert(Video.decodeY4m(badFrame.getBytes("ISO-8859-1")).isEmpty)
  }

  test("signature: re-wrap and uniform luma lift flip no bits") {
    val frames = (0 until 8).map(i => grad(32, 16, i * 17))
    val base = Video.decodeY4m(y4m(32, 16, frames)).get
    val lifted = Video.decodeY4m(y4m(32, 16,
      frames.map(_.map(b => math.min(255, (b & 0xff) + 8).toByte)))).get
    assert(Video.signature(base).toSeq == Video.signature(lifted).toSeq,
      "a uniform luma lift must flip no dHash bits on any sampled frame")
  }

  test("m9 decodes the checked-in fixtures; corrupt file yields a NULL row") {
    val rows = Video.y4mDecode(spark).collect()
    assert(rows.length == 6)
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("corrupt.y4m").isNullAt(1), "truncated fixture must reject whole")
    val a = byName("vida.y4m")
    // golden values from the independent reference decoder
    assert(a.getInt(1) == 48 && a.getInt(2) == 32 && a.getInt(3) == 12 &&
      a.getLong(4) == 2355144L)
    assert(byName("vida_recode.y4m").getLong(4) == 2355144L,
      "the re-wrapped copy must decode to identical frames")
  }

  test("m10: near-dup finds the re-wrap, lift, and retouch copies at golden distances") {
    val pairs = Video.videoNearDup(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(pairs == Seq(
      ("vida.y4m", "vida_bright.y4m", 0),
      ("vida.y4m", "vida_recode.y4m", 0),
      ("vida.y4m", "vida_retouch.y4m", 2),
      ("vida_bright.y4m", "vida_recode.y4m", 0),
      ("vida_bright.y4m", "vida_retouch.y4m", 2),
      ("vida_recode.y4m", "vida_retouch.y4m", 2)))
  }

  test("fuzz: mutated/truncated/garbage payloads decode to Some or None, never throw") {
    val rnd = new java.util.Random(7)
    val good = y4m(16, 8, Seq(grad(16, 8, 0), grad(16, 8, 77)))
    var decoded = 0
    (0 until 300).foreach { _ =>
      val b = good.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = (rnd.nextInt(256) - 128).toByte
      }
      if (Video.decodeY4m(b).isDefined) decoded += 1 // must not throw
    }
    (0 until 100).foreach { _ =>
      Video.decodeY4m(java.util.Arrays.copyOf(good, rnd.nextInt(good.length)))
      val junk = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(junk)
      Video.decodeY4m(junk)
    }
    assert(decoded > 0 && decoded < 300, "fuzz must exercise both outcomes")
  }

  private def fixtureMedia = {
    import org.apache.spark.sql.functions._
    spark.read.format("binaryFile").load(Video.y4mFixtureDir)
      .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
  }

  private def goldenPairs = Seq(
    ("vida.y4m", "vida_bright.y4m", 0),
    ("vida.y4m", "vida_recode.y4m", 0),
    ("vida.y4m", "vida_retouch.y4m", 2),
    ("vida_bright.y4m", "vida_recode.y4m", 0),
    ("vida_bright.y4m", "vida_retouch.y4m", 2),
    ("vida_recode.y4m", "vida_retouch.y4m", 2))

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq

  test("d38: video split-ingest == m10's one-shot through the multi-row-sig chassis") {
    import org.apache.spark.sql.functions.col
    val state = graft.util.TmpDirs.scratch("graft_d38_spec_").toString
    val media = fixtureMedia
    graft.ops.IncrementalMedia.merge(spark, state,
      media.where(!col("name").contains("_")), maxHamming = 6, codec = "y4m-framehash")
    graft.ops.IncrementalMedia.merge(spark, state,
      media.where(col("name").contains("_")), maxHamming = 6, codec = "y4m-framehash")
    assert(collectPairs(graft.ops.IncrementalMedia.pairs(spark, state)) == goldenPairs)
    // the state stores 4 signature rows per decodable asset, never frames
    val live = graft.ops.IncrementalMedia.completeVersions(spark, state)
    val sigRows = spark.read.parquet(live.map(v => s"$state/v$v/sigs"): _*)
    assert(sigRows.count() == 5 * 4, "expected 4 signature rows per decoded video")
  }

  test("d39: video tombstone shadows, facade purge erases, re-ingest revives") {
    import spark.implicits._
    val state = graft.util.TmpDirs.scratch("graft_d39_spec_").toString
    val media = fixtureMedia
    graft.ops.IncrementalMedia.merge(spark, state, media,
      maxHamming = 6, codec = "y4m-framehash")
    graft.ops.Deletes.tombstone(spark, state, "video", Seq("vida.y4m").toDF("name"))
    assert(collectPairs(graft.ops.IncrementalMedia.pairs(spark, state)) ==
      goldenPairs.filterNot(p => p._1 == "vida.y4m" || p._2 == "vida.y4m"))
    graft.ops.Deletes.purge(spark, state, "video", Seq("vida.y4m").toDF("name"))
    val live = graft.ops.IncrementalMedia.completeVersions(spark, state)
    val sigNames = spark.read.parquet(live.map(v => s"$state/v$v/sigs"): _*)
      .select("name").as[String].collect().toSet
    assert(!sigNames.contains("vida.y4m"), "purge must erase all 4 signature rows")
    graft.ops.IncrementalMedia.merge(spark, state,
      media.where($"name" === "vida.y4m"), maxHamming = 6, codec = "y4m-framehash")
    assert(collectPairs(graft.ops.IncrementalMedia.pairs(spark, state)) == goldenPairs)
  }

  test("q83: streamed video merges drain to m10's one-shot pairs") {
    val out = graft.streaming.DocumentsStream.runVideoDedupAvailableNow(spark, sf0001)
    assert(collectPairs(out) == goldenPairs)
  }

  test("m10 vs exact hashing: sha256 misses every planted video copy") {
    import org.apache.spark.sql.functions._
    val dups = spark.read.format("binaryFile").load(Video.y4mFixtureDir)
      .select(sha2(col("content"), 256).as("h"))
      .groupBy("h").count().where(col("count") > 1).count()
    assert(dups == 0, "no two fixtures share bytes — exact dedup finds nothing")
  }
}
