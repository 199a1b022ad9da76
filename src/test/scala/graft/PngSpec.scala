package graft

import graft.ops.{Multimodal, Png}

/** The standard-format image column (javax.imageio): decode round-trips,
  * whole-asset rejects, the m11/m12 fixture pins against the independent
  * pure-Python encoder + reference (tools/gen_png_fixtures.py), and the
  * d40/d41 state matrix through the codec-parametric chassis.
  */
class PngSpec extends SparkSpec {

  /** A PNG encoded BY THE JVM (ImageIO.write) from a raw raster — the
    * independent direction from the fixtures (Python-encoded, JVM-decoded).
    */
  private def jvmPng(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("PNG decode round-trips 8-bit RGB samples exactly (lossless contract)") {
    val got = Png.decodeImage(jvmPng(13, 7, (x, y) => ((x * 19) % 256, (y * 37) % 256, (x * y) % 256))).get
    assert(got.width == 13 && got.height == 7)
    for (y <- 0 until 7; x <- 0 until 13) {
      val i = (y * 13 + x) * 3
      assert((got.pixels(i) & 0xff) == (x * 19) % 256)
      assert((got.pixels(i + 1) & 0xff) == (y * 37) % 256)
      assert((got.pixels(i + 2) & 0xff) == (x * y) % 256)
    }
  }

  test("decoder rejects malformed payloads whole, never throws") {
    val good = jvmPng(16, 12, (x, y) => (x * 7 % 256, y * 11 % 256, 40))
    assert(Png.decodeImage(good).isDefined)
    assert(Png.decodeImage(Array[Byte]()).isEmpty)
    assert(Png.decodeImage("not a png at all".getBytes).isEmpty)
    // every truncation point either decodes whole or rejects whole
    val rnd = new java.util.Random(11)
    (0 until 150).foreach { _ =>
      Png.decodeImage(java.util.Arrays.copyOf(good, rnd.nextInt(good.length)))
      val junk = new Array[Byte](rnd.nextInt(300)); rnd.nextBytes(junk)
      Png.decodeImage(junk)
    }
    // bit-flip fuzz: Some or None, never a task-killing throw
    (0 until 200).foreach { _ =>
      val b = good.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = (rnd.nextInt(256) - 128).toByte
      }
      Png.decodeImage(b)
    }
  }

  test("a decompression bomb (huge declared dimensions) rejects whole, before allocation") {
    // a syntactically valid PNG whose IHDR declares a 50000×50000 raster
    // over a few hundred compressed bytes: the decoder must reject from the
    // HEADER dimensions — reader.read would try to allocate the ~10 GB
    // BufferedImage first and die with OutOfMemoryError (not NonFatal)
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(tag.getBytes("US-ASCII")); crc.update(body)
      java.nio.ByteBuffer.allocate(12 + body.length)
        .putInt(body.length).put(tag.getBytes("US-ASCII")).put(body)
        .putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(50000).putInt(50000)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    val d = new java.util.zip.Deflater()
    d.setInput(new Array[Byte](4096)); d.finish()
    val buf = new Array[Byte](8192)
    val idat = java.util.Arrays.copyOf(buf, d.deflate(buf))
    d.end()
    val bomb = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++ chunk("IEND", Array.empty[Byte])
    assert(bomb.length < 600, "the bomb must be small on the wire")
    assert(Png.decodeImage(bomb).isEmpty)
  }

  test("m11 decodes the checked-in fixtures to the Python reference's exact stats") {
    val rows = Png.imageDecode(spark).collect()
    assert(rows.length == 5)
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("corrupt.png").isNullAt(1), "truncated IDAT must reject whole")
    val a = byName("imga.png")
    // golden values from tools/gen_png_fixtures.py
    assert(a.getInt(1) == 16 && a.getInt(2) == 12 && a.getLong(3) == 192L &&
      a.getLong(4) == 23840L && a.getLong(5) == 24672L && a.getLong(6) == 24224L)
    assert(byName("imga_recode.png").getLong(4) == 23840L,
      "the re-encoded copy must decode to the identical raster")
    assert(byName("imga_bright.png").getLong(4) == 25455L)
    assert(byName("imgb.png").getLong(4) == 24544L)
  }

  private val goldenPairs = Seq(
    ("imga.png", "imga_bright.png", 2),
    ("imga.png", "imga_recode.png", 0),
    ("imga_bright.png", "imga_recode.png", 2))

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq

  test("m12: near-dup finds the re-encode and retouch at the reference's distances") {
    assert(collectPairs(Png.imageNearDup(spark)) == goldenPairs)
  }

  test("the JVM decode agrees with the independent dHash reference bit-for-bit") {
    import spark.implicits._
    // signatures of the fixture set, straight from the Python generator
    val sigs = Png.imageSigs(spark).as[(String, Long)].collect().toMap
    assert(sigs("imga.png") == -3876391848780649068L)
    assert(sigs("imga_bright.png") == 5346980188074125716L)
    assert(sigs("imga_recode.png") == -3876391848780649068L)
    assert(sigs("imgb.png") == -6605429111798369002L)
    assert(!sigs.contains("corrupt.png"))
  }

  private def fixtureMedia = {
    import org.apache.spark.sql.functions._
    spark.read.format("binaryFile").load(Png.pngFixtureDir)
      .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
  }

  test("d40: PNG split-ingest == m12's one-shot through the codec-parametric chassis") {
    import org.apache.spark.sql.functions.col
    val state = graft.util.TmpDirs.scratch("graft_d40_spec_").toString
    val media = fixtureMedia
    graft.ops.IncrementalMedia.merge(spark, state,
      media.where(!col("name").contains("_")), codec = "png-dhash")
    graft.ops.IncrementalMedia.merge(spark, state,
      media.where(col("name").contains("_")), codec = "png-dhash")
    assert(collectPairs(graft.ops.IncrementalMedia.pairs(spark, state)) == goldenPairs)
    // a ppm-dhash state dir refuses a png merge (signatures not comparable)
    val ex = intercept[IllegalArgumentException] {
      graft.ops.IncrementalMedia.merge(spark, state, media, codec = "ppm-dhash")
    }
    assert(ex.getMessage.contains("refusing a merge"))
  }

  test("d41: PNG tombstone shadows, facade purge erases, re-ingest revives") {
    import spark.implicits._
    val state = graft.util.TmpDirs.scratch("graft_d41_spec_").toString
    val media = fixtureMedia
    graft.ops.IncrementalMedia.merge(spark, state, media, codec = "png-dhash")
    graft.ops.Deletes.tombstone(spark, state, "png", Seq("imga.png").toDF("name"))
    assert(collectPairs(graft.ops.IncrementalMedia.pairs(spark, state)) ==
      goldenPairs.filterNot(p => p._1 == "imga.png" || p._2 == "imga.png"))
    graft.ops.Deletes.purge(spark, state, "png", Seq("imga.png").toDF("name"))
    val live = graft.ops.IncrementalMedia.completeVersions(spark, state)
    val sigNames = spark.read.parquet(live.map(v => s"$state/v$v/sigs"): _*)
      .select("name").as[String].collect().toSet
    assert(!sigNames.contains("imga.png"), "purge must erase the signature row")
    graft.ops.IncrementalMedia.merge(spark, state,
      media.where($"name" === "imga.png"), codec = "png-dhash")
    assert(collectPairs(graft.ops.IncrementalMedia.pairs(spark, state)) == goldenPairs)
  }

  test("q84: streamed PNG merges drain to m12's one-shot pairs") {
    val out = graft.streaming.DocumentsStream.runPngDedupAvailableNow(spark, sf0001)
    assert(collectPairs(out) == goldenPairs)
  }

  test("m15/m16/m17: BMP, GIF, and TIFF decode to the PNG rasters' exact stats; header truncations reject") {
    for ((dir, ext, n) <- Seq((Png.bmpFixtureDir, "bmp", 3), (Png.gifFixtureDir, "gif", 3),
        (Png.tiffFixtureDir, "tiff", 4))) {
      val rows = Png.imageDecode(spark, dir).collect()
      assert(rows.length == n, s"$ext fixture count")
      val byName = rows.map(r => r.getString(0) -> r).toMap
      assert(byName(s"corrupt.$ext").isNullAt(1), s"header-truncated $ext must reject whole")
      val a = byName(s"imga.$ext")
      assert(a.getInt(1) == 16 && a.getInt(2) == 12 && a.getLong(3) == 192L &&
        a.getLong(4) == 23840L && a.getLong(5) == 24672L && a.getLong(6) == 24224L,
        s"imga.$ext must decode to the m11 raster's stats")
      assert(byName(s"imgb.$ext").getLong(4) == 24544L)
    }
  }

  test("one raster through PNG, BMP, GIF, and TIFF containers decodes to identical pixels") {
    def bytesOf(dir: String, name: String) =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, name))
    val viaPng = Png.decodeImage(bytesOf(Png.pngFixtureDir, "imga.png")).get
    val viaBmp = Png.decodeImage(bytesOf(Png.bmpFixtureDir, "imga.bmp")).get
    val viaGif = Png.decodeImage(bytesOf(Png.gifFixtureDir, "imga.gif")).get
    val viaTiff = Png.decodeImage(bytesOf(Png.tiffFixtureDir, "imga.tiff")).get
    assert(viaPng.pixels.toSeq == viaBmp.pixels.toSeq, "BMP raster differs from PNG")
    assert(viaPng.pixels.toSeq == viaGif.pixels.toSeq, "GIF raster differs from PNG")
    assert(viaPng.pixels.toSeq == viaTiff.pixels.toSeq, "TIFF raster differs from PNG")
  }

  test("m14: JPEG fixtures decode by invariant — accepts, header dims, header-truncation rejects") {
    val rows = Png.jpegDecode(spark).collect()
    assert(rows.map(r => (r.getString(0), r.getBoolean(1))).toSeq == Seq(
      ("corrupt.jpg", false), ("imga.jpg", true),
      ("imga_requality.jpg", true), ("imgb.jpg", true)))
    assert(rows.filter(_.getBoolean(1)).forall(r => r.getInt(2) == 72 && r.getInt(3) == 56))
    assert(rows.find(_.getString(0) == "corrupt.jpg").get.isNullAt(2))
  }

  test("d42: jpeg-dhash split-ingest pairs exactly the re-quality encode with its source") {
    import org.apache.spark.sql.functions._
    val state = graft.util.TmpDirs.scratch("graft_d42_spec_").toString
    val media = spark.read.format("binaryFile").load(Png.jpgFixtureDir)
      .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
    graft.ops.IncrementalMedia.merge(spark, state,
      media.where(!col("name").contains("_")), codec = "jpeg-dhash")
    graft.ops.IncrementalMedia.merge(spark, state,
      media.where(col("name").contains("_")), codec = "jpeg-dhash")
    val pairs = graft.ops.IncrementalMedia.pairs(spark, state)
      .select("name1", "name2").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(pairs == Seq(("imga.jpg", "imga_requality.jpg")))
    // a jpeg-dhash state refuses a png-dhash merge: lossy-decoded signature
    // regimes must not silently mix (the _CONFIG codec pin)
    val ex = intercept[IllegalArgumentException] {
      graft.ops.IncrementalMedia.merge(spark, state, media, codec = "png-dhash")
    }
    assert(ex.getMessage.contains("refusing a merge"))
  }

  test("d43: tiff-dhash split-ingest pairs the brightness retouch with its source cross-batch") {
    import org.apache.spark.sql.functions._
    val state = graft.util.TmpDirs.scratch("graft_d43_spec_").toString
    val media = spark.read.format("binaryFile").load(Png.tiffFixtureDir)
      .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
    graft.ops.IncrementalMedia.merge(spark, state,
      media.where(!col("name").contains("_")), codec = "tiff-dhash")
    graft.ops.IncrementalMedia.merge(spark, state,
      media.where(col("name").contains("_")), codec = "tiff-dhash")
    val pairs = graft.ops.IncrementalMedia.pairs(spark, state).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    // same raster as imga_bright.png, so the golden pair + hamming carry
    // over from the PNG generator's reference (cross-batch, like d40)
    assert(pairs == Seq(("imga.tiff", "imga_bright.tiff", 2)))
  }

  test("JPEG decodes through the same ImageIO entry point, perceptually close to its source") {
    // JPEG is lossy (decoder-dependent rounding ⇒ not golden-oracle-able),
    // but it must DECODE through the same registry dispatch and land
    // perceptually near the raster it encoded — the real-corpus format.
    // A smooth gradient keeps block artifacts far from the dHash bits.
    def raster(x: Int, y: Int) = (40 + x * 4, 60 + y * 6, 80 + ((x + y) % 64))
    val img = new java.awt.image.BufferedImage(32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32) {
      val (r, g, b) = raster(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "no JPEG writer in this JVM")
    val viaJpeg = Png.decodeImage(bos.toByteArray)
    assert(viaJpeg.isDefined, "JPEG payload must decode through the registry")
    assert(viaJpeg.get.width == 32 && viaJpeg.get.height == 24)
    val lossless = Png.decodeImage(jvmPng(32, 24, raster)).get
    val dist = java.lang.Long.bitCount(
      Multimodal.dHash64(viaJpeg.get) ^ Multimodal.dHash64(lossless))
    assert(dist <= 3, s"JPEG round-trip drifted $dist dHash bits from the source raster")
  }

  test("m13: box resize is the identity at source size, deterministic, and golden at 9x7") {
    def raster(x: Int, y: Int) = ((x * 23) % 240, (y * 31) % 240, (x + y) % 240)
    val img = Png.decodeImage(jvmPng(16, 12, raster)).get
    // identity: every cell is exactly one pixel
    val same = Multimodal.boxResize(img, 16, 12)
    assert(same.pixels.toSeq == img.pixels.toSeq)
    // 1x1 is the global floor average
    val one = Multimodal.boxResize(img, 1, 1)
    val sums = img.pixels.grouped(3).foldLeft(Array(0L, 0L, 0L)) { (a, p) =>
      a(0) += p(0) & 0xff; a(1) += p(1) & 0xff; a(2) += p(2) & 0xff; a
    }
    assert((one.pixels(0) & 0xff) == (sums(0) / (16 * 12)).toInt)
    // upscale is defined too (non-empty cells repeat pixels): total mass
    // per output cell stays the source pixel value
    val up = Multimodal.boxResize(img, 32, 24)
    assert(up.width == 32 && up.height == 24)
    assert((up.pixels(0) & 0xff) == (img.pixels(0) & 0xff))
    // fixture goldens against the independent Python box_resize
    val rows = Png.imageResize(spark).collect()
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("corrupt.png").isNullAt(1))
    assert(byName("imga.png").getLong(3) == 7744L &&
      byName("imga.png").getString(6) ==
        "48457222e02640adf557625f2e8bec6da7d670db094b22b88edc9af0973e5220")
    assert(byName("imga_recode.png").getString(6) == byName("imga.png").getString(6),
      "a re-encoded copy must resize to the identical bytes")
    assert(byName("imga_bright.png").getString(6) != byName("imga.png").getString(6))
  }

  test("m12 vs exact hashing: sha256 misses every planted PNG copy") {
    import org.apache.spark.sql.functions._
    val dups = spark.read.format("binaryFile").load(Png.pngFixtureDir)
      .select(sha2(col("content"), 256).as("h"))
      .groupBy("h").count().where(col("count") > 1).count()
    assert(dups == 0, "no two fixtures share bytes — exact dedup finds nothing")
  }

  test("a JVM-encoded PNG and a dimension-equal PPM of the same raster hash identically") {
    // the dHash kernel must be FORMAT-INDEPENDENT: the same raster through
    // the PPM path and the ImageIO path lands on the same signature
    def raster(x: Int, y: Int) = ((x * 31 + y * 7) % 256, (x * 13) % 256, (y * 17) % 256)
    val viaPng = Png.decodeImage(jvmPng(20, 16, raster)).get
    val ppmBody = new java.io.ByteArrayOutputStream()
    ppmBody.write(s"P6\n20 16\n255\n".getBytes("US-ASCII"))
    for (y <- 0 until 16; x <- 0 until 20) {
      val (r, g, b) = raster(x, y)
      ppmBody.write(r); ppmBody.write(g); ppmBody.write(b)
    }
    val viaPpm = Multimodal.decodePpm(ppmBody.toByteArray).get
    assert(Multimodal.dHash64(viaPng) == Multimodal.dHash64(viaPpm))
  }
}
