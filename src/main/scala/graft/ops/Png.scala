package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standard-format images: PNG (m11), JPEG (m14), BMP (m15), GIF (m16),
  * TIFF (m17) — all decoded through `javax.imageio`, the JDK's built-in
  * image codec registry (java.desktop module: zero new dependency,
  * pure-JVM, headless-safe), each format exercised by its own fixture set
  * and oracle.
  * This closes the gap the PPM modality left open: real corpora store
  * PNG/JPEG, not P6 rasters. Everything downstream is the EXISTING
  * perceptual chassis — [[Multimodal.dHash64]] over the decoded raster, the
  * d17 blocked-Hamming candidate geometry, and the codec-parametric
  * [[IncrementalMedia]] state machine (the "png-dhash"/"jpeg-dhash"
  * registry entries) — so the full mutation matrix (incremental ingest,
  * streaming drain, tombstone delete, purge-at-compact) costs a new format
  * nothing.
  *
  * Decode contract (the m4/m7/m9 rule): a payload that fails to decode —
  * bad signature, no registered reader, truncated pixel data, lying header
  * dimensions — is rejected WHOLE, never half-read.
  *
  * Oracle regimes by format: PNG, BMP, GIF, and TIFF are LOSSLESS here
  * (the GIF fixture rasters palettize exactly; the TIFF is baseline
  * uncompressed RGB), so their goldens come from independent pure-Python
  * encoders (tools/gen_png_fixtures.py, tools/gen_bmp_gif_fixtures.py,
  * tools/gen_tiff_fixtures.py) and the JVM decode must agree to the bit. JPEG is lossy with decoder-dependent rounding — NOT
  * golden-oracle-able — so m14/d42 pin decode INVARIANTS (accepts, header
  * dimensions, near-dup geometry) whose margins are verified at fixture
  * generation (graft.tools.GenJpegFixtures).
  *
  * Scale shape, unchanged from m4/m5: blobs never shuffle (binaryFile
  * splits decode where they land; only (name, 64-bit sig) rows move);
  * decode streams are memory-cached per call — executor-local tmp-file
  * churn per decode would be an I/O tax at corpus scale, and the JVM-global
  * `ImageIO.setUseCache` default is left untouched.
  */
object Png {

  /** Raster-size cap: an asset whose DECLARED dimensions exceed this is
    * rejected whole. Checked from the header BEFORE any pixel allocation
    * (see [[decodeImage]]) — the cap exists precisely for payloads whose
    * headers lie big.
    */
  private val maxPixels = 100L << 20

  /** REAL standard-format decoder: whatever reader the ImageIO registry
    * matches to the payload's signature (PNG, JPEG, GIF, BMP — the JDK's
    * built-in set). Decoded to the engine's interleaved-RGB raster
    * ([[PpmImage]]) so every existing kernel (dHash, dihedral orbit)
    * applies untouched. None on any failure — corrupt assets reject whole.
    *
    * Two hardening points this decode path carries that a bare
    * `ImageIO.read(stream)` does not:
    *
    *   - **the dimension check runs on the HEADER, before the decode**:
    *     `reader.getWidth/getHeight(0)` parse only header metadata, so a
    *     decompression bomb declaring a huge raster (a 50k×50k IHDR over a
    *     few hundred compressed bytes) is rejected before the reader
    *     allocates anything — `reader.read(0)` would otherwise try to
    *     materialize the full BufferedImage and die with OutOfMemoryError,
    *     which NonFatal deliberately does NOT catch, turning the documented
    *     whole-asset reject into an executor death;
    *   - **stream-scoped memory caching** (`MemoryCacheImageInputStream`):
    *     no per-decode tmp-file churn on the executor AND no mutation of
    *     the process-global `ImageIO.setUseCache` default, which user code
    *     co-resident in the JVM may rely on.
    */
  def decodeImage(payload: Array[Byte]): Option[PpmImage] = {
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None // no registered codec claims the signature
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
          val img = reader.read(0)
          if (img == null) return None
          // one bulk sRGB grab, not per-pixel getRGB calls; PNG without color
          // -management chunks round-trips 8-bit samples exactly
          val rgb = img.getRGB(0, 0, w, h, null, 0, w)
          val px = new Array[Byte](w * h * 3)
          var i = 0
          while (i < rgb.length) {
            val v = rgb(i)
            px(3 * i) = ((v >> 16) & 0xff).toByte
            px(3 * i + 1) = ((v >> 8) & 0xff).toByte
            px(3 * i + 2) = (v & 0xff).toByte
            i += 1
          }
          Some(PpmImage(w, h, 255, px))
        } finally reader.dispose()
      } finally iis.close()
    } catch {
      // a truncated IDAT / malformed chunk / lying header throws from inside
      // the reader; the contract is a whole-asset reject, not a task failure
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Engine-shipped classpath fixtures, extracted once per JVM (the
    * [[Multimodal.ppmFixtureDir]] pattern).
    */
  private def extractFixtures(sub: String, names: Seq[String]): String = {
    val dir = graft.util.TmpDirs.scratch(s"graft_${sub}_fixtures_")
    names.foreach { nm =>
      val in = getClass.getResourceAsStream(s"/$sub/$nm")
      require(in != null, s"classpath resource /$sub/$nm missing from the graft jar")
      try java.nio.file.Files.copy(in, dir.resolve(nm)) finally in.close()
    }
    dir.toString
  }

  /** Checked-in PNG fixtures (tools/gen_png_fixtures.py): an image, its
    * re-encoded copy (tEXt chunk + different deflate level — different
    * bytes, identical raster), a brightness-lifted two-pixel retouch, an
    * unrelated image, and a mid-IDAT truncation.
    */
  lazy val pngFixtureDir: String = extractFixtures("png",
    Seq("corrupt.png", "imga.png", "imga_bright.png", "imga_recode.png", "imgb.png"))

  /** Checked-in BMP and GIF fixtures (tools/gen_bmp_gif_fixtures.py): the
    * PNG fixtures' rasters re-containered. Both formats are lossless here
    * (BMP is raw 24-bit; the rasters palettize exactly at ≤192 distinct
    * colors), so the m15/m16 golden stats EQUAL m11's for the same image —
    * pinning that one raster through three container formats decodes
    * identically. corrupt.* are header truncations: unambiguous
    * whole-asset rejects.
    */
  lazy val bmpFixtureDir: String = extractFixtures("bmp",
    Seq("corrupt.bmp", "imga.bmp", "imgb.bmp"))

  lazy val gifFixtureDir: String = extractFixtures("gif",
    Seq("corrupt.gif", "imga.gif", "imgb.gif"))

  /** Checked-in TIFF fixtures (tools/gen_tiff_fixtures.py): the same
    * rasters again as baseline UNCOMPRESSED RGB TIFF (the JDK registry's
    * TIFF plugin has shipped since Java 9) — lossless by construction, so
    * the m17 goldens equal m11/m15/m16's for the same image: one raster
    * pinned through FOUR container formats. Scanned-document corpora lead
    * with TIFF; this closes the zero-dependency registry-format matrix.
    * corrupt.tiff is an IFD truncation: a whole-asset reject.
    */
  lazy val tiffFixtureDir: String = extractFixtures("tiff",
    Seq("corrupt.tiff", "imga.tiff", "imga_bright.tiff", "imgb.tiff"))

  /** Checked-in JPEG fixtures (graft.tools.GenJpegFixtures): two encodes of
    * the same smooth source raster at different qualities (byte-different,
    * perceptually identical), an unrelated image, and a header truncation.
    * JPEG is lossy with decoder-dependent rounding, so these carry no golden
    * raster — the m14/d42 oracles pin INVARIANTS (decode accepts, header
    * dimensions, near-dup geometry), verified with wide margins at fixture
    * generation time.
    */
  private val jpgFixtureNames = Seq("corrupt.jpg", "imga.jpg",
    "imga_requality.jpg", "imgb.jpg")

  lazy val jpgFixtureDir: String = extractFixtures("jpg", jpgFixtureNames)

  /** m14: decode JPEG assets partition-parallel, emitting the lossy-safe
    * decode INVARIANTS per asset — accepted?, header width/height — rather
    * than m11's exact channel sums (pixel values are decoder-rounded, so an
    * exact-stats oracle would pin one JDK's IDCT, not the contract). The
    * whole-asset reject rule is pinned by the header-truncated fixture; note
    * the JDK's JPEG reader TOLERATES scan-data (tail) truncation — it decodes
    * the delivered MCUs and fills the rest — so the reject contract is about
    * undecodable payloads, not byte-complete ones.
    */
  def jpegDecode(spark: SparkSession, mediaDir: String = jpgFixtureDir): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(mediaDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        decodeImage(bytes) match {
          case Some(img) => (name, true, Some(img.width), Some(img.height))
          case None => (name, false, None, None)
        }
      })
      .toDF("name", "ok", "w", "h")
      .orderBy(col("name"))
  }

  /** m11: decode standard-format image bytes partition-parallel, reduce
    * each to exact integer stats (the m4 shape — PNG is lossless, so the
    * per-channel sums are bit-reproducible against the independent
    * reference encoder).
    *
    * `mediaDir` is any directory of image assets; it defaults to the
    * checked-in golden fixtures (the board's m11 entry binds that default —
    * its oracle enumerates the fixture set).
    */
  def imageDecode(spark: SparkSession, mediaDir: String = pngFixtureDir): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(mediaDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { files =>
        files.map { case (path, bytes) =>
          val name = path.substring(path.lastIndexOf('/') + 1)
          decodeImage(bytes) match {
            case Some(img) =>
              val sums = new Array[Long](3)
              var i = 0
              while (i < img.pixels.length) {
                sums(i % 3) += img.pixels(i) & 0xff
                i += 1
              }
              PpmStats(name, Some(img.width), Some(img.height),
                Some(img.width.toLong * img.height),
                Some(sums(0)), Some(sums(1)), Some(sums(2)))
            case None => PpmStats(name, None, None, None, None, None, None)
          }
        }
      }
      .toDF()
      .orderBy(col("name"))
  }

  /** m13: decode standard-format images and BOX-RESIZE each to a fixed
    * thumbnail ([[Multimodal.boxResize]] — deterministic integer
    * downscale), emitting exact integer stats of the RESIZED raster plus
    * the sha256 of its interleaved-RGB bytes. The hash makes the oracle
    * pin every output pixel, not just the sums: resize is the one media
    * transform whose OUTPUT feeds models directly, so bit-reproducibility
    * across engines is the contract (the reason the kernel is an integer
    * box average and not a float resampler). Blobs never shuffle — decode
    * + resize happen where the asset lands; only the slim stats rows move.
    *
    * Odd default target (9×7 against 16×12 fixtures) exercises the
    * non-divisible cell grid on both axes.
    */
  def imageResize(spark: SparkSession, mediaDir: String = pngFixtureDir,
      outW: Int = 9, outH: Int = 7): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(mediaDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { files =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        files.map { case (path, bytes) =>
          val name = path.substring(path.lastIndexOf('/') + 1)
          decodeImage(bytes).map(Multimodal.boxResize(_, outW, outH)) match {
            case Some(t) =>
              val sums = new Array[Long](3)
              var i = 0
              while (i < t.pixels.length) {
                sums(i % 3) += t.pixels(i) & 0xff
                i += 1
              }
              md.reset()
              val hex = md.digest(t.pixels).map("%02x".format(_)).mkString
              (name, Some(t.width), Some(t.height),
                Some(sums(0)), Some(sums(1)), Some(sums(2)), Some(hex))
            case None => (name, None, None, None, None, None, None)
          }
        }
      }
      .toDF("name", "out_w", "out_h", "sum_r", "sum_g", "sum_b", "raster_sha256")
      .orderBy(col("name"))
  }

  /** Decoded (name, dHash) signatures — corrupt payloads drop whole. */
  private[graft] def imageSigs(spark: SparkSession,
      mediaDir: String = pngFixtureDir): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(mediaDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        decodeImage(bytes).map(img =>
          (path.substring(path.lastIndexOf('/') + 1), Multimodal.dHash64(img)))
      })
      .toDF("name", "sig")
  }

  /** m12: perceptual near-dup over standard-format images — m5's blocked
    * 16-bit-signature-block candidate geometry (pigeonhole recall for
    * Hamming <= 3, zero probe fan-out), exact bit_count verify. The
    * re-encoded copy lands at 0, the brightness-lifted retouch at its
    * retouch bits — the copies exact hashing (m3) misses.
    */
  def imageNearDup(spark: SparkSession, mediaDir: String = pngFixtureDir,
      maxHamming: Int = 3): DataFrame = {
    val sigs = imageSigs(spark, mediaDir)
    val blocks = sigs.select(col("name"), col("sig"),
      explode(array((0 until 4).map(b => struct(lit(b).as("bno"),
        shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xffffL)).as("bv"))): _*))
        .as("blk"))
      .select(col("name"), col("sig"), col("blk.bno").as("bno"), col("blk.bv").as("bv"))
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.bno") === col("b.bno") && col("a.bv") === col("b.bv") &&
          col("a.name") < col("b.name"))
      .select(col("a.name").as("name1"), col("b.name").as("name2"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("int").as("hamming"))
      .dropDuplicates("name1", "name2")
      .where(col("hamming") <= maxHamming)
      .orderBy(col("name1"), col("name2"))
  }
}
