package graft.tools

import java.nio.file.{Files, Paths}

import graft.ops.{Multimodal, Png}

/** One-time generator for the m14 JPEG fixtures (src/main/resources/jpg).
  *
  * JPEG is LOSSY with decoder-dependent rounding, so unlike the PNG/PPM/WAV
  * fixtures there is no independent-encoder golden raster to agree with to
  * the bit. The m14 oracle instead pins INVARIANTS that survive lossy decode:
  * decode accepts/rejects, header dimensions, and near-dup GEOMETRY (the two
  * encodes of the same source raster land within the chassis' Hamming
  * threshold of each other; the unrelated image does not; the truncated
  * payload rejects whole). This generator VERIFIES those invariants hold with
  * wide margins at generation time and refuses to write fixtures that don't —
  * so the checked-in bytes carry their own proof obligation.
  *
  * Rasters are smooth low-frequency gradients (not noise): JPEG's 8×8 DCT
  * blocks reproduce smooth content almost exactly, keeping the re-encode
  * Hamming near 0 with the margin the invariant oracle needs.
  *
  * Run once: `sbt "runMain graft.tools.GenJpegFixtures"`, commit the bytes
  * (pinned binary via .gitattributes).
  */
object GenJpegFixtures {

  private def raster(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      def c(v: Int) = math.max(0, math.min(255, v))
      img.setRGB(x, y, (c(r) << 16) | (c(g) << 8) | c(b))
    }
    img
  }

  private def jpegBytes(img: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(out)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { out.close(); writer.dispose() }
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val (w, h) = (72, 56)
    // smooth gradients with a quadratic fold (non-monotone luminance, so the
    // dHash is mixed bits, not a degenerate all-ones row pattern)
    val a = raster(w, h)((x, y) => (30 + 3 * x, 40 + 3 * y, (x - 36) * (x - 36) / 6 + y))
    val b = raster(w, h)((x, y) => (240 - 3 * x, 220 - 3 * y, 255 - (y - 28) * (y - 28) / 4 - x))

    val imga = jpegBytes(a, 0.92f)
    val requality = jpegBytes(a, 0.55f)
    val imgb = jpegBytes(b, 0.92f)
    // HEADER truncation (mid-DQT/SOF), not tail truncation: the JDK's JPEG
    // reader TOLERATES scan-data truncation — it decodes the delivered MCUs
    // and fills the rest — so a tail-chopped file "decodes" rather than
    // rejects. Cutting inside the header tables is unambiguous: dimensions/
    // tables are incomplete, the reader throws, the asset rejects whole.
    val corrupt = java.util.Arrays.copyOf(imga, 120)

    // ---- verify the invariants the m14/d42 oracles will pin ----
    require(!java.util.Arrays.equals(imga, requality),
      "the two qualities must produce byte-different files")
    val da = Png.decodeImage(imga).get
    val dq = Png.decodeImage(requality).get
    val db = Png.decodeImage(imgb).get
    require(da.width == w && da.height == h && dq.width == w && db.width == w)
    require(Png.decodeImage(corrupt).isEmpty, "truncated JPEG must reject whole")
    val hq = java.lang.Long.bitCount(Multimodal.dHash64(da) ^ Multimodal.dHash64(dq))
    val hb = java.lang.Long.bitCount(Multimodal.dHash64(da) ^ Multimodal.dHash64(db))
    val hqb = java.lang.Long.bitCount(Multimodal.dHash64(dq) ^ Multimodal.dHash64(db))
    println(s"hamming(imga, requality) = $hq   (need <= 1 for margin under threshold 3)")
    println(s"hamming(imga, imgb)      = $hb   (need >= 10 for margin over threshold 3)")
    println(s"hamming(requality, imgb) = $hqb  (need >= 10)")
    require(hq <= 1, s"re-encode drifted $hq dHash bits - pick smoother rasters")
    require(hb >= 10 && hqb >= 10, "unrelated images too close - separate the rasters")

    val out = Paths.get("src/main/resources/jpg")
    Files.createDirectories(out)
    Seq("imga.jpg" -> imga, "imga_requality.jpg" -> requality,
      "imgb.jpg" -> imgb, "corrupt.jpg" -> corrupt).foreach { case (nm, bytes) =>
      Files.write(out.resolve(nm), bytes)
      println(s"$nm  ${bytes.length} bytes")
    }
    println("invariants verified; fixtures written")
  }
}
