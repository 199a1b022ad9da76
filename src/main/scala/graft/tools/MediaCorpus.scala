package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.ops.{Audio, Multimodal, PpmImage, Video}

/** Synthetic media corpora for scale measurement (not part of the engine
  * surface): procedurally generate N-asset PPM / WAV / Y4M directories with
  * PLANTED near-duplicate pairs, so the media modalities can be measured —
  * and their recall asserted — on corpora instead of the ≤6 checked-in
  * golden fixtures.
  *
  * Planting contract: every 5th base asset gets ONE companion, cycling
  * through the modality's invariance (re-encode/re-wrap — byte-different,
  * signature-identical), a uniform lift (brightness/gain — clamp-free by
  * construction, signature-identical), and a small retouch. The manifest
  * records a pair only when the ENGINE KERNEL measures it within the op's
  * default threshold at generation time (retouches on noise assets can
  * legitimately exceed it), so a recall assertion `found ⊇ planted` tests
  * exactly what the fixtures cannot: that the blocked-Hamming CANDIDATE
  * GEOMETRY — the exact-16-bit-block equi-join — reproduces the kernel
  * ground truth at corpus scale. (The kernels themselves are golden-gated
  * by m5/m8/m10/m12; this measures the index, not the hash.)
  *
  * Block-occupancy heat: real corpora have degenerate assets (flat images,
  * constant-envelope audio) whose signatures collide exactly — the hot
  * buckets an equi-join index must survive. Each corpus plants a BOUNDED
  * family (≤32 assets, constant across N) of such degenerate assets: all
  * share one signature, so the index carries a maximally hot block and the
  * served pair table gains a fixed ~500-pair clique — heat without a
  * corpus-quadratic term.
  *
  * Everything is a pure function of (seed, asset index): the corpus is
  * reproducible bit-for-bit, and the manifest persists as `_PLANTED`
  * beside the `_READY` marker so repeated probe runs skip generation.
  */
object MediaCorpus {

  /** A planted near-dup pair (name1 < name2) with its kernel distance. */
  case class Planted(name1: String, name2: String, dist: Int)

  // splitmix64: one independent stream per (seed, asset, purpose)
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def rng(seed: Long, i: Long, stream: Long): () => Int = {
    var s = mix(mix(mix(seed) ^ i) ^ (stream * 0x632be59bd9b4e019L))
    () => { s = mix(s); ((s >>> 33) & 0x7fffffff).toInt }
  }

  private val flatFamilyMax = 32

  // ---- encoders (minimal standard forms, matching the fixture writers) ---

  private def ppmBytes(w: Int, h: Int, px: Array[Byte], comment: Option[String]): Array[Byte] = {
    val hdr = comment.map(c => s"P6\n# $c\n$w $h\n255\n").getOrElse(s"P6\n$w $h\n255\n")
    val out = new Array[Byte](hdr.length + px.length)
    System.arraycopy(hdr.getBytes("US-ASCII"), 0, out, 0, hdr.length)
    System.arraycopy(px, 0, out, hdr.length, px.length)
    out
  }

  private def wavBytes(rate: Int, channels: Int, interleaved: Array[Short]): Array[Byte] = {
    val dataLen = interleaved.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1)
    bb.putShort(channels.toShort); bb.putInt(rate)
    bb.putInt(rate * channels * 2); bb.putShort((channels * 2).toShort); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    interleaved.foreach(bb.putShort)
    bb.array()
  }

  /** Minimal standard PNG (signature, IHDR/IDAT/IEND, filter-0 scanlines,
    * Deflater + CRC32) — the JVM twin of tools/gen_png_fixtures.py, so the
    * png corpus exercises the ImageIO DECODE path the m11 ops actually
    * run. `level`/`text` give the byte-different re-encode variant.
    */
  private def pngBytes(w: Int, h: Int, px: Array[Byte], level: Int,
      text: Option[String]): Array[Byte] = {
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val t = tag.getBytes("US-ASCII")
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      bb.putInt(body.length); bb.put(t); bb.put(body)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(body)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val raw = new Array[Byte](h * (1 + w * 3)) // filter byte 0 per scanline
    var y = 0
    while (y < h) {
      System.arraycopy(px, y * w * 3, raw, y * (1 + w * 3) + 1, w * 3)
      y += 1
    }
    val defl = new java.util.zip.Deflater(level)
    defl.setInput(raw); defl.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) idat.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w); ihdr.putInt(h)
    ihdr.put(8.toByte); ihdr.put(2.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    out.write(chunk("IHDR", ihdr.array()))
    text.foreach(t => out.write(chunk("tEXt", ("Comment\u0000" + t).getBytes("US-ASCII"))))
    out.write(chunk("IDAT", idat.toByteArray))
    out.write(chunk("IEND", Array.empty[Byte]))
    out.toByteArray
  }

  /** Baseline UNCOMPRESSED chunky-RGB TIFF, little-endian, one strip —
    * the JVM twin of tools/gen_tiff_fixtures.py (12 ascending IFD tags,
    * out-of-line BitsPerSample + resolutions, then the strip).
    */
  private def tiffBytes(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    val n = 12
    val ifdSize = 2 + n * 12 + 4
    val bpsOff = 8 + ifdSize
    val xresOff = bpsOff + 6
    val yresOff = xresOff + 8
    val stripOff = yresOff + 8
    val bb = java.nio.ByteBuffer.allocate(stripOff + px.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte); bb.put('I'.toByte); bb.putShort(42); bb.putInt(8)
    bb.putShort(n.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      bb.putShort(tag.toShort); bb.putShort(typ.toShort); bb.putInt(count)
      if (typ == 3 && count == 1) { bb.putShort(value.toShort); bb.putShort(0) }
      else bb.putInt(value)
    }
    entry(256, 3, 1, w); entry(257, 3, 1, h)
    entry(258, 3, 3, bpsOff)          // BitsPerSample [8,8,8]
    entry(259, 3, 1, 1)               // Compression: none
    entry(262, 3, 1, 2)               // Photometric: RGB
    entry(273, 4, 1, stripOff)        // StripOffsets
    entry(277, 3, 1, 3)               // SamplesPerPixel
    entry(278, 3, 1, h)               // RowsPerStrip: one strip
    entry(279, 4, 1, px.length)       // StripByteCounts
    entry(282, 5, 1, xresOff); entry(283, 5, 1, yresOff)
    entry(296, 3, 1, 2)               // ResolutionUnit: inch
    bb.putInt(0)                      // next-IFD pointer
    bb.putShort(8); bb.putShort(8); bb.putShort(8)
    bb.putInt(72); bb.putInt(1); bb.putInt(72); bb.putInt(1)
    bb.put(px)
    bb.array()
  }

  private def y4mBytes(w: Int, h: Int, lumas: Seq[Array[Byte]],
      extraHeader: String, frameParam: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg$extraHeader\n".getBytes("US-ASCII"))
    val chroma = new Array[Byte]((w / 2) * (h / 2) * 2)
    lumas.foreach { l =>
      bos.write(s"FRAME$frameParam\n".getBytes("US-ASCII"))
      bos.write(l); bos.write(chroma)
    }
    bos.toByteArray
  }

  // ---- per-modality asset + companion construction ------------------------

  private val ppmW = 64; private val ppmH = 48

  /** Raster values stay ≤ 239 so the +16 lift variant never clamps (a
    * clamp would flip dHash bits and break the signature-identical plant).
    */
  private def ppmRaster(seed: Long, i: Int): Array[Byte] = {
    val flat = i < flatFamilyMax
    if (flat) Array.fill(ppmW * ppmH * 3)((40 + 5 * i).min(239).toByte)
    else {
      val r = rng(seed, i, 1)
      Array.fill(ppmW * ppmH * 3)((r() % 240).toByte)
    }
  }


  private def dhashOf(px: Array[Byte]): Long =
    Multimodal.dHash64(PpmImage(ppmW, ppmH, 255, px))

  // WAV: 65 windows of ~123 samples at stepped amplitudes; the envelope is
  // the signature, so halving the gain preserves it exactly in spirit —
  // the manifest still measures the actual kernel distance.
  private val wavRate = 8000; private val wavN = 8000; private val wavWindows = 65

  private def wavMono(seed: Long, i: Int): Array[Short] = {
    val flat = i < flatFamilyMax
    val out = new Array[Short](wavN)
    val rEnv = rng(seed, i, 2)
    // the flat family shares ONE sample stream (asset index pinned to 0)
    // and differs only by gain below: the fingerprint is scale-invariant,
    // so the whole family lands on the same signature — the hot bucket
    val rSig = rng(seed, if (flat) 0 else i, 3)
    var w = 0
    while (w < wavWindows) {
      val x0 = (w.toLong * wavN / wavWindows).toInt
      val x1 = math.max(x0 + 1, ((w + 1).toLong * wavN / wavWindows).toInt)
      // flat: one monotone envelope with inter-window margins far above
      // floor-rounding noise; rest: stepped random amplitudes
      val amp = if (flat) 500 + w * 200 else 800 + (rEnv() % 24) * 600
      var x = x0
      while (x < x1) {
        out(x) = ((rSig() % (2 * amp + 1)) - amp).toShort
        x += 1
      }
      w += 1
    }
    if (flat) out.map(s => (s / (1 + i % 4)).toShort) else out
  }

  private val vidW = 48; private val vidH = 32; private val vidFrames = 8

  private def vidLumas(seed: Long, i: Int): Seq[Array[Byte]] = {
    val flat = i < flatFamilyMax
    (0 until vidFrames).map { f =>
      if (flat) Array.fill(vidW * vidH)((30 + 4 * i + f).min(239).toByte)
      else {
        val r = rng(seed, i, 10 + f)
        Array.fill(vidW * vidH)((r() % 240).toByte)
      }
    }
  }

  private def vidSig(lumas: Seq[Array[Byte]]): Array[Long] =
    Video.signature(Video.Y4mVideo(vidW, vidH, 25, 1, lumas.toArray))

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Build asset `i` (and its companion when planted): returns the
    * (name, bytes) files to write plus the kernel-measured planted pair if
    * the companion lands within the op's default threshold.
    */
  private def buildPpm(seed: Long, i: Int): (Seq[(String, Array[Byte])], Option[Planted]) = {
    val name = f"img$i%06d.ppm"
    val px = ppmRaster(seed, i)
    val base = Seq(name -> ppmBytes(ppmW, ppmH, px, None))
    if (i < flatFamilyMax || i % 5 != 0) (base, None)
    else {
      val (suffix, vpx, comment) = (i / 5) % 3 match {
        case 0 => ("recode", px, Some("re-encoded copy, identical raster"))
        case 1 => ("bright", px.map(b => ((b & 0xff) + 16).toByte), None)
        case _ =>
          val q = px.clone()
          val r = rng(seed, i, 4)
          q(r() % q.length) = 0; q(r() % q.length) = -1 // two-pixel retouch
          ("retouch", q, None)
      }
      val vname = f"img$i%06d_$suffix.ppm"
      val d = ham(dhashOf(px), dhashOf(vpx))
      (base :+ (vname -> ppmBytes(ppmW, ppmH, vpx, comment)),
        if (d <= 3) Some(Planted(name, vname, d)) else None)
    }
  }

  /** The png corpus reuses the ppm rasters (same kernel downstream) but
    * round-trips through the REAL ImageIO decode — its scale row prices
    * the standard-format codec term the P6 path skips.
    */
  private def buildPng(seed: Long, i: Int): (Seq[(String, Array[Byte])], Option[Planted]) = {
    val name = f"pic$i%06d.png"
    val px = ppmRaster(seed, i)
    val base = Seq(name -> pngBytes(ppmW, ppmH, px, 9, None))
    if (i < flatFamilyMax || i % 5 != 0) (base, None)
    else {
      val (suffix, vpx, level, text) = (i / 5) % 3 match {
        case 0 => ("recode", px, 1, Some("re-encoded copy, identical raster"))
        case 1 => ("bright", px.map(b => ((b & 0xff) + 16).toByte), 9, None)
        case _ =>
          val q = px.clone()
          val r = rng(seed, i, 4)
          q(r() % q.length) = 0; q(r() % q.length) = -1
          ("retouch", q, 9, None)
      }
      val vname = f"pic$i%06d_$suffix.png"
      val d = ham(dhashOf(px), dhashOf(vpx))
      (base :+ (vname -> pngBytes(ppmW, ppmH, vpx, level, text)),
        if (d <= 3) Some(Planted(name, vname, d)) else None)
    }
  }

  /** The tiff corpus reuses the ppm rasters through the UNCOMPRESSED
    * container: TIFF has no re-encode degree of freedom, so the copy
    * variant is a byte-identical second asset (hamming 0 — the exact-copy
    * case the signature still has to find under a different name).
    */
  private def buildTiff(seed: Long, i: Int): (Seq[(String, Array[Byte])], Option[Planted]) = {
    val name = f"scan$i%06d.tiff"
    val px = ppmRaster(seed, i)
    val base = Seq(name -> tiffBytes(ppmW, ppmH, px))
    if (i < flatFamilyMax || i % 5 != 0) (base, None)
    else {
      val (suffix, vpx) = (i / 5) % 3 match {
        case 0 => ("copy", px)
        case 1 => ("bright", px.map(b => ((b & 0xff) + 16).toByte))
        case _ =>
          val q = px.clone()
          val r = rng(seed, i, 4)
          q(r() % q.length) = 0; q(r() % q.length) = -1 // two-pixel retouch
          ("retouch", q)
      }
      val vname = f"scan$i%06d_$suffix.tiff"
      val d = ham(dhashOf(px), dhashOf(vpx))
      (base :+ (vname -> tiffBytes(ppmW, ppmH, vpx)),
        if (d <= 3) Some(Planted(name, vname, d)) else None)
    }
  }

  private def buildWav(seed: Long, i: Int): (Seq[(String, Array[Byte])], Option[Planted]) = {
    val name = f"snd$i%06d.wav"
    val mono = wavMono(seed, i)
    val base = Seq(name -> wavBytes(wavRate, 1, mono))
    if (i < flatFamilyMax || i % 5 != 0) (base, None)
    else {
      val (suffix, bytes, variantMono) = (i / 5) % 3 match {
        case 0 => // -6 dB gain
          val g = mono.map(s => (s / 2).toShort)
          ("gain", wavBytes(wavRate, 1, g), g)
        case 1 => // stereo spread of the identical signal: mixes back exactly
          val st = new Array[Short](mono.length * 2)
          var k = 0
          while (k < mono.length) { st(2 * k) = mono(k); st(2 * k + 1) = mono(k); k += 1 }
          ("stereo", wavBytes(wavRate, 2, st), mono)
        case _ => // one-window click retouch
          val q = mono.clone()
          val r = rng(seed, i, 5)
          val w0 = r() % wavWindows
          val x0 = (w0.toLong * wavN / wavWindows).toInt
          val x1 = math.max(x0 + 1, ((w0 + 1).toLong * wavN / wavWindows).toInt)
          (x0 until x1).foreach(q(_) = 30000)
          ("click", wavBytes(wavRate, 1, q), q)
      }
      val vname = f"snd$i%06d_$suffix.wav"
      val d = (Audio.fingerprint(mono.map(_.toInt)), Audio.fingerprint(variantMono.map(_.toInt))) match {
        case (Some(a), Some(b)) => ham(a, b)
        case _ => Int.MaxValue
      }
      (base :+ (vname -> bytes), if (d <= 3) Some(Planted(name, vname, d)) else None)
    }
  }

  private def buildY4m(seed: Long, i: Int): (Seq[(String, Array[Byte])], Option[Planted]) = {
    val name = f"vid$i%06d.y4m"
    val lumas = vidLumas(seed, i)
    val base = Seq(name -> y4mBytes(vidW, vidH, lumas, "", ""))
    if (i < flatFamilyMax || i % 5 != 0) (base, None)
    else {
      val (suffix, vlumas, hdr, fp) = (i / 5) % 3 match {
        case 0 => ("rewrap", lumas, " XCORPUS", " Xq=1")
        case 1 => ("bright", lumas.map(_.map(b => ((b & 0xff) + 16).toByte)), "", "")
        case _ =>
          val q = lumas.map(_.clone())
          val r = rng(seed, i, 6)
          val f = (r() % 4).toLong * vidFrames / 4 // retouch one SAMPLED frame
          (0 until 40).foreach(k => q(f.toInt)(r() % q(f.toInt).length) = (r() % 240).toByte)
          ("retouch", q, "", "")
      }
      val vname = f"vid$i%06d_$suffix.y4m"
      val d = vidSig(lumas).zip(vidSig(vlumas)).map { case (a, b) => ham(a, b) }.sum
      (base :+ (vname -> y4mBytes(vidW, vidH, vlumas, hdr, fp)),
        if (d <= 6) Some(Planted(name, vname, d)) else None)
    }
  }

  // ---- corpus generation ---------------------------------------------------

  val modalities: Map[String, (Long, Int) => (Seq[(String, Array[Byte])], Option[Planted])] =
    Map("ppm" -> buildPpm, "png" -> buildPng, "tiff" -> buildTiff,
      "wav" -> buildWav, "y4m" -> buildY4m)

  /** Generate (or reuse) an N-base-asset corpus of `modality` under `dir`;
    * returns the planted-pair manifest. Generation fans out over Spark
    * tasks (pure CPU + local writes); `_READY` guards reuse and the
    * manifest persists as `_PLANTED`.
    */
  def generate(spark: SparkSession, dir: String, modality: String, nBase: Int,
      seed: Long = 77L): Seq[Planted] = {
    // executor tasks write assets with java.nio LOCAL-filesystem calls and
    // the driver reads them back — only coherent when every task shares the
    // driver's disk. This is a measurement tool, not an engine op; refuse
    // loudly on a distributed master or a non-local scheme instead of
    // producing a half-written corpus under a _READY marker.
    require(spark.sparkContext.isLocal,
      "MediaCorpus.generate: local-mode only (tasks write the corpus with " +
        "local-filesystem calls the driver then reads)")
    require(!dir.contains("://"),
      s"MediaCorpus.generate: plain local paths only, got '$dir'")
    val build = modalities.getOrElse(modality, throw new IllegalArgumentException(
      s"MediaCorpus.generate: unknown modality '$modality' — known: ${modalities.keys.toSeq.sorted.mkString(", ")}"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val plantedPath = Paths.get(dir, "_PLANTED")
    if (fs.exists(new Path(s"$dir/_READY"))) {
      return Files.readAllLines(plantedPath).toArray(Array.empty[String]).toSeq
        .filter(_.nonEmpty).map { line =>
          val Array(a, b, d) = line.split('\t')
          Planted(a, b, d.toInt)
        }
    }
    // destructive-regeneration guard: only delete content this tool
    // recognizably created. A non-empty dir carrying NEITHER marker is
    // someone else's data (a typo'd path, a user corpus) — refuse rather
    // than destroy; a dir with _PLANTED but no _READY is this tool's own
    // torn write being redone.
    if (fs.exists(new Path(dir)) && fs.listStatus(new Path(dir)).nonEmpty &&
        !fs.exists(new Path(s"$dir/_PLANTED")))
      throw new IllegalStateException(
        s"MediaCorpus.generate: '$dir' exists, is non-empty, and carries " +
          "neither _READY nor _PLANTED — refusing to delete content this " +
          "tool did not create; point at an empty/new dir or remove it yourself")
    fs.delete(new Path(dir), true)
    Files.createDirectories(Paths.get(dir))
    // ownership marker BEFORE the fan-out: a kill mid-generation leaves a
    // non-empty dir that must still read as this tool's own torn write
    // (the guard above), not as someone else's data — the manifest content
    // is rewritten after the fan-out completes
    Files.write(plantedPath, Array.empty[Byte])
    import spark.implicits._
    val planted = spark.range(nBase).select(org.apache.spark.sql.functions.col("id").cast("int"))
      .as[Int]
      .mapPartitions(_.flatMap { i =>
        val (files, p) = build(seed, i)
        files.foreach { case (nm, bytes) => Files.write(Paths.get(dir, nm), bytes) }
        p.map(pl => (pl.name1, pl.name2, pl.dist))
      })
      .collect()
      .map { case (a, b, d) => Planted(a, b, d) }
      .toSeq.sortBy(p => (p.name1, p.name2))
    Files.write(plantedPath,
      planted.map(p => s"${p.name1}\t${p.name2}\t${p.dist}").mkString("\n").getBytes("UTF-8"))
    fs.create(new Path(s"$dir/_READY"), true).close()
    planted
  }
}
