package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-asset decode stats (m7): None columns = the payload failed to
  * decode (truncated/malformed/unsupported — rejected whole, never
  * half-read, the m4 contract on the audio modality).
  */
case class WavStats(name: String, sample_rate: Option[Int], n_channels: Option[Int],
  n_frames: Option[Long], sum_abs: Option[Long], peak: Option[Int])

/** The audio column of the multimodal matrix: WAV (RIFF/PCM) as the
  * pure-JVM REAL codec — the audio analog of [[Multimodal.decodePpm]].
  * PCM WAV is the interchange format large audio corpora actually stage
  * (decode-once, then featurize); compressed formats (MP3/FLAC/Opus)
  * swap into the same per-partition codec-init point.
  *
  * m7 decodes the checked-in fixtures to exact integer stats (golden
  * oracle, reproducible to the bit). m8 reduces each asset to a 64-bit
  * delta-energy fingerprint — bit w = energy(window w) < energy(window
  * w+1) over 65 equal windows of the mono mix, all-integer arithmetic —
  * and finds near-dups with m5's blocked-Hamming geometry. A uniform
  * gain change scales every window energy by the same factor and flips
  * NO bits (the volume-normalized re-encode case), and a stereo spread
  * of the same signal mixes back to the identical mono stream: exactly
  * the invariances exact hashing (m3) misses on audio.
  *
  * Scale shape: payload blobs never shuffle — decoded split-parallel in
  * place, only (name, 64-bit sig) rows move; candidates come from an
  * equi-join on exact 16-bit signature blocks (pigeonhole: Hamming <= 3
  * shares a block), verified by one codegen'd bit_count. Same
  * corpus-independent candidate bound as d17/m5.
  *
  * Fixture reference: tools/gen_wav_fixtures.py (independent Python
  * decode + fingerprint; the golden VALUES oracles come from it).
  */
object Audio {

  /** Decoded PCM audio: sample rate, source channel count, and the
    * mono-mixed samples (stereo mixes as (L+R)>>1 — floor, identical
    * across JVM and the reference's Python).
    */
  case class WavPcm(sampleRate: Int, channels: Int, mono: Array[Int])

  /** REAL audio decoder: RIFF/WAVE container walked chunk-by-chunk
    * (odd-size chunks carry a pad byte), `fmt ` must declare
    * uncompressed PCM / 16-bit / 1-2 channels, and the `data` chunk must
    * be fully present and frame-aligned. Anything else returns None —
    * a corrupt asset is rejected whole.
    */
  def decodeWav(payload: Array[Byte]): Option[WavPcm] = {
    val n = payload.length
    def u16(i: Int): Int = (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (u16(i).toLong) | (u16(i + 2).toLong << 16)
    def s16(i: Int): Int = u16(i).toShort.toInt
    def tag(i: Int): String = new String(payload, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (n < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (audioFormat, channels, rate, bits)
    while (i + 8 <= n) {
      val cid = tag(i)
      val size = u32(i + 4)
      val bodyAt = i + 8L
      if (cid == "fmt " && size >= 16 && bodyAt + 16 <= n)
        fmt = Some((u16(i + 8), u16(i + 10), u32(i + 12).toInt, u16(i + 22)))
      else if (cid == "data") {
        fmt match {
          case Some((af, ch, rate, bits))
              if af == 1 && bits == 16 && (ch == 1 || ch == 2) && rate > 0 &&
                bodyAt + size <= n && size % (2 * ch) == 0 =>
            val frames = (size / (2 * ch)).toInt
            val mono = new Array[Int](frames)
            var k = 0
            while (k < frames) {
              val at = bodyAt.toInt + k * 2 * ch
              mono(k) = if (ch == 1) s16(at) else (s16(at) + s16(at + 2)) >> 1
              k += 1
            }
            return Some(WavPcm(rate, ch, mono))
          case _ => return None
        }
      }
      val next = bodyAt + size + (size & 1)
      if (next > n) return None // declared chunk runs past the payload
      i = next.toInt
    }
    None
  }

  /** 64-bit delta-energy fingerprint: exact integer per-window energies
    * (sum of squares — a 1 s 16-bit window is far below Long overflow;
    * overflow would need ~2^33 samples per window), bit w set when
    * e(w) < e(w+1). Returns None for clips shorter than the 65 windows.
    */
  def fingerprint(mono: Array[Int]): Option[Long] = {
    val W = 65
    val n = mono.length
    if (n < W) return None
    val e = new Array[Long](W)
    var w = 0
    while (w < W) {
      // window boundaries in Long: w*n overflows Int past ~33.5M samples
      // (a 12-minute mono clip), which would index negative and crash the
      // task instead of fingerprinting — the energies are Long-safe but
      // the boundary arithmetic must be too
      val x0 = (w.toLong * n / W).toInt
      val x1 = math.max(x0 + 1, ((w + 1).toLong * n / W).toInt)
      var tot = 0L
      var i = x0
      while (i < x1) { val s = mono(i).toLong; tot += s * s; i += 1 }
      e(w) = tot
      w += 1
    }
    var sig = 0L
    w = 0
    while (w < 64) {
      if (e(w) < e(w + 1)) sig |= 1L << w
      w += 1
    }
    Some(sig)
  }

  /** Checked-in WAV fixtures (tools/gen_wav_fixtures.py): a tone, its
    * -6 dB gain copy (also carries an ancillary LIST chunk — pins the
    * chunk-skip walk), a one-window click retouch, an unrelated tone,
    * its stereo spread, and a truncated reject case. Engine-shipped on
    * the classpath and extracted once per JVM, as [[Multimodal.ppmFixtureDir]].
    */
  private val wavFixtureNames = Seq("corrupt.wav", "tonea.wav", "tonea_click.wav",
    "tonea_gain.wav", "toneb.wav", "toneb_stereo.wav")

  lazy val wavFixtureDir: String = {
    val dir = graft.util.TmpDirs.scratch("graft_wav_fixtures_")
    wavFixtureNames.foreach { nm =>
      val in = getClass.getResourceAsStream(s"/wav/$nm")
      require(in != null, s"classpath resource /wav/$nm missing from the graft jar")
      try java.nio.file.Files.copy(in, dir.resolve(nm)) finally in.close()
    }
    dir.toString
  }

  /** m7: decode real audio bytes partition-parallel, reduce each to
    * exact integer stats. Blobs never shuffle — only the stats rows move.
    *
    * `mediaDir` is any directory of WAV assets; it defaults to the
    * checked-in golden fixtures (the board's m7 entry binds that default —
    * its oracle enumerates the fixture set).
    */
  def wavDecode(spark: SparkSession, mediaDir: String = wavFixtureDir): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(mediaDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { files =>
        // per-partition codec init point (a compressed-format decoder
        // would be constructed here, once, not per record)
        files.map { case (path, bytes) =>
          val name = path.substring(path.lastIndexOf('/') + 1)
          decodeWav(bytes) match {
            case Some(pcm) =>
              var sumAbs = 0L
              var peak = 0
              var i = 0
              while (i < pcm.mono.length) {
                val a = math.abs(pcm.mono(i))
                sumAbs += a
                if (a > peak) peak = a
                i += 1
              }
              WavStats(name, Some(pcm.sampleRate), Some(pcm.channels),
                Some(pcm.mono.length.toLong), Some(sumAbs), Some(peak))
            case None => WavStats(name, None, None, None, None, None)
          }
        }
      }
      .toDF()
      .orderBy(col("name"))
  }

  /** Decoded (name, fingerprint) rows — corrupt or sub-65-sample assets
    * drop by the whole-asset reject.
    */
  private[graft] def wavSigs(spark: SparkSession,
      mediaDir: String = wavFixtureDir): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(mediaDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { files =>
        files.flatMap { case (path, bytes) =>
          decodeWav(bytes).flatMap(pcm => fingerprint(pcm.mono))
            .map(sig => (path.substring(path.lastIndexOf('/') + 1), sig))
        }
      }
      .toDF("name", "sig")
  }

  /** m8: perceptual near-dup on the audio modality — m5's blocked
    * 16-bit-signature-block candidate geometry over [[fingerprint]]s,
    * exact bit_count verify, pairs within Hamming <= `maxHamming`.
    */
  def wavNearDup(spark: SparkSession, mediaDir: String = wavFixtureDir,
      maxHamming: Int = 3): DataFrame = {
    val sigs = wavSigs(spark, mediaDir)
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
