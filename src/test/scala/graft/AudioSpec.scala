package graft

import graft.ops.Audio

/** The audio column of the multimodal matrix: the WAV decoder's chunk
  * walk and reject paths, the delta-energy fingerprint's invariances
  * (uniform gain, stereo spread), and the m7/m8 fixture pins against
  * the independent Python reference (tools/gen_wav_fixtures.py).
  */
class AudioSpec extends SparkSpec {

  private def wav(samples: Seq[Int], channels: Int = 1, rate: Int = 8000,
      extraChunk: Boolean = false): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 << 20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def chunk(id: String, body: Array[Byte]): Unit = {
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      if (body.length % 2 == 1) bb.put(0.toByte)
    }
    val fmt = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .array()
    val data = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(s => data.putShort(s.toShort))
    bb.put("RIFF".getBytes("US-ASCII")).putInt(0).put("WAVE".getBytes("US-ASCII"))
    chunk("fmt ", fmt)
    if (extraChunk) chunk("LIST", "odd-size".getBytes("US-ASCII") ++ Array(33.toByte))
    chunk("data", data.array())
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  test("WAV decoder: mono, stereo mix, pad-byte chunk walk, rate passthrough") {
    val mono = Audio.decodeWav(wav(Seq(5, -7, 100), rate = 44100)).get
    assert(mono.sampleRate == 44100 && mono.channels == 1)
    assert(mono.mono.toSeq == Seq(5, -7, 100))
    // stereo mixes (L+R)>>1 — floor, so (-7 + -8) >> 1 == -8, not -7
    val st = Audio.decodeWav(wav(Seq(10, 20, -7, -8), channels = 2)).get
    assert(st.channels == 2 && st.mono.toSeq == Seq(15, -8))
    // an odd-size ancillary chunk before data must be walked over
    val padded = Audio.decodeWav(wav(Seq(1, 2, 3), extraChunk = true)).get
    assert(padded.mono.toSeq == Seq(1, 2, 3))
  }

  test("WAV decoder rejects malformed payloads whole") {
    val good = wav(Seq.tabulate(100)(i => i - 50))
    assert(Audio.decodeWav(good).isDefined)
    assert(Audio.decodeWav(Array[Byte]()).isEmpty)
    assert(Audio.decodeWav("RIFFxxxxWAVD".getBytes).isEmpty)
    // truncated data chunk: declared size runs past the payload
    assert(Audio.decodeWav(java.util.Arrays.copyOf(good, good.length - 10)).isEmpty)
    // stereo data not frame-aligned (odd sample count)
    assert(Audio.decodeWav(wav(Seq(1, 2, 3), channels = 2)).isEmpty)
    // 8-bit / non-PCM / >2 channels all reject
    val b = wav(Seq(1, 2))
    b(34) = 8 // bitsPerSample LSB inside fmt
    assert(Audio.decodeWav(b).isEmpty)
    val c = wav(Seq(1, 2))
    c(20) = 3 // audioFormat = IEEE float
    assert(Audio.decodeWav(c).isEmpty)
  }

  test("fingerprint: uniform gain flips no bits; sub-65-sample clips reject") {
    val g = new java.util.Random(7)
    val base = Array.tabulate(8000) { i =>
      ((3000 + 2500 * math.sin(2 * math.Pi * i / 1900.0)) *
        math.sin(2 * math.Pi * 440 * i / 8000.0) + g.nextInt(101) - 50).toInt
    }
    val sig = Audio.fingerprint(base).get
    val halved = Audio.fingerprint(base.map(_ >> 1)).get
    assert(sig == halved, "uniform gain must flip no delta-energy bits")
    assert(Audio.fingerprint(Array.fill(64)(5)).isEmpty)
    assert(Audio.fingerprint(Array.fill(65)(5)).isDefined)
  }

  test("m7 decodes the checked-in fixtures; corrupt file yields a NULL row") {
    val rows = Audio.wavDecode(spark).collect()
    assert(rows.length == 6)
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("corrupt.wav").isNullAt(1), "truncated fixture must reject whole")
    val a = byName("tonea.wav")
    // golden values from the independent reference decoder
    assert(a.getInt(1) == 8000 && a.getInt(2) == 1 && a.getLong(3) == 8000L &&
      a.getLong(4) == 47847068L && a.getInt(5) == 16148)
    val st = byName("toneb_stereo.wav")
    assert(st.getInt(2) == 2 && st.getLong(4) == byName("toneb.wav").getLong(4),
      "the stereo spread must mono-mix back to toneb's exact stats")
  }

  test("m8: near-dup finds the gain, click, and stereo copies at the golden distances") {
    val pairs = Audio.wavNearDup(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(pairs == Seq(
      ("tonea.wav", "tonea_click.wav", 1),
      ("tonea.wav", "tonea_gain.wav", 0),
      ("tonea_click.wav", "tonea_gain.wav", 1),
      ("toneb.wav", "toneb_stereo.wav", 0)))
  }

  private def fixtureMedia = {
    import org.apache.spark.sql.functions._
    spark.read.format("binaryFile").load(Audio.wavFixtureDir)
      .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
  }

  private def goldenPairs = Seq(
    ("tonea.wav", "tonea_click.wav", 1),
    ("tonea.wav", "tonea_gain.wav", 0),
    ("tonea_click.wav", "tonea_gain.wav", 1),
    ("toneb.wav", "toneb_stereo.wav", 0))

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq

  test("d36: audio split-ingest == m8's one-shot; the codec is pinned in _CONFIG") {
    import org.apache.spark.sql.functions.col
    val state = graft.util.TmpDirs.scratch("graft_d36_spec_").toString
    val media = fixtureMedia
    graft.ops.IncrementalMedia.merge(spark, state,
      media.where(!col("name").contains("_")), codec = "wav-denergy")
    graft.ops.IncrementalMedia.merge(spark, state,
      media.where(col("name").contains("_")), codec = "wav-denergy")
    assert(collectPairs(graft.ops.IncrementalMedia.pairs(spark, state)) == goldenPairs)
    // a merge under a DIFFERENT codec must refuse: signatures are not
    // comparable across codecs, and the state dir's _CONFIG is the pin
    intercept[IllegalArgumentException] {
      graft.ops.IncrementalMedia.merge(spark, state, media)
    }
    intercept[IllegalArgumentException] {
      graft.ops.IncrementalMedia.merge(spark, state, media, codec = "mp3-chroma")
    }
  }

  test("d37: audio tombstone shadows, facade purge erases, re-ingest revives") {
    import spark.implicits._
    val state = graft.util.TmpDirs.scratch("graft_d37_spec_").toString
    val media = fixtureMedia
    graft.ops.IncrementalMedia.merge(spark, state, media, codec = "wav-denergy")
    graft.ops.Deletes.tombstone(spark, state, "audio", Seq("tonea.wav").toDF("name"))
    assert(collectPairs(graft.ops.IncrementalMedia.pairs(spark, state)) ==
      goldenPairs.filterNot(p => p._1 == "tonea.wav" || p._2 == "tonea.wav"))
    // physical erasure through the facade: post-compact, no generation
    // holds the deleted name's signature row
    graft.ops.Deletes.purge(spark, state, "audio", Seq("tonea.wav").toDF("name"))
    val live = graft.ops.IncrementalMedia.completeVersions(spark, state)
    val sigNames = spark.read.parquet(live.map(v => s"$state/v$v/sigs"): _*)
      .select("name").as[String].collect().toSet
    assert(!sigNames.contains("tonea.wav"), "purge must erase the signature row")
    // re-ingest after delete: the asset is live again and re-finds its
    // golden pairs against the surviving index
    graft.ops.IncrementalMedia.merge(spark, state,
      media.where($"name" === "tonea.wav"), codec = "wav-denergy")
    assert(collectPairs(graft.ops.IncrementalMedia.pairs(spark, state)) == goldenPairs)
  }

  test("q81: streamed audio merges drain to m8's one-shot pairs") {
    val out = graft.streaming.DocumentsStream.runAudioDedupAvailableNow(spark, sf0001)
    assert(collectPairs(out) == goldenPairs)
  }

  test("fuzz: mutated/truncated/garbage payloads decode to Some or None, never throw") {
    val rnd = new java.util.Random(42)
    val good = wav(Seq.tabulate(200)(i => (i * 37) % 1000 - 500))
    var decoded = 0
    (0 until 400).foreach { _ =>
      val b = good.clone()
      // flip 1-4 random bytes (header fields, chunk sizes, data alike)
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = (rnd.nextInt(256) - 128).toByte
      }
      if (Audio.decodeWav(b).isDefined) decoded += 1 // must not throw
    }
    (0 until 100).foreach { _ =>
      Audio.decodeWav(java.util.Arrays.copyOf(good, rnd.nextInt(good.length)))
      val junk = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(junk)
      Audio.decodeWav(junk)
    }
    // most single-byte flips hit the data chunk and still decode — the
    // fuzz is only a no-crash net, but assert it exercised BOTH outcomes
    assert(decoded > 0 && decoded < 400)
  }

  test("m8 vs m3-style exact hashing: sha256 misses every planted audio copy") {
    import org.apache.spark.sql.functions._
    val hashes = spark.read.format("binaryFile").load(Audio.wavFixtureDir)
      .select(sha2(col("content"), 256).as("h"))
      .groupBy("h").count().where(col("count") > 1).count()
    assert(hashes == 0, "no two fixtures share bytes — exact dedup finds nothing")
  }
}
