package graft

import org.apache.spark.sql.functions._

import graft.tools.MediaCorpus

/** Planted-recall gate for the media modalities at corpus size (the
  * checked-in golden fixtures pin the KERNELS on ≤6 assets; this pins the
  * blocked-Hamming INDEX GEOMETRY — candidate equi-join + exact verify —
  * against kernel ground truth on a generated corpus with planted
  * invariance pairs and a maximally hot signature block).
  */
class MediaCorpusSpec extends SparkSpec {

  private val nBase = 120

  private case class Mod(name: String,
    op: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
    codec: String, maxHamming: Int)

  private val mods = Seq(
    Mod("ppm", (s, d) => graft.ops.Multimodal.ppmNearDup(s, d), "ppm-dhash", 3),
    Mod("png", (s, d) => graft.ops.Png.imageNearDup(s, d), "png-dhash", 3),
    Mod("wav", (s, d) => graft.ops.Audio.wavNearDup(s, d), "wav-denergy", 3),
    Mod("y4m", (s, d) => graft.ops.Video.videoNearDup(s, d), "y4m-framehash", 6))

  private def corpus(mod: String): (String, Seq[MediaCorpus.Planted]) = {
    val dir = graft.util.TmpDirs.scratch(s"graft_mediacorpus_${mod}_").toString
    (dir, MediaCorpus.generate(spark, dir, mod, nBase, seed = 41L))
  }

  private def media(dir: String) =
    spark.read.format("binaryFile").load(dir)
      .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      .where(!col("name").startsWith("_"))

  for (m <- mods) {
    test(s"${m.name}: one-shot near-dup finds every planted pair on a $nBase-base corpus") {
      val (dir, planted) = corpus(m.name)
      assert(planted.size >= 10, s"generator planted too few pairs: ${planted.size}")
      val found = m.op(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val missing = planted.filterNot(p => found.contains((p.name1, p.name2)))
      assert(missing.isEmpty, s"planted pairs missed by the index: $missing")
      // the hot block: the 32-asset degenerate family shares ONE signature,
      // so all C(32,2) family pairs must be served (distance 0 shares every
      // block — any candidate cap that dropped them would show here)
      val flatPrefixes = found.filter { case (a, b) =>
        a.take(9) != b.take(9) && !a.contains("_") && !b.contains("_") }
      assert(flatPrefixes.size >= 32 * 31 / 2,
        s"hot-family clique incomplete: ${flatPrefixes.size} cross-asset pairs")
    }

    test(s"${m.name}: incremental split-ingest serves every planted pair (chassis recall)") {
      val (dir, planted) = corpus(m.name)
      val state = graft.util.TmpDirs.scratch(s"graft_mediacorpus_state_${m.name}_").toString
      val parity = pmod(xxhash64(col("name")), lit(2))
      graft.ops.IncrementalMedia.merge(spark, state, media(dir).where(parity === 0),
        maxHamming = m.maxHamming, codec = m.codec)
      graft.ops.IncrementalMedia.merge(spark, state, media(dir).where(parity === 1),
        maxHamming = m.maxHamming, codec = m.codec)
      val served = graft.ops.IncrementalMedia.pairs(spark, state).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val missing = planted.filterNot(p => served.contains((p.name1, p.name2)))
      assert(missing.isEmpty, s"planted pairs missed by the incremental chassis: $missing")
    }
  }

  test("the corpus is reproducible: a second generate call reuses _READY and the same manifest") {
    val dir = graft.util.TmpDirs.scratch("graft_mediacorpus_repro_").toString
    val first = MediaCorpus.generate(spark, dir, "ppm", nBase, seed = 41L)
    val again = MediaCorpus.generate(spark, dir, "ppm", nBase, seed = 41L)
    assert(first == again)
    assert(first.forall(p => p.dist <= 3))
  }

  test("generate refuses to delete a non-empty dir it did not create") {
    val dir = graft.util.TmpDirs.scratch("graft_mediacorpus_guard_")
    val precious = dir.resolve("users_data.txt")
    java.nio.file.Files.write(precious, "not a corpus".getBytes("UTF-8"))
    val ex = intercept[IllegalStateException] {
      MediaCorpus.generate(spark, dir.toString, "ppm", 4, seed = 41L)
    }
    assert(ex.getMessage.contains("refusing to delete"), ex.getMessage)
    assert(java.nio.file.Files.exists(precious), "the guard must not have deleted anything")
    // a torn write (corpus files + _PLANTED, no _READY) IS this tool's own
    // leftover: regeneration proceeds
    java.nio.file.Files.delete(precious)
    java.nio.file.Files.write(dir.resolve("_PLANTED"), Array.empty[Byte])
    java.nio.file.Files.write(dir.resolve("half.ppm"), Array.empty[Byte])
    MediaCorpus.generate(spark, dir.toString, "ppm", 4, seed = 41L)
    assert(java.nio.file.Files.exists(dir.resolve("_READY")),
      "regeneration over the tool's own torn write must proceed")
    assert(!java.nio.file.Files.exists(dir.resolve("half.ppm")),
      "the torn write's leftovers are swept by the regeneration")
  }
}
