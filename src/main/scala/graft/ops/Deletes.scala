package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-call right-to-be-forgotten facade over the thirteen stateful
  * modalities' tombstone deletes. Every modality shares the same
  * semantics — write a tombstone generation, shadow at read, purge at
  * compact, revive on re-ingest — but each has its own entry point and id
  * column; this dispatcher normalizes both, so a GDPR sweep over a
  * multi-modality corpus is ONE loop over (stateDir, modality) pairs
  * instead of thirteen call sites.
  *
  * `ids` must be a single-column DataFrame; the column is renamed to
  * whatever the target modality stores (doc_id / vec_id / name), so the
  * same frame drives text, embedding, and media deletes in one sweep.
  */
object Deletes {

  /** modality name → (expected id column, delete entry point) */
  val modalities: Map[String, (String, (SparkSession, String, DataFrame) => Int)] = Map(
    "exact" -> (("doc_id", (s, d, ids) => IncrementalExact.delete(s, d, ids))),
    "cluster" -> (("doc_id", IncrementalDedup.delete _)),
    "minhash" -> (("doc_id", IncrementalMinHash.delete _)),
    "substring" -> (("doc_id", IncrementalSubstring.delete _)),
    "embedding" -> (("vec_id", IncrementalEmbedding.delete _)),
    "semantic" -> (("vec_id", IncrementalSemantic.delete _)),
    "ivf" -> (("vec_id", IncrementalIvf.delete _)),
    "ivfpq" -> (("vec_id", IncrementalIvfPq.delete _)),
    "media" -> (("name", IncrementalMedia.delete _)),
    "rotmedia" -> (("name", IncrementalRotMedia.delete _)),
    "dsir" -> (("doc_id", IncrementalDsir.delete _)),
    "classifier" -> (("doc_id", IncrementalClassifier.delete _)),
    "card" -> (("doc_id", IncrementalCard.delete _)))

  /** Tombstone `ids` in the state dir of one `modality`. Returns the new
    * tombstone generation. Unknown modalities fail fast with the known
    * set (a sweep that silently skipped a store would defeat the point).
    */
  def tombstone(spark: SparkSession, stateDir: String, modality: String,
      ids: DataFrame): Int = {
    val (idCol, fn) = modalities.getOrElse(modality,
      throw new IllegalArgumentException(
        s"Deletes.tombstone: unknown modality '$modality' — known: " +
          modalities.keys.toSeq.sorted.mkString(", ")))
    require(ids.columns.length == 1,
      s"Deletes.tombstone: ids must be a single-column frame, got " +
        s"(${ids.columns.mkString(", ")})")
    fn(spark, stateDir, ids.toDF(idCol))
  }

  /** The GDPR sweep: tombstone the same ids across every (stateDir,
    * modality) pair, one loop. Returns modality-tagged tombstone
    * generations per state dir. Fails on the FIRST store that cannot
    * serve the delete (e.g. a pre-sidecar legacy dir) — a partial sweep
    * that looked complete would be worse than a loud stop.
    */
  def sweep(spark: SparkSession, stores: Seq[(String, String)],
      ids: DataFrame): Seq[(String, String, Int)] =
    stores.map { case (stateDir, modality) =>
      (stateDir, modality, tombstone(spark, stateDir, modality, ids))
    }
}
