package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

import graft.ops.Similarity

/** Scale-safe embedding candidate geometry (the round-8 weak family):
  *
  *   1. hot buckets are CAPPED — a degenerate bucket (mode-collapsed
  *      encoder region) past [[Similarity.maxBucketOccupancy]] generates
  *      zero candidate pairs instead of O(occ²);
  *   2. the candidate join is SLIM — no exchange below the pair phase
  *      carries an embedding column (vectors are joined back by vec_id
  *      only for surviving pairs);
  *   3. the SRP plane count is a dial — `srp_bucket(e, n)` widths are
  *      prefix-consistent, so banding one wide signature is sound, and
  *      the banded OR-construction (d16) is a recall superset of the
  *      single-bucket pairs (d6).
  */
class EmbeddingGeometrySpec extends SparkSpec {

  /** Every Exchange (shuffle or broadcast) in the executed plan, including
    * inside AQE's wrapped subtrees.
    */
  private def exchanges(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      // AQE hides finalized exchanges inside leaf query stages
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    (p match {
      case e: Exchange => Seq(e)
      case r: ReusedExchangeExec => Seq(r)
      case _ => Nil
    }) ++ kids.flatMap(exchanges)
  }

  test("planted hot bucket: candidate pairs are capped, not quadratic") {
    import spark.implicits._
    // 150 copies of one direction (one hot bucket, occupancy > cap) plus
    // two genuine near-dup pairs in distinct buckets
    val hot = (0 until 150).map(i => (i.toLong, Array(1.0f, 2.0f, 3.0f, 4.0f)))
    val cold = Seq(
      (1000L, Array(-1.0f, 5.0f, -2.0f, 0.5f)), (1001L, Array(-1.0f, 5.1f, -2.0f, 0.5f)),
      (2000L, Array(4.0f, -3.0f, 1.0f, -6.0f)), (2001L, Array(4.1f, -3.0f, 1.0f, -6.0f)))
    val dirless = (hot ++ cold).toDF("vec_id", "embedding")
    dirless.createOrReplaceTempView("geom_embeddings")

    // same construction as cappedCandidatePairs, against the temp view
    val slim = spark.table("geom_embeddings")
      .select(col("vec_id"), call_function("srp_bucket", col("embedding")).as("bucket"))
      .repartition(col("bucket"))
    val coldB = slim.groupBy(col("bucket")).agg(count(lit(1)).as("occ"))
      .where(col("occ") <= Similarity.maxBucketOccupancy).select(col("bucket"))
    val c = slim.join(broadcast(coldB), "bucket")
    val pairs = c.as("a").join(c.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // the hot bucket's 150·149/2 = 11175 pairs are GONE; the cold pairs
    // survive (cap bounds cost without touching ordinary buckets)
    assert(!got.exists(_._1 < 150), s"hot-bucket pairs leaked: ${got.take(5)}")
    assert(got.contains((1000L, 1001L)) && got.contains((2000L, 2001L)),
      s"cold-bucket near-dup candidates lost: $got")
    assert(got.size <= 4, s"unexpected candidate blow-up: ${got.size} pairs")
  }

  private def assertSlimExchanges(df: DataFrame, what: String): Unit = {
    df.collect() // force AQE to finalize the real plan
    val exs = exchanges(df.queryExecution.executedPlan)
    assert(exs.nonEmpty, s"$what: expected at least one exchange")
    for (e <- exs; a <- e.output) {
      assert(!a.dataType.isInstanceOf[ArrayType],
        s"$what: exchange carries array column '${a.name}' — candidate " +
          s"phase must be slim:\n${e.treeString}")
    }
  }

  test("d6 candidate phase: no exchange carries an embedding column") {
    assertSlimExchanges(Similarity.cappedCandidatePairs(spark, sf0001),
      "d6 cappedCandidatePairs")
  }

  test("d14 candidate phase: generation scans pruned to (vec_id, bucket); slim exchanges") {
    val state = graft.util.TmpDirs.scratch("graft_geom_d14_").toString
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    graft.ops.IncrementalEmbedding.merge(spark, state,
      vecs.where(pmod(col("vec_id"), lit(2)) === 0))
    graft.ops.IncrementalEmbedding.merge(spark, state,
      vecs.where(pmod(col("vec_id"), lit(2)) === 1))

    // the candidate frame exactly as merge builds it over the committed
    // generations
    val paths = graft.ops.IncrementalEmbedding.completeVersions(spark, state)
      .map(v => s"$state/v$v/vecs")
    val slimNew = spark.read.parquet(paths.last).select(col("vec_id"), col("bucket"))
    val slimAll = spark.read.parquet(paths: _*).select(col("vec_id"), col("bucket"))
    val cand = graft.ops.IncrementalEmbedding.candidatePairs(slimNew, slimAll,
      Similarity.maxBucketOccupancy)
    assertSlimExchanges(cand, "d14 candidatePairs")

    // column pruning reached the parquet scan: ReadSchema has no `e`
    val scans = cand.queryExecution.executedPlan.toString
    val readSchemas = "ReadSchema: [^\\n]+".r.findAllIn(scans).toSeq
    assert(readSchemas.nonEmpty)
    assert(readSchemas.forall(s => !s.contains("e:array")),
      s"generation scan reads the vector payload in the candidate phase:\n$readSchemas")
  }

  test("srp_bucket widths are prefix-consistent; banded pairs (d16) ⊇ bucket pairs (d6)") {
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val bad = e.select(
        call_function("srp_bucket", col("embedding")).as("b8"),
        call_function("srp_bucket", col("embedding"), lit(32)).as("b32"))
      .where(substring(col("b32"), 1, 8) =!= col("b8")).count()
    assert(bad == 0, "8-plane bucket is not a prefix of the 32-plane signature")

    val d6 = Similarity.embeddingNearDupPairs(spark, sf0001)
      .select("v1", "v2").collect().map(_.toSeq).toSet
    val d16 = Similarity.srpBandedPairs(spark, sf0001)
      .select("v1", "v2").collect().map(_.toSeq).toSet
    assert(d6.subsetOf(d16),
      s"band 0 equals the d6 bucket, so d16 must be a superset; missing: ${d6 -- d16}")
  }

  test("d14 planes dial: refined-geometry recall ⊆ default; split = one-shot at the gear; in-place flips REFUSED") {
    // planes is state geometry (buckets persist in vecs) — the d12 width
    // contract: pin in _CONFIG, refuse a mixed-regime merge both ways,
    // migrate by re-ingest into a fresh dir. Recall is NOT gear-invariant
    // for non-identical near-dups: srp_bucket is prefix-consistent (test
    // above), so 16 planes REFINE the 8-plane buckets and a pair split by
    // the extra 8 sign bits loses its candidate — the recall/fan-out
    // trade the dial exists to price. The invariants that DO hold:
    // (1) every geared co-clustered pair is co-clustered at the default
    //     gear (refinement ⇒ candidate subset, on a corpus with no hot
    //     bucket at either gear — identical twins stay together at any
    //     gear since equal vectors share every sign bit);
    // (2) incremental = one-shot AT the same gear (the d11 parity
    //     contract is per-geometry).
    import graft.ops.IncrementalEmbedding
    val e = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    def half(p: Int) = e.where(pmod(col("vec_id"), lit(2)) === p)
    val s8 = graft.util.TmpDirs.scratch("graft_planes8_").toString
    IncrementalEmbedding.merge(spark, s8, half(0), batchKey = Some("b0"))
    IncrementalEmbedding.merge(spark, s8, half(1), batchKey = Some("b1"))
    val s16 = graft.util.TmpDirs.scratch("graft_planes16_").toString
    IncrementalEmbedding.merge(spark, s16, half(0), batchKey = Some("b0"), planes = 16)
    IncrementalEmbedding.merge(spark, s16, half(1), batchKey = Some("b1"), planes = 16)
    def pairsOf(state: String): Set[(Long, Long)] = {
      val lab = IncrementalEmbedding.clusters(spark, state)
        .select(col("vec_id"), col("cluster_id"))
      lab.as("a").join(lab.as("b"),
          col("a.cluster_id") === col("b.cluster_id") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val (p8, p16) = (pairsOf(s8), pairsOf(s16))
    assert(p16.subsetOf(p8),
      s"refined-gear pairs must be a subset of the default gear's; extra: ${p16 -- p8}")
    val one16 = graft.util.TmpDirs.scratch("graft_planes16one_").toString
    IncrementalEmbedding.merge(spark, one16, e, batchKey = Some("all"), planes = 16)
    assert(pairsOf(one16) == p16,
      "incremental at planes=16 must equal the one-shot at planes=16")
    // both flip directions refuse before writing anything
    val up = intercept[IllegalArgumentException] {
      IncrementalEmbedding.merge(spark, s8, e.limit(0), batchKey = Some("b2"), planes = 16)
    }
    assert(up.getMessage.contains("mixed parameters"), up.getMessage)
    val down = intercept[IllegalArgumentException] {
      IncrementalEmbedding.merge(spark, s16, e.limit(0), batchKey = Some("b2"))
    }
    assert(down.getMessage.contains("mixed parameters"), down.getMessage)
  }

  test("s10 recall audit equals an independent set computation over s1/s3") {
    val got = graft.ops.Similarity.annRecallAudit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // independent path: collect both verified top-k tables, compute the
    // per-query intersection with plain Scala sets
    def sets(df: org.apache.spark.sql.DataFrame) = df
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets(graft.ops.Similarity.cosineTopK(spark, sf0001))
    val approx = sets(graft.ops.Similarity.annIvf(spark, sf0001))
    val want = exact.toSeq.sortBy(_._1).map { case (qid, ex) =>
      val hit = (ex intersect approx.getOrElse(qid, Set.empty)).size.toLong
      (qid, ex.size.toLong,  hit,
        BigDecimal(hit.toDouble / ex.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got == want)
    // audit sanity: 10 sampled queries, recall in [0,1], k rows of exact each
    assert(got.size == 10 && got.forall(r => r._2 == 3 && r._4 >= 0.0 && r._4 <= 1.0))
  }
}
