package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.{IncrementalEmbedding, IncrementalIvfPq, IncrementalSemantic, Quantization, Similarity}

/** Corpus-growth measurement for the EMBEDDING-VECTOR state families —
  * the decade tables round 19's VERDICT asked for (text got
  * [[TextScaleProbe]]/[[MinHashScaleProbe]], media got
  * [[MediaScaleProbe]]; d14/d23/s15 rested on design argument + sf1
  * ratios only). Three families, same phase battery as the text probes
  * (one-shot / split-ingest / serve / fixed-1k-batch / delete+serve),
  * planted-twin recall as a hard distributed gate:
  *
  *   - **d14** ([[IncrementalEmbedding]], SRP-LSH near-dup): the probe
  *     GEARS the SRP plane count to the corpus — planes ≈ log2(n/25) —
  *     because the geometry is the scale dial: 2^planes buckets under the
  *     occupancy cap (default 100) forfeit recall once mean occupancy
  *     crosses the cap, so fixed planes=8 (256 buckets) caps out at
  *     ~25.6k spread vectors. This is d14's analog of d12's width=32 →
  *     width=64 migration; `planes` is regime-pinned in `_CONFIG` the
  *     same way.
  *   - **d23** ([[IncrementalSemantic]], SemDeDup): cells gear with the
  *     corpus (cells ≈ n/25 — the SemDeDup contract of clusters ∝ corpus)
  *     plus a FIXED-CELLS control arm that measures the quadratic
  *     within-cell regime a non-geared deployment walks into. Assignment
  *     is O(n·cells·dim) (the `ivf_probe` linear scan): geared cells make
  *     the candidate phase flat and move the budget into assignment —
  *     both ends of that trade are in the table.
  *   - **s15** ([[IncrementalIvfPq]]): write-only encode against the
  *     frozen 16-vector model; serve is the ADC scan. Expected flat
  *     ingest, linear serve; the probe puts numbers on it.
  *
  * Corpus: deterministic dim-64 float vectors, components hash-uniform in
  * [-1, 1] (cosine of two random vectors concentrates near 0 at dim 64,
  * so threshold-0.4 incidental pairs are ~absent and the planted 5%
  * IDENTICAL twins — cosine 1.0, same bucket/cell at any geometry — are a
  * hard recall gate, exactly the text probes' construction).
  *
  * Usage: runMain graft.tools.EmbeddingScaleProbe [d14|d23|s15|all] [sizes...]
  *   (default: all 10000 100000 1000000)
  */
object EmbeddingScaleProbe {

  private val dim = 64

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** vec(id): dim hash-uniform components in [-1, 1], fully codegen;
    * identical ids ⇒ identical vectors (twins are planted by reusing the
    * generator on the base id).
    */
  private def vecOf(id: Column): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      k => ((pmod(xxhash64(id, k), lit(2000001)).cast("double") /
        lit(1000000.0)) - lit(1.0)).cast("float"))

  /** The corpus dir holds ONE table, `embeddings.parquet` (vec_id,
    * embedding) — the [[graft.sources.Tables.embeddings]] shape, so the
    * centroid/model helpers read it directly. 5% planted twins: ids
    * n..n+n/20−1 duplicate ids 0, 20, 40, … exactly.
    */
  private def corpus(spark: SparkSession, n: Long): String = {
    val dir = s"/tmp/graft_vecscale_$n"
    if (!new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").exists()) {
      val base = spark.range(n)
        .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"))
      val twins = spark.range(n).where(pmod(col("id"), lit(20)) === 0)
        .select((col("id") + n).as("vec_id"), vecOf(col("id")).as("embedding"))
      base.unionAll(twins).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    dir
  }

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  private def planted(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).where(pmod(col("id"), lit(20)) === 0)
      .select(col("id").as("d1"), (col("id") + n).as("d2"))

  private def assertRecall(spark: SparkSession, labels: DataFrame, n: Long,
      tag: String): Unit = {
    val matched = planted(spark, n)
      .join(labels.toDF("d1", "c1"), "d1")
      .join(labels.toDF("d2", "c2"), "d2")
      .where(col("c1") === col("c2"))
      .count()
    val want = planted(spark, n).count()
    require(matched == want,
      s"$tag@$n: only $matched of $want planted twin pairs co-clustered " +
        "(missing-from-serve or split)")
  }

  /** planes ≈ log2(n / 25): target mean bucket occupancy ~25, far under
    * the cap (100) — 10k→9, 100k→12, 1M→16. Clamped to the expression's
    * [8, 32] dial range.
    */
  private def planesFor(n: Long): Int =
    math.min(32, math.max(8, math.ceil(math.log(n / 25.0) / math.log(2)).toInt))

  /** cells ≈ n/25 (held occupancy — the geared arm). */
  private def cellsFor(n: Long): Int = math.max(400, (n / 25).toInt)

  private def header(): Unit = {
    println("| n vecs | geometry | one-shot s | split-ingest s | serve s | fixed-1k-batch s | delete+serve s |")
    println("|---|---|---|---|---|---|---|")
  }

  private def ratios(rows: Seq[(Long, String, Double, Double, Double, Double, Double)]): Unit = {
    println("\ndecade ratios (step/previous; data grows 10x per step):")
    println("| step | one-shot | split-ingest | serve | fixed-1k-batch | delete+serve |")
    println("|---|---|---|---|---|---|")
    rows.sliding(2).foreach {
      case Seq(s, l) =>
        println(f"| ${s._1}→${l._1} | ${l._3 / s._3}%.1f | ${l._4 / s._4}%.1f | " +
          f"${l._5 / s._5}%.1f | ${l._6 / s._6}%.1f | ${l._7 / s._7}%.1f |")
      case _ => ()
    }
  }

  // ---- d14: SRP-LSH near-dup, planes geared to n -----------------------

  /** Twin pairs whose bucket crosses the occupancy cap are FORFEITED BY
    * DESIGN — in the one-shot and the incremental alike (the documented
    * cap contract: recall in a hot bucket is traded for bounded fan-out).
    * The hard gate is therefore 100% co-clustering of the COLD-bucket
    * twins, with the forfeit rate reported as its own scale observable:
    * geared planes must keep it small and roughly flat across decades
    * (SRP buckets on real data are skewed, so a thin hot tail persists at
    * any gear — that tail, not the mean, is what the cap prices).
    */
  private def coldPlanted(spark: SparkSession, dir: String, n: Long,
      planes: Int, cap: Int): (DataFrame, Long) = {
    val b = vecs(spark, dir).select(col("vec_id"),
      call_function("srp_bucket", col("embedding"), lit(planes)).as("bucket"))
    val hot = b.groupBy(col("bucket")).agg(count(lit(1)).as("occ"))
      .where(col("occ") > cap).select(col("bucket"))
    val forfeited = b.join(hot, "bucket").select(col("vec_id").as("d1"))
    val cold = planted(spark, n).join(forfeited, Seq("d1"), "left_anti")
    (cold, planted(spark, n).count() - cold.count())
  }

  private def assertRecallOf(spark: SparkSession, pairs: DataFrame,
      labels: DataFrame, tag: String): Unit = {
    val matched = pairs
      .join(labels.toDF("d1", "c1"), "d1")
      .join(labels.toDF("d2", "c2"), "d2")
      .where(col("c1") === col("c2"))
      .count()
    val want = pairs.count()
    require(matched == want,
      s"$tag: only $matched of $want cold-bucket twin pairs co-clustered " +
        "(missing-from-serve or split)")
  }

  private def runD14(spark: SparkSession, sizes: Seq[Long]): Unit = {
    println(s"\n## d14 IncrementalEmbedding (SRP-LSH), planes=log2(n/25)\n")
    header()
    val rows = for (n <- sizes) yield {
      val dir = corpus(spark, n)
      def all = vecs(spark, dir)
      all.count() // warm read + codegen
      val planes = planesFor(n)
      val cap = Similarity.maxBucketOccupancy
      val (cold, forfeited) = coldPlanted(spark, dir, n, planes, cap)
      val pct = 100.0 * forfeited / math.max(1L, planted(spark, n).count())
      println(f"<!-- d14@$n: $forfeited twin pairs (${pct}%.1f%%) in capped buckets — recall forfeited by design -->")

      val s1 = graft.util.TmpDirs.scratch(s"graft_embprobe_one_${n}_").toString
      val (_, tOne) = time {
        IncrementalEmbedding.merge(spark, s1, all, batchKey = Some("all"),
          planes = planes)
      }
      assertRecallOf(spark, cold, IncrementalEmbedding.clusters(spark, s1)
        .select(col("vec_id"), col("cluster_id")), s"d14-one-shot@$n")

      val s2 = graft.util.TmpDirs.scratch(s"graft_embprobe_split_${n}_").toString
      val parity = pmod(xxhash64(col("vec_id")), lit(2))
      val (_, tIngest) = time {
        IncrementalEmbedding.merge(spark, s2, all.where(parity === 0),
          batchKey = Some("h0"), planes = planes)
        IncrementalEmbedding.merge(spark, s2, all.where(parity === 1),
          batchKey = Some("h1"), planes = planes)
      }
      val (_, tServe) = time { IncrementalEmbedding.clusters(spark, s2).count() }
      assertRecallOf(spark, cold, IncrementalEmbedding.clusters(spark, s2)
        .select(col("vec_id"), col("cluster_id")), s"d14-split@$n")

      val fresh = spark.range(2L * n + 7, 2L * n + 7 + 1000)
        .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"))
      val (_, tBatch) = time {
        IncrementalEmbedding.merge(spark, s2, fresh, batchKey = Some("fix1k"),
          planes = planes)
        IncrementalEmbedding.clusters(spark, s2).count()
      }

      val victims = spark.range(n).where(pmod(col("id"), lit(100)) === 0)
        .select(col("id").as("vec_id"))
      val (_, tDel) = time {
        IncrementalEmbedding.delete(spark, s2, victims)
        IncrementalEmbedding.clusters(spark, s2).count()
      }
      val dead = IncrementalEmbedding.clusters(spark, s2)
        .join(victims, "vec_id").count()
      require(dead == 0, s"d14-delete@$n: $dead tombstoned vecs survive the serve")

      println(f"| $n | planes=$planes | $tOne%.2f | $tIngest%.2f | $tServe%.2f | $tBatch%.2f | $tDel%.2f |")
      (n, s"planes=$planes", tOne, tIngest, tServe, tBatch, tDel)
    }
    ratios(rows)
  }

  // ---- d23: SemDeDup, geared cells + fixed-cells control ----------------

  private def runD23(spark: SparkSession, allSizes: Seq[Long]): Unit = {
    // NO SILENT CAP: the geared arm holds occupancy by growing cells with
    // n, so the ivf_probe assignment is O(n·cells·dim) = O(n²·dim/25) —
    // measured 19x per decade at 100k (61s one-shot). A 1M geared run
    // would spend hours proving the same exponent; the boundary IS the
    // result, so sizes past 100k are dropped here and the conclusion
    // (assignment needs a sub-linear scan — hierarchical / ANN-assisted —
    // past ~100k geared vectors) goes to SCALE.md with the two-decade
    // numbers.
    val sizes = allSizes.filter(_ <= 100000L)
    allSizes.filterNot(_ <= 100000L).foreach(n =>
      println(s"<!-- d23@$n SKIPPED: geared assignment is O(n·cells·dim); " +
        "see the SCALE.md boundary note -->"))
    println(s"\n## d23 IncrementalSemantic (SemDeDup), cells=n/25 (geared)\n")
    header()
    val rows = for (n <- sizes) yield {
      val dir = corpus(spark, n)
      def all = vecs(spark, dir)
      all.count()
      val cells = cellsFor(n)
      val cents = Similarity.firstKCentroids(spark, dir, cells)

      val s1 = graft.util.TmpDirs.scratch(s"graft_semprobe_one_${n}_").toString
      val (_, tOne) = time {
        IncrementalSemantic.merge(spark, s1, cents, all, batchKey = Some("all"))
      }
      assertRecall(spark, IncrementalSemantic.clusters(spark, s1)
        .select(col("vec_id"), col("cluster_id")), n, "d23-one-shot")

      val s2 = graft.util.TmpDirs.scratch(s"graft_semprobe_split_${n}_").toString
      val parity = pmod(xxhash64(col("vec_id")), lit(2))
      val (_, tIngest) = time {
        IncrementalSemantic.merge(spark, s2, cents, all.where(parity === 0),
          batchKey = Some("h0"))
        IncrementalSemantic.merge(spark, s2, cents, all.where(parity === 1),
          batchKey = Some("h1"))
      }
      val (_, tServe) = time { IncrementalSemantic.clusters(spark, s2).count() }
      assertRecall(spark, IncrementalSemantic.clusters(spark, s2)
        .select(col("vec_id"), col("cluster_id")), n, "d23-split")

      val fresh = spark.range(2L * n + 7, 2L * n + 7 + 1000)
        .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"))
      val (_, tBatch) = time {
        IncrementalSemantic.merge(spark, s2, cents, fresh, batchKey = Some("fix1k"))
        IncrementalSemantic.clusters(spark, s2).count()
      }

      val victims = spark.range(n).where(pmod(col("id"), lit(100)) === 0)
        .select(col("id").as("vec_id"))
      val (_, tDel) = time {
        IncrementalSemantic.delete(spark, s2, victims)
        IncrementalSemantic.clusters(spark, s2).count()
      }
      val dead = IncrementalSemantic.clusters(spark, s2)
        .join(victims, "vec_id").count()
      require(dead == 0, s"d23-delete@$n: $dead tombstoned vecs survive the serve")

      println(f"| $n | cells=$cells | $tOne%.2f | $tIngest%.2f | $tServe%.2f | $tBatch%.2f | $tDel%.2f |")
      (n, s"cells=$cells", tOne, tIngest, tServe, tBatch, tDel)
    }
    ratios(rows)

    // CONTROL ARM: cells pinned at the smallest size's gear — the
    // quadratic within-cell regime a non-geared deployment walks into
    // (occupancy = n/cells grows 10x per decade; candidate pairs are
    // n·occupancy, so the one-shot grows ~100x per decade in the limit).
    // Sizes capped at 100k: the point is the measured RATIO, and the
    // 1M fixed-cells arm would burn an hour proving what the 100k ratio
    // already shows.
    val ctrlSizes = sizes.filter(_ <= 100000L)
    if (ctrlSizes.size >= 2) {
      val cells = cellsFor(ctrlSizes.head)
      println(s"\n### d23 CONTROL: cells FIXED at ${cells} (ungeared)\n")
      println("| n vecs | one-shot s | occupancy |")
      println("|---|---|---|")
      val ctrl = for (n <- ctrlSizes) yield {
        val dir = corpus(spark, n)
        val cents = Similarity.firstKCentroids(spark, dir, cells)
        val s1 = graft.util.TmpDirs.scratch(s"graft_semctrl_${n}_").toString
        val (_, tOne) = time {
          IncrementalSemantic.merge(spark, s1, cents, vecs(spark, dir),
            batchKey = Some("all"))
        }
        println(f"| $n | $tOne%.2f | ~${n / cells} |")
        (n, tOne)
      }
      ctrl.sliding(2).foreach {
        case Seq(s, l) =>
          println(f"\nfixed-cells one-shot decade ratio ${s._1}→${l._1}: ${l._2 / s._2}%.1fx")
        case _ => ()
      }
    }
  }

  // ---- s15: IVF-PQ, frozen 16-vector model ------------------------------

  private def runS15(spark: SparkSession, sizes: Seq[Long]): Unit = {
    println(s"\n## s15 IncrementalIvfPq (frozen ${Quantization.pqCodes}-vector model)\n")
    println("| n vecs | one-shot s | split-ingest s | serve(topk) s | fixed-1k-batch s | delete+serve s |")
    println("|---|---|---|---|---|---|")
    val nQ = 100 // queries 0..99 → twin queries 0, 20, 40, 60, 80
    val k = 10
    val rows = for (n <- sizes) yield {
      val dir = corpus(spark, n)
      def all = vecs(spark, dir)
      all.count()
      val model = graft.util.TmpDirs.scratch(s"graft_pqprobe_model_${n}_").toString + "/m"
      IncrementalIvfPq.persistedRefVectors(spark, dir, model)

      def gateRecall(state: String, tag: String): Unit = {
        val top = IncrementalIvfPq.annTopK(spark, dir, state, model, nQ, k)
          .select(col("qid"), col("vec_id"))
        val hits = planted(spark, n).where(col("d1") < nQ)
          .join(top, col("d1") === col("qid") && col("d2") === col("vec_id"))
          .count()
        val want = planted(spark, n).where(col("d1") < nQ).count()
        require(hits == want,
          s"$tag@$n: only $hits of $want planted twins surfaced in top-$k " +
            "for their twin queries")
      }

      val s1 = graft.util.TmpDirs.scratch(s"graft_pqprobe_one_${n}_").toString
      val (_, tOne) = time {
        IncrementalIvfPq.merge(spark, s1, model, all, batchKey = Some("all"))
      }
      gateRecall(s1, "s15-one-shot")

      val s2 = graft.util.TmpDirs.scratch(s"graft_pqprobe_split_${n}_").toString
      val parity = pmod(xxhash64(col("vec_id")), lit(2))
      val (_, tIngest) = time {
        IncrementalIvfPq.merge(spark, s2, model, all.where(parity === 0),
          batchKey = Some("h0"))
        IncrementalIvfPq.merge(spark, s2, model, all.where(parity === 1),
          batchKey = Some("h1"))
      }
      val (_, tServe) = time {
        IncrementalIvfPq.annTopK(spark, dir, s2, model, nQ, k).count()
      }
      gateRecall(s2, "s15-split")

      val fresh = spark.range(2L * n + 7, 2L * n + 7 + 1000)
        .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"))
      val (_, tBatch) = time {
        IncrementalIvfPq.merge(spark, s2, model, fresh, batchKey = Some("fix1k"))
        IncrementalIvfPq.annTopK(spark, dir, s2, model, nQ, k).count()
      }

      // delete the TWINS of the twin queries: the serve must stop
      // surfacing them (tombstone shadowing), the strongest delete gate
      val victims = planted(spark, n).where(col("d1") < nQ)
        .select(col("d2").as("vec_id"))
      val (_, tDel) = time {
        IncrementalIvfPq.delete(spark, s2, victims)
        IncrementalIvfPq.annTopK(spark, dir, s2, model, nQ, k).count()
      }
      val ghosts = IncrementalIvfPq.annTopK(spark, dir, s2, model, nQ, k)
        .join(victims, "vec_id").count()
      require(ghosts == 0, s"s15-delete@$n: $ghosts tombstoned vecs still served")

      println(f"| $n | $tOne%.2f | $tIngest%.2f | $tServe%.2f | $tBatch%.2f | $tDel%.2f |")
      (n, "", tOne, tIngest, tServe, tBatch, tDel)
    }
    ratios(rows)
  }

  def main(args: Array[String]): Unit = {
    val (fam, rest) = args.headOption match {
      case Some(f @ ("d14" | "d23" | "s15" | "all")) => (f, args.drop(1))
      case _ => ("all", args)
    }
    val sizes = if (rest.nonEmpty) rest.toSeq.map(_.toLong)
      else Seq(10000L, 100000L, 1000000L)
    val spark = GraftSession.create("embedding-scale-probe")
    if (fam == "all" || fam == "d14") runD14(spark, sizes)
    if (fam == "all" || fam == "d23") runD23(spark, sizes)
    if (fam == "all" || fam == "s15") runS15(spark, sizes)
    spark.stop()
  }
}
