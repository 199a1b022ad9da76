package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{Corpus, Dedup}

/** Properties of the corpus-management ops (chunking, sampling, KMV) and
  * the dup-cluster labeling — invariants, not just row pins.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("chunking covers every token: sum of unique positions == doc token count") {
    val chunks = Corpus.chunk(spark, sf0001)
    // chunk c covers token positions [c*stride+1, c*stride+len]; the union
    // over chunks must be exactly [1, n] — verified by checking the first
    // chunk starts at 1, consecutive chunks overlap or touch, and the last
    // chunk reaches n.
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(filter(split(col("text"), " "), t => t =!= "")).as("n"))
    val spans = chunks
      .select(col("doc_id"), col("chunk_no"),
        (col("chunk_no") * Corpus.strideTokens + 1).as("lo"),
        (col("chunk_no") * Corpus.strideTokens + col("n_tokens")).as("hi"))
    val bad = spans.as("s")
      .join(docs.as("d"), "doc_id")
      .groupBy(col("doc_id"), col("d.n"))
      .agg(min(col("lo")).as("minLo"), max(col("hi")).as("maxHi"),
        max(col("lo")).as("lastLo"))
      .where(col("minLo") =!= 1 || col("maxHi") =!= col("n") ||
        col("lastLo") > col("n"))
    assert(bad.count() == 0)
  }

  test("chunk geometry: all chunks full-width except possibly the last; overlap constant") {
    val chunks = Corpus.chunk(spark, sf0001).cache()
    val lastNo = chunks.groupBy("doc_id").agg(max("chunk_no").as("last"))
    val nonLast = chunks.join(lastNo, "doc_id").where(col("chunk_no") < col("last"))
    assert(nonLast.where(col("n_tokens") =!= Corpus.chunkTokens).count() == 0)
    chunks.unpersist()
  }

  test("hash sampling is deterministic and respects per-stratum rates") {
    val a = Corpus.hashSample(spark, sf0001).collect()
    val b = Corpus.hashSample(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq) // repeatable, not rand()
    // every kept bucket is under its stratum's rate
    a.foreach { case Row(_, lang: String, bucket: Int) =>
      val rate = Corpus.sampleRates.getOrElse(lang, Corpus.defaultRate)
      assert(bucket < rate, s"$lang bucket $bucket >= rate $rate")
    }
  }

  test("KMV estimate: within 3 standard errors of exact; degenerates below k") {
    val rows = Corpus.kmvEstimate(spark, sf0001).collect()
    val se = 1.0 / math.sqrt(Corpus.kmvK - 2.0)
    rows.foreach { case Row(lang: String, exact: Long, est: Double) =>
      if (exact < Corpus.kmvK) assert(est == exact.toDouble)
      else {
        val rel = math.abs(est - exact) / exact
        assert(rel < 3 * se, s"$lang estimate $est vs exact $exact (rel err $rel)")
      }
    }
  }

  test("dup clusters: labels are reflexive-transitive closures of the pair graph") {
    val clusters = Dedup.dupClusters(spark, sf0001).cache()
    val pairs = Dedup.simhashPairs(spark, sf0001).select("d1", "d2").cache()
    // 1. every endpoint of every pair is labeled, both ends in SAME cluster
    val lab = clusters.select(col("doc_id"), col("cluster_id"))
    val split = pairs
      .join(lab.withColumnRenamed("doc_id", "d1").withColumnRenamed("cluster_id", "c1"), "d1")
      .join(lab.withColumnRenamed("doc_id", "d2").withColumnRenamed("cluster_id", "c2"), "d2")
      .where(col("c1") =!= col("c2"))
    assert(split.count() == 0, "a near-dup pair straddles two clusters")
    // 2. cluster_id is the min doc_id of its members (canonical keeper)
    val minOfCluster = clusters.groupBy("cluster_id").agg(min("doc_id").as("m"))
      .where(col("cluster_id") =!= col("m"))
    assert(minOfCluster.count() == 0)
    // 3. exactly one keeper per cluster
    val keepers = clusters.where(col("is_keeper") === 1)
      .groupBy("cluster_id").count().where(col("count") =!= 1)
    assert(keepers.count() == 0)
    // 4. cluster sizes sum to the number of clustered docs
    val n = clusters.count()
    val sumSizes = clusters.select(col("cluster_id"), col("cluster_size")).distinct()
      .agg(sum("cluster_size")).head().getLong(0)
    assert(sumSizes == n)
    clusters.unpersist(); pairs.unpersist()
  }

  test("streaming dedup equals batch distinct on the same keys") {
    val streamed = graft.streaming.EventsStream.runDedupAvailableNow(spark, sf0001)
    val batch = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("ts").cast("date").as("day_ts"))
      .distinct()
      .orderBy(col("user_id"), col("event_type"), col("day_ts"))
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("train/val/test split: partitions the corpus, deterministic, ~90/5/5") {
    val rows = Corpus.trainValTestSplit(spark, sf0001).collect()
    val bySplit = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.values.sum == 500L, "every document must land in exactly one split")
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    // deterministic: a second run produces identical counts
    assert(Corpus.trainValTestSplit(spark, sf0001).collect().toSeq == rows.toSeq)
  }
  test("c7 curation: total partition, precedence, and every rule reachable") {
    val v = Corpus.curate(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val total = graft.sources.Tables.documents(spark, sf0001).count()
    assert(v.length == total, "every document must receive exactly one verdict")
    val labels = Set("benchmark", "quality", "duplicate", "contaminated", "keep")
    assert(v.map(_._2).toSet.subsetOf(labels))
    // benchmark slice is dropped wholesale, regardless of other gates
    val benchIds = graft.sources.Tables.documents(spark, sf0001)
      .where(col("source") === Corpus.benchmarkSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(benchIds.nonEmpty)
    v.filter(x => benchIds.contains(x._1)).foreach { case (_, verdict) =>
      assert(verdict == "benchmark")
    }
    // curation must actually drop something and keep something
    assert(v.exists(_._2 == "keep"))
    assert(v.exists(_._2 != "keep"))
    // precedence: a non-keeper duplicate that also fails quality reports
    // 'quality' (first matching rule wins) -- verified structurally: no
    // doc in the duplicate label set AND failing quality reports 'duplicate'
    val dupSet = graft.ops.Dedup.dupClusters(spark, sf0001)
      .where(col("is_keeper") === 0).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val qualityDocs = v.filter(_._2 == "quality").map(_._1).toSet
    assert(v.filter(x => x._2 == "duplicate").forall(x => !qualityDocs.contains(x._1)))
    assert(dupSet.nonEmpty)
  }

  test("c9: registry screening is batch-split-invariant and never re-reads the benchmark") {
    import org.apache.spark.sql.functions._
    val reg = graft.util.TmpDirs.scratch("graft_c9_spec_reg_").toString
    Corpus.buildContaminationRegistry(spark, sf0001, reg)
    val train = graft.sources.Tables.documents(spark, sf0001)
      .where(col("source") =!= Corpus.benchmarkSource)
    // per-batch screening unioned over a 3-way split == the one-shot c3
    val parts = (0 until 3).map(r =>
      Corpus.contaminationAgainst(spark, reg,
        train.where(pmod(col("doc_id"), lit(3)) === r)))
    val got = parts.reduce(_ unionByName _)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val want = Corpus.contamination(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == want && want.nonEmpty)
    // the screening plan reads the registry parquet instead of the
    // benchmark corpus: with a batch that carries no source predicate of
    // its own, the benchmark source literal appears NOWHERE in the plan
    // (c3's one-shot plan filters on it to build the bench side)
    val sourceFree = graft.sources.Tables.documents(spark, sf0001)
      .where(col("doc_id") < 50).select(col("doc_id"), col("text"))
    val plan = Corpus.contaminationAgainst(spark, reg, sourceFree)
      .queryExecution.executedPlan.toString
    assert(!plan.contains(Corpus.benchmarkSource),
      s"screening re-reads the benchmark corpus:\n$plan")
    val oneShot = Corpus.contamination(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(oneShot.contains(Corpus.benchmarkSource),
      "sanity: the one-shot plan does filter on the benchmark source")
    // idempotent build: a second build call is a no-op (marker exists)
    val f = graft.ops.GenState.fs(spark, reg)
    val m = new org.apache.hadoop.fs.Path(reg, "_SUCCESS")
    val before = f.getFileStatus(m).getModificationTime
    Corpus.buildContaminationRegistry(spark, sf0001, reg)
    assert(f.getFileStatus(m).getModificationTime == before)
  }

  test("c10: append-then-screen == rebuild-then-screen, any suite split; compaction invariant") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val bench = docs.where(col("source") === Corpus.benchmarkSource)
    val train = docs.where(col("source") =!= Corpus.benchmarkSource)
    val want = Corpus.contamination(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(want.nonEmpty)
    for (mod <- Seq(2, 3)) {
      val reg = graft.util.TmpDirs.scratch(s"graft_c10_spec_${mod}_").toString
      (0 until mod).foreach { r =>
        Corpus.appendContaminationRegistry(spark, reg,
          bench.where(pmod(col("doc_id"), lit(mod)) === r))
      }
      val got = Corpus.contaminationAgainstRegistry(spark, reg, train)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(got == want, s"$mod-suite append diverged from the one-shot registry")
    }
    // overlapping suites (the same benchmark appended twice) change
    // nothing: the registry is a set
    val reg = graft.util.TmpDirs.scratch("graft_c10_spec_dup_").toString
    Corpus.appendContaminationRegistry(spark, reg, bench)
    Corpus.appendContaminationRegistry(spark, reg, bench)
    assert(Corpus.contaminationAgainstRegistry(spark, reg, train)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == want)
    // compaction folds to ONE generation and screening is unchanged
    val v = Corpus.compactRegistry(spark, reg)
    assert(graft.ops.GenState.completeVersions(spark, reg, "shingles") == Seq(v))
    assert(Corpus.contaminationAgainstRegistry(spark, reg, train)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == want)
    // a later suite appends on top of the compacted generation
    Corpus.appendContaminationRegistry(spark, reg, bench.limit(1))
    assert(Corpus.contaminationAgainstRegistry(spark, reg, train)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == want)
  }

  test("c16: Bloom-screened gate == exact screening; the exact set joins Bloom survivors only") {
    import org.apache.spark.sql.functions._
    val reg = graft.util.TmpDirs.scratch("graft_c16_spec_reg_").toString
    Corpus.buildContaminationRegistry(spark, sf0001, reg)
    Corpus.buildRegistryBloom(spark, reg)
    val train = graft.sources.Tables.documents(spark, sf0001)
      .where(col("source") =!= Corpus.benchmarkSource)
    // VALUE-IDENTICAL to the exact broadcast screen: false positives are
    // verified away by the exact join, false negatives cannot exist
    val got = Corpus.contaminationBloomScreened(spark, reg, train)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val want = Corpus.contaminationAgainst(spark, reg, train)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == want && want.nonEmpty)
    // plan pin: the might_contain probe FILTERS the corpus side BELOW the
    // exact-set join — the registry strings meet only Bloom survivors.
    // Walk the optimized plan: every Join whose subtree reads the registry
    // must carry the bloom filter on its other input's subtree.
    val plan = Corpus.contaminationBloomScreened(spark, reg, train)
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    def subtree(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = p.toString
    val regJoins = joins.filter(j =>
      subtree(j.left).contains("might_contain") || subtree(j.right).contains("might_contain"))
    assert(regJoins.nonEmpty, s"no join has a Bloom-screened input:\n$plan")
    // and the probe is a pre-join FILTER, not a post-join condition
    val filters = plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.contains("might_contain") => f }
    assert(filters.nonEmpty, s"might_contain did not survive as a filter:\n$plan")
    // the build is idempotent (artifact cached beside the c9 registry)
    val f = graft.ops.GenState.fs(spark, reg)
    val m = new org.apache.hadoop.fs.Path(reg, "_BLOOM")
    val before = f.getFileStatus(m).getModificationTime
    Corpus.buildRegistryBloom(spark, reg)
    assert(f.getFileStatus(m).getModificationTime == before)
    // staleness: if the registry's parquet files change under a cached
    // filter, reads must REFUSE (a stale filter silently produces false
    // negatives — missed contamination) and the next build must repair
    val part = f.listStatus(new org.apache.hadoop.fs.Path(reg)).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".")).head.getPath
    f.setTimes(part, System.currentTimeMillis() + 123456, -1)
    val ex = intercept[IllegalArgumentException] {
      Corpus.contaminationBloomScreened(spark, reg, train).collect()
    }
    assert(ex.getMessage.contains("STALE"), ex.getMessage)
    Corpus.buildRegistryBloom(spark, reg) // detects the mismatch, rebuilds
    assert(Corpus.contaminationBloomScreened(spark, reg, train)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == want)
  }

  test("c13 temperature sampling: matches an independent re-derivation; rarest lang keeps all") {
    val got = Corpus.temperatureSample(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

    // independent re-derivation: JVM MessageDigest md5 (not Spark's md5
    // expression), BigInt exact arithmetic for the accept test
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val nLang = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nMin = nLang.values.min
    val B = Corpus.temperatureBuckets
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % B
    }
    val want = docs.groupBy(_._2).toSeq.map { case (lang, ds) =>
      val kept = ds.count { case (id, _) =>
        val b = BigInt(bucket(id))
        b * b * nLang(lang) < BigInt(B) * B * nMin
      }
      (lang, ds.length.toLong, kept.toLong)
    }.sortBy(_._1)
    assert(got == want)

    // the rarest language is never downsampled (rate exactly 1), and no
    // language keeps more than its size
    val rarest = nLang.minBy(_._2)._1
    assert(got.find(_._1 == rarest).exists(r => r._3 == r._2))
    assert(got.forall(r => r._3 <= r._2))
  }
}
