package graft

import org.apache.spark.sql.functions._

import graft.ops.{Corpus, Dedup, TextAnalysis}
import graft.operators.Relational
import graft.streaming.EventsStream

/** Round-3 operators: sequence packing, PII redaction, histogram,
  * grouping sets, quality-aware keeper, stream-static enrichment.
  */
class Round3OpsSpec extends SparkSpec {

  test("pack: per-language packs are contiguous, conserve tokens, and span disjoint doc ranges") {
    val packs = Corpus.pack(spark, sf0001).cache()
    // pack ids start at 0 per lang and each pack's id is exactly
    // floor(its start offset / capacity) — ids may SKIP when one doc is
    // longer than the capacity (a BPE-counted doc can span several pack
    // widths; it still lands in exactly one pack), so "no gaps" is not
    // the invariant, offset alignment is
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("pack_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val misaligned = packs
      .withColumn("cumP", sum(col("n_tokens")).over(wc))
      .where(col("pack_id") =!= floor((col("cumP") - col("n_tokens")) /
        Corpus.packTokens.toDouble).cast("bigint"))
    assert(misaligned.count() == 0)
    assert(packs.groupBy("lang").agg(min("pack_id").as("lo"))
      .where(col("lo") =!= 0).count() == 0)
    // token conservation: manifest total == corpus total (REAL BPE counts,
    // the same bpe_stats the packer itself runs)
    val total = graft.sources.Tables.documents(spark, sf0001)
      .select(element_at(call_function("bpe_stats", col("text"),
        lit(graft.exprs.BpeStats.spec)), 2).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(packs.agg(sum("n_tokens")).head().getLong(0) == total)
    // doc ranges per lang are disjoint and increasing with pack_id
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("pack_id")
    val overlap = packs
      .withColumn("prev_last", lag(col("last_doc"), 1).over(w))
      .where(col("prev_last").isNotNull && col("first_doc") <= col("prev_last"))
    assert(overlap.count() == 0)
    // every pack but a language's last starts a doc at full capacity:
    // prefix sum through its last doc >= (pack_id+1) * capacity
    val lastPack = packs.groupBy("lang").agg(max("pack_id").as("lastp"))
    val under = packs.join(lastPack, "lang")
      .withColumn("cum", sum(col("n_tokens")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .where(col("pack_id") < col("lastp") &&
        col("cum") < (col("pack_id") + 1) * Corpus.packTokens)
    assert(under.count() == 0)
    packs.unpersist()
  }

  test("c8 curriculumPack: packs descend in quality and conserve c4's token total") {
    val packs = Corpus.curriculumPack(spark, sf0001).cache()
    // per language, the score bands of consecutive packs never interleave:
    // a later pack's best doc is no better than an earlier pack's worst
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("pack_id")
    val crossed = packs
      .withColumn("prev_min", lag(col("min_score"), 1).over(w))
      .where(col("prev_min").isNotNull && col("max_score") > col("prev_min"))
    assert(crossed.count() == 0)
    // same docs, same BPE counts, different order: totals match c4 exactly
    val c4tot = Corpus.pack(spark, sf0001)
      .groupBy("lang").agg(sum("n_tokens").as("t4"), sum("n_docs").as("d4"))
    val mism = packs.groupBy("lang")
      .agg(sum("n_tokens").as("t8"), sum("n_docs").as("d8"))
      .join(c4tot, "lang")
      .where(col("t8") =!= col("t4") || col("d8") =!= col("d4"))
    assert(mism.count() == 0)
    packs.unpersist()
  }

  test("t15 repetitionProfile == plain-Scala recomputation over sf0.001") {
    val got = graft.ops.TextAnalysis.repetitionProfile(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getInt(2), r.getDouble(3)))).toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty && got.size == docs.length)
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.foreach { case (id, text) =>
      val t = text.split(" ").filter(_.nonEmpty)
      val topBg = if (t.length >= 2)
        t.sliding(2).map(_.mkString(" ")).toSeq.groupBy(identity).values.map(_.size).max
      else 0
      val maxRun = if (t.isEmpty) 0
        else t.foldLeft(("", 0, 0)) { case ((prev, run, best), x) =>
          val r = if (x == prev) run + 1 else 1
          (x, r, math.max(best, r))
        }._3
      val dupFrac = if (t.isEmpty) 0.0
        else (t.length - t.distinct.length).toDouble / t.length
      val want = (rnd(if (t.length >= 2) topBg.toDouble / (t.length - 1) else 0.0),
        maxRun, rnd(dupFrac))
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
    // the corpus actually exercises the signals (runs > 1 exist)
    assert(got.values.exists(_._2 > 1), "no token runs in corpus — signal untested")
  }

  test("redactPii: golden rows — counts on original text, placeholders in output") {
    val out = TextAnalysis.redactPii(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getString(4))).toMap
    assert(out(0) == ((0L, 0L, 0L), "no pii here just plain text"))
    assert(out(1) == ((1L, 0L, 0L), "contact [EMAIL] for details"))
    assert(out(2) == ((0L, 2L, 0L), "call [PHONE] or [PHONE] today"))
    assert(out(3) == ((0L, 0L, 2L), "server at [IP] and backup at [IP]"))
    assert(out(5) == ((1L, 1L, 1L), "mixed: [EMAIL] [PHONE] [IP]"))
    assert(out(6)._1 == (0L, 0L, 1L)) // the naive-regex false positive, documented
  }

  test("histogram: buckets partition the table and bucket bounds hold") {
    val orders = graft.sources.Tables.orders(spark, sf0001)
    val h = Relational.q36Histogram(spark, sf0001)
    assert(h.agg(sum("n")).head().getLong(0) == orders.count())
    // spot-check: every order's price lands in its bucket's range
    val bad = orders.select(
        floor(col("o_totalprice") / Relational.histWidth.toDouble).cast("bigint").as("b"),
        col("o_totalprice"))
      .where(col("o_totalprice") < col("b") * Relational.histWidth ||
        col("o_totalprice") >= (col("b") + 1) * Relational.histWidth)
    assert(bad.count() == 0)
  }

  test("grouping sets: levels are internally consistent") {
    val gs = Relational.q37GroupingSets(spark, sf0001).cache()
    val detail = gs.where(col("gid") === 0)
    val sub = gs.where(col("gid") === 1)
    val grand = gs.where(col("gid") === 3)
    // exactly the three requested levels, nothing else (no priority-only level)
    assert(gs.select("gid").distinct().collect().map(_.getLong(0)).toSet == Set(0L, 1L, 3L))
    // subtotals roll up the detail rows
    val rolled = detail.groupBy("o_orderstatus").agg(sum("n").as("n2"))
    val mismatch = sub.join(rolled, "o_orderstatus").where(col("n") =!= col("n2"))
    assert(mismatch.count() == 0)
    // grand total = all orders
    assert(grand.select("n").head().getLong(0) ==
      graft.sources.Tables.orders(spark, sf0001).count())
    gs.unpersist()
  }

  test("keeperByQuality: keeper has its cluster's max (score, -doc_id)") {
    val keep = Dedup.keeperByQuality(spark, sf0001)
    val clusters = Dedup.dupClusters(spark, sf0001)
      .join(TextAnalysis.scored(spark, sf0001).select("doc_id", "score"), "doc_id")
    val best = clusters.groupBy("cluster_id")
      .agg(max(struct(col("score"), (-col("doc_id")).as("nd"))).as("m"))
      .select(col("cluster_id"), col("m.score").as("bscore"), (-col("m.nd")).as("bdoc"))
    val bad = keep.join(best, "cluster_id")
      .where(col("keeper_doc") =!= col("bdoc") || col("keeper_score") =!= col("bscore"))
    assert(bad.count() == 0)
    // one keeper per cluster, cluster count matches
    assert(keep.count() == clusters.select("cluster_id").distinct().count())
  }

  test("unigramSurprisal: positive scores, token counts conserved") {
    val s = TextAnalysis.unigramSurprisal(spark, sf0001).cache()
    assert(s.where(col("avg_surprisal") <= 0).count() == 0)
    val total = graft.sources.Tables.documents(spark, sf0001)
      .select(size(filter(split(col("text"), " "), t => t =!= "")).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(s.agg(sum("ntok")).head().getLong(0) == total)
    s.unpersist()
  }

  test("rebalance: the rarest language keeps everything, others are downsampled") {
    val r = Corpus.rebalance(spark, sf0001).cache()
    val rows = r.collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val minOrig = rows.map(_._2).min
    rows.foreach { case (lang, orig, kept) =>
      assert(kept <= orig, s"$lang kept > orig")
      if (orig == minOrig) assert(kept == orig, s"rarest lang $lang must keep all")
    }
    // downsampling actually bites somewhere (sf0.001 langs are imbalanced)
    assert(rows.exists { case (_, o, k) => k < o })
    r.unpersist()
  }

  test("gapFill: constructed gaps come back as explicit zeros over the dense spine") {
    import spark.implicits._
    // type a: days 1,3 (gap on 2); type b: day 2 only (gaps on 1 and 3)
    val ev = Seq(("a", "2024-01-01"), ("a", "2024-01-03"), ("a", "2024-01-03"),
        ("b", "2024-01-02"))
      .toDF("event_type", "d").select(col("event_type"), col("d").cast("date").as("day"))
    val out = Relational.gapFill(ev)
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", "a", 1L), ("2024-01-01", "b", 0L),
      ("2024-01-02", "a", 0L), ("2024-01-02", "b", 1L),
      ("2024-01-03", "a", 2L), ("2024-01-03", "b", 0L)))
  }

  test("except all keeps multiplicity: counts equal per-key count difference") {
    import spark.implicits._
    val got = Relational.q42ExceptAll(spark, sf0001)
      .groupBy("o_custkey").count()
    val o = graft.sources.Tables.orders(spark, sf0001)
    val urgent = o.where(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("nu"))
    val urgentF = o.where(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("nf"))
    val expect = urgent.join(urgentF, Seq("o_custkey"), "left")
      .select(col("o_custkey"), (col("nu") - coalesce(col("nf"), lit(0L))).as("diff"))
      .where(col("diff") > 0)
    assert(got.join(expect, "o_custkey").where(col("count") =!= col("diff")).count() == 0)
    assert(got.count() == expect.count())
  }

  test("approx aggs: HLL and p90 tolerance booleans all true, exact counts positive") {
    val rows = Relational.q40ApproxAggs(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: exact_users")
      assert(r.getBoolean(2), s"${r.getString(0)}: users_ok")
      assert(r.getBoolean(3), s"${r.getString(0)}: p90_ok")
    }
  }

  test("bpeish pretokenizer: contractions, digit runs, punctuation split as expected") {
    import spark.implicits._
    val n = Seq("don't stop it's 42 ok!").toDF("text")
      .select(regexp_count(col("text"), lit(TextAnalysis.bpeishRe)).as("n"))
      .head().getInt(0)
    // don | 't | _stop | _it | 's | _42 | _ok | !
    assert(n == 8)
  }

  test("gopherRules equals a Scala reference implementation on every sf0.001 doc") {
    def ref(text: String): (Int, Double, Double, Double) = {
      val t = text.split(" ").filter(_.nonEmpty)
      val ntri = math.max(t.length - 2, 0)
      val ndis = t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq.distinct.size
      val dup = if (ntri > 0) (ntri - ndis).toDouble / ntri else 0.0
      val mwl = t.map(_.length).sum.toDouble / t.length
      val nsym = text.count(c => !c.isLetterOrDigit && c != ' ')
      val sym = nsym.toDouble / text.length
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (t.length, r6(dup), r6(mwl), r6(sym))
    }
    val texts = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.gopherRules(spark, sf0001).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val want = ref(texts(r.getLong(0)))
      val have = (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(have == want, s"doc ${r.getLong(0)}: $have != $want")
    }
  }

  test("unigramSurprisal equals a Scala reference implementation on every sf0.001 doc") {
    val texts = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val allToks = texts.values.toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
    val freq = allToks.groupBy(identity).map { case (w, ws) => w -> ws.size }
    val total = allToks.size.toDouble
    def ref(text: String): (Long, Double) = {
      val t = text.split(" ").filter(_.nonEmpty)
      val s = t.map(w => math.floor(-math.log(freq(w) / total) * 1e6).toLong).sum
      (t.length.toLong,
        BigDecimal(s.toDouble / t.length / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    TextAnalysis.unigramSurprisal(spark, sf0001).collect().foreach { r =>
      val want = ref(texts(r.getLong(0)))
      assert((r.getLong(1), r.getDouble(2)) == want, s"doc ${r.getLong(0)}")
    }
  }

  test("stream left-outer funnel equals the batch emulation of watermark eviction") {
    val out = EventsStream.runFunnelLeftOuterAvailableNow(spark, sf0001).cache()
    val ev = graft.sources.Tables.events(spark, sf0001)
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    val m = c.join(p, col("user_id") === col("p_user") &&
      col("purchase_ts") > col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
    // final watermark = min(per-side max event time) − delay
    val wm = new java.sql.Timestamp(math.min(
      c.agg(max("click_ts")).head().getTimestamp(0).getTime,
      p.agg(max("purchase_ts")).head().getTimestamp(0).getTime) - 3600 * 1000L)
    val matched = out.where(col("purchase_id").isNotNull)
    assert(matched.count() == m.count())
    val unmatched = out.where(col("purchase_id").isNull)
    val expectUnmatched = c
      .join(m.select(col("click_id").as("mc")).distinct(),
        col("click_id") === col("mc"), "left_anti")
      .where(col("click_ts") + expr("INTERVAL 1 HOUR") < lit(wm))
    assert(unmatched.select("click_id").collect().map(_.getLong(0)).toSet ==
      expectUnmatched.select("click_id").collect().map(_.getLong(0)).toSet)
    out.unpersist()
  }

  test("stream-static enrichment equals the batch join at sf0.001") {
    import spark.implicits._
    val streamed = EventsStream.runStaticEnrichedAvailableNow(spark, sf0001)
    val dim = EventsStream.typeWeights.toDF("event_type", "weight")
    val batch = graft.sources.Tables.events(spark, sf0001)
      .join(broadcast(dim), "event_type")
      .groupBy(col("ts").cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value") * col("weight")), 2).as("weighted_value"))
      .select(col("day"), col("event_type"), col("n"), col("weighted_value"))
    assert(streamed.collect().toSeq.sortBy(_.toString) ==
      batch.collect().toSeq.sortBy(_.toString))
    // "error" events exist but carry no weight row — the join must drop them
    assert(streamed.where(col("event_type") === "error").count() == 0)
  }

  test("t18: split-trained count partials == t17's one-shot; keyed re-delivery is a no-op") {
    import graft.ops.IncrementalClassifier
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val want = graft.ops.TextAnalysis.qualityClassifier(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    for (mod <- Seq(2, 3)) {
      val state = graft.util.TmpDirs.scratch(s"graft_t18_${mod}_").toString
      (0 until mod).foreach(r => IncrementalClassifier.merge(spark, state,
        docs.where(pmod(col("doc_id"), lit(mod)) === r), Some(s"b$r")))
      val got = IncrementalClassifier.classify(spark, state, docs)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(got == want, s"$mod-way split-training diverged from one-shot t17")
    }
    // re-delivered batch key: no new generation, counts unchanged
    val state = graft.util.TmpDirs.scratch("graft_t18_redel_").toString
    IncrementalClassifier.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(2)) === 0), Some("b0"))
    IncrementalClassifier.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b1"))
    assert(IncrementalClassifier.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b1")) == 1)
    assert(IncrementalClassifier.completeVersions(spark, state) == Seq(0, 1))
    assert(IncrementalClassifier.classify(spark, state, docs)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == want)
    // compaction: model folds to one tiny generation, scores unchanged,
    // markers survive (a re-delivered key is STILL a no-op after folding)
    val v = IncrementalClassifier.compact(spark, state)
    assert(IncrementalClassifier.completeVersions(spark, state) == Seq(v))
    assert(spark.read.parquet(s"$state/v$v/counts").count() <= 41)
    assert(IncrementalClassifier.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b1")) == v)
    assert(IncrementalClassifier.classify(spark, state, docs)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == want)
  }

  test("t17: Naive Bayes learns a perfectly separable planted corpus") {
    import spark.implicits._
    // curated sources write clean prose; the rest write symbol soup — the
    // f_sym decile separates the classes perfectly, so the trained
    // classifier must recover the provenance label for every doc
    val clean = "plain simple words flow along the page with quiet easy grace"
    val noisy = "@#$% ^&*! ~~%% @@!! ##$$ %%^^ &&** !!@@ $$## **&&"
    val rows = (0 until 10).map(i => (i.toLong, s"$clean v$i", "en", "src1", 60)) ++
      (10 until 20).map(i => (i.toLong, s"$noisy x$i", "en", "src9", 50))
    val dir = graft.util.TmpDirs.scratch("graft_t17_spec_").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = graft.ops.TextAnalysis.qualityClassifier(spark, dir)
      .select("doc_id", "label", "pred").collect()
    assert(out.length == 20)
    assert(out.forall(r => r.getLong(2) == r.getLong(1)),
      s"classifier failed to separate the planted classes: ${out.mkString(", ")}")

    // and on the real corpus: total partition, binary outputs, and the
    // provenance label matches the source slice exactly
    val real = graft.ops.TextAnalysis.qualityClassifier(spark, sf0001)
    val n = graft.sources.Tables.documents(spark, sf0001).count()
    assert(real.count() == n)
    assert(real.where(!col("pred").isin(0L, 1L) || !col("label").isin(0L, 1L)).count() == 0)
    val wantPos = graft.sources.Tables.documents(spark, sf0001)
      .where(col("source").isin(graft.ops.TextAnalysis.qualitySources: _*)).count()
    assert(real.where(col("label") === 1L).count() == wantPos)
  }
}
