package graft

import org.apache.spark.sql.functions._

import graft.ops.Quantization

/** Product quantization (s11): the operator's ADC top-k must equal an
  * INDEPENDENT plain-Scala re-derivation on the same vectors — separate
  * code path, same determinism contract (double folds ascending, argmax
  * ties to the smaller code, ADC summed in ascending subspace order).
  */
class PqSpec extends SparkSpec {

  private val dir = sf0001

  /** (qid, rnk, vec_id, approx_cosine@6dp) derived with driver-side Scala
    * collections only.
    */
  private def reference(d: String): Seq[(Long, Int, Long, Double)] = {
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val m = Quantization.pqSubspaces
    val dim = vecs.head._2.length
    val sd = dim / m
    val cb: IndexedSeq[IndexedSeq[Array[Double]]] = (0 until m).map { s =>
      vecs.take(Quantization.pqCodes).toIndexedSeq
        .map(_._2.slice(s * sd, (s + 1) * sd))
    }
    val cc = cb.map(_.map(c => c.foldLeft(0.0)((a, x) => a + x * x)))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    // encode: per subspace argmax(2<x,c> - |c|^2), ties -> smaller code
    val codes = vecs.map { case (id, e) =>
      id -> (0 until m).map { s =>
        val xs = e.slice(s * sd, (s + 1) * sd)
        (0 until Quantization.pqCodes)
          .map(c => (2.0 * dot(xs, cb(s)(c)) - cc(s)(c), c))
          .reduceLeft((a, b) => if (b._1 > a._1) b else a) // strict: ties keep the earlier (smaller) code
          ._2
      }
    }
    val rn = codes.map { case (id, cs) =>
      id -> math.sqrt((0 until m).map(s => cc(s)(cs(s))).reduceLeft(_ + _))
    }.toMap
    val qs = vecs.filter(_._1 < Quantization.pqQueries)
      .map { case (id, e) => (id, e, math.sqrt(dot(e, e))) }
      .filter(_._3 > 0)
    qs.flatMap { case (qid, qe, qn) =>
      val scored = codes
        .filter { case (id, _) => id != qid && rn(id) > 0 }
        .map { case (id, cs) =>
          val adc = (0 until m)
            .map(s => dot(qe.slice(s * sd, (s + 1) * sd), cb(s)(cs(s))))
            .reduceLeft(_ + _)
          (id, adc / (qn * rn(id)))
        }
        .sortBy { case (id, c) => (-c, id) }
        .take(Quantization.pqTopK)
      scored.zipWithIndex.map { case ((id, c), i) =>
        (qid, i + 1, id, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toSeq.sortBy(t => (t._1, t._2))
  }

  test("s11 ADC top-k equals the independent re-derivation") {
    val got = Quantization.pqAdcTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == reference(dir))
  }

  private def s12Reference(d: String): Seq[(Long, Int, Long, Long, Double)] = {
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val m = Quantization.pqSubspaces
    val sd = vecs.head._2.length / m
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    val cb = (0 until m).map { s =>
      vecs.take(Quantization.pqCodes).toIndexedSeq.map(_._2.slice(s * sd, (s + 1) * sd))
    }
    val cc = cb.map(_.map(c => c.foldLeft(0.0)((a, x) => a + x * x)))
    val cents = vecs.take(graft.ops.Similarity.ivfCells)
      .map { case (cid, e) => (cid, e, nrm(e)) }
    // cell assignment: argmax centroid cosine, ties -> smaller cid
    def cellOf(e: Array[Double]): Long = {
      val n = nrm(e)
      if (n == 0) -1L
      else cents.map { case (cid, ce, cn) => (dot(e, ce) / (n * cn), cid) }
        .reduceLeft((a, b) => if (b._1 > a._1) b else a)._2
    }
    val codes = vecs.map { case (id, e) =>
      id -> (0 until m).map { s =>
        val xs = e.slice(s * sd, (s + 1) * sd)
        (0 until Quantization.pqCodes)
          .map(c => (2.0 * dot(xs, cb(s)(c)) - cc(s)(c), c))
          .reduceLeft((a, b) => if (b._1 > a._1) b else a)._2
      }
    }.toMap
    val rn = codes.map { case (id, cs) =>
      id -> math.sqrt((0 until m).map(s => cc(s)(cs(s))).reduceLeft(_ + _))
    }
    val cellMap = vecs.map { case (id, e) => id -> cellOf(e) }.toMap
    val expected = vecs.filter(_._1 < Quantization.pqQueries)
      .map { case (id, e) => (id, e, nrm(e)) }.filter(_._3 > 0)
      .flatMap { case (qid, qe, qn) =>
        val probed = cents.map { case (cid, ce, cn) => (dot(qe, ce) / (qn * cn), cid) }
          .sortBy { case (c, cid) => (-c, cid) }
          .take(graft.ops.Similarity.ivfProbes).map(_._2).toSet
        vecs.filter { case (id, _) =>
          id != qid && probed.contains(cellMap(id)) && rn(id) > 0 }
          .map { case (id, _) =>
            val adc = (0 until m)
              .map(s => dot(qe.slice(s * sd, (s + 1) * sd), cb(s)(codes(id)(s))))
              .reduceLeft(_ + _)
            (id, cellMap(id), adc / (qn * rn(id)))
          }
          .sortBy { case (id, _, c) => (-c, id) }
          .take(Quantization.pqTopK).zipWithIndex
          .map { case ((id, cell, c), i) =>
            (qid, i + 1, id, cell,
              BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
      }.toSeq.sortBy(t => (t._1, t._2))
    expected
  }

  test("s12 IVF-PQ equals the independent re-derivation") {
    val got = Quantization.ivfPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == s12Reference(dir))
  }

  test("adversarial staged corpus: zero vectors, duplicates, exact ties") {
    import spark.implicits._
    // dim 16 (subDim 2); 24 vectors: ids 0..15 are codebook/centroid refs,
    // 16 = duplicate of 3 (identical codes -> vec_id tie-break must fire),
    // 17 = verbatim codebook entry 5, 20 = the all-zero vector (zero norm:
    // cell -1, never probed; still PQ-encodable), rest arbitrary
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(16)((r.nextDouble() * 2 - 1).toFloat)
    }
    val rows: Seq[(Long, Array[Float])] =
      (0 until 16).map(i => i.toLong -> vec(i)) ++ Seq(
        16L -> vec(3),
        17L -> vec(5),
        18L -> vec(100),
        19L -> vec(101),
        20L -> Array.fill(16)(0.0f),
        21L -> vec(102),
        22L -> vec(103),
        23L -> vec(3)) // second duplicate of 3 -> three-way tie
    val tmp = graft.util.TmpDirs.scratch("graft_pq_adversarial_").toString
    rows.map { case (id, e) => (id, e.toSeq, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    val got11 = Quantization.pqAdcTopK(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got11 == reference(tmp))
    val got12 = Quantization.ivfPqTopK(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got12 == s12Reference(tmp))

    // the zero vector never appears as a candidate in s12 (cell -1 is
    // out of every probe's domain)
    assert(!got12.exists(_._3 == 20L))
    // duplicates of vec 3 carry identical approx cosines toward any
    // query that surfaces one of them — the tie resolves by vec_id
    val dupRanks = got11.filter(t => Set(3L, 16L, 23L).contains(t._3))
      .groupBy(_._1).values
    dupRanks.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._3) == sorted.map(_._3).sorted,
        s"vec_id tie-break violated among duplicates: $sorted")
    }
  }

  test("codes are 4-bit and the encoded table is slim") {
    val cb = Quantization.pqCodebooks(spark, dir)
    val enc = Quantization.encode(spark, dir, cb)
    val m = Quantization.pqSubspaces
    assert(enc.columns.toSeq ==
      Seq("vec_id") ++ (0 until m).map(s => s"code$s") :+ "rn")
    val bounds = enc.select(
      (0 until m).map(s => max(col(s"code$s"))) ++
        (0 until m).map(s => min(col(s"code$s"))): _*).collect()(0)
    (0 until m).foreach { s =>
      assert(bounds.getInt(s) < Quantization.pqCodes)
      assert(bounds.getInt(m + s) >= 0)
    }
  }

  test("the ADC join broadcasts the query side") {
    val plan = Quantization.pqAdcTopK(spark, dir).queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastHashJoin") ||
      plan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("s14: recall audit equals a set-intersection re-derivation") {
    val exact = graft.ops.Similarity.cosineTopK(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Quantization.pqAdcTopK(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val audit = Quantization.pqRecallAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(audit.map(_._1).toSet == exact.keySet)
    audit.foreach { case (qid, nExact, nHit, recall) =>
      val e = exact(qid)
      val hits = e.intersect(approx.getOrElse(qid, Set.empty))
      assert(nExact == e.size && nHit == hits.size)
      assert(math.abs(recall - hits.size.toDouble / e.size) < 1e-6)
    }
  }

  test("s15: split-ingest against the frozen model equals one-shot s12") {
    val model = graft.util.TmpDirs.scratch("graft_s15_model_spec_").toString
    graft.ops.IncrementalIvfPq.persistedRefVectors(spark, dir, model)
    val state = graft.util.TmpDirs.scratch("graft_s15_state_spec_").toString
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // a DIFFERENT split than the registered entry (5-way) — exactness
    // must be split-invariant, not split-specific
    (0 until 5).foreach(r => graft.ops.IncrementalIvfPq.merge(spark, state, model,
      vecs.where(pmod(col("vec_id"), lit(5)) === r)))
    val inc = graft.ops.IncrementalIvfPq.annTopK(spark, dir, state, model).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    val oneShot = Quantization.ivfPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(inc == oneShot)
    // compaction folds to one generation and preserves the answer
    graft.ops.IncrementalIvfPq.compact(spark, state)
    assert(graft.ops.IncrementalIvfPq.completeVersions(spark, state).size == 1)
    val afterCompact = graft.ops.IncrementalIvfPq.annTopK(spark, dir, state, model).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(afterCompact == oneShot)
  }

  test("q74: streaming IVF-PQ ingest drains to the one-shot s12") {
    val model = graft.util.TmpDirs.scratch("graft_q74_model_spec_").toString
    graft.ops.IncrementalIvfPq.persistedRefVectors(spark, dir, model)
    val streamed = graft.streaming.DocumentsStream
      .runIvfPqIngestAvailableNow(spark, dir, model).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    val oneShot = Quantization.ivfPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(streamed == oneShot)
  }

  test("s15: keyed re-delivered batch is a NO-OP, surviving compaction") {
    // the q74 crash window: merge landed, stream checkpoint didn't — an
    // unkeyed re-delivery would append duplicate code rows and annTopK's
    // union + row_number would rank the same vec_id twice
    val model = graft.util.TmpDirs.scratch("graft_s15_redel_model_").toString
    graft.ops.IncrementalIvfPq.persistedRefVectors(spark, dir, model)
    val state = graft.util.TmpDirs.scratch("graft_s15_redel_state_").toString
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val b1 = vecs.where(pmod(col("vec_id"), lit(2)) === 0)
    val b2 = vecs.where(pmod(col("vec_id"), lit(2)) === 1)
    graft.ops.IncrementalIvfPq.merge(spark, state, model, b1, Some("b0"))
    graft.ops.IncrementalIvfPq.merge(spark, state, model, b2, Some("b1"))
    val before = graft.ops.IncrementalIvfPq.annTopK(spark, dir, state, model).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(graft.ops.IncrementalIvfPq.merge(spark, state, model, b2, Some("b1")) == 1)
    assert(graft.ops.IncrementalIvfPq.completeVersions(spark, state) == Seq(0, 1),
      "re-delivered keyed batch created a generation")
    val after = graft.ops.IncrementalIvfPq.annTopK(spark, dir, state, model).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(after == before, "re-delivered batch changed the served top-k")
    // and the no-op survives compaction (markers travel with the fold)
    val v = graft.ops.IncrementalIvfPq.compact(spark, state)
    assert(graft.ops.IncrementalIvfPq.merge(spark, state, model, b2, Some("b1")) == v)
    assert(graft.ops.IncrementalIvfPq.annTopK(spark, dir, state, model).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
      == before)
  }

  test("s15: a merge against a different frozen model is refused") {
    val modelA = graft.util.TmpDirs.scratch("graft_s15_ma_").toString
    graft.ops.IncrementalIvfPq.persistedRefVectors(spark, dir, modelA)
    val state = graft.util.TmpDirs.scratch("graft_s15_refuse_").toString
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    graft.ops.IncrementalIvfPq.merge(spark, state, modelA, vecs.limit(10))
    // a model derived from different reference vectors (drop vec 0)
    val modelB = graft.util.TmpDirs.scratch("graft_s15_mb_").toString
    import spark.implicits._
    graft.ops.Similarity.firstKCentroids(spark, dir, Quantization.pqCodes + 1)
      .drop(1).map { case (cid, ce, cn) => (cid, ce.toSeq, cn) }
      .toDF("cid", "ce", "cn").coalesce(1).write.mode("overwrite").parquet(modelB)
    val ex = intercept[Exception] {
      graft.ops.IncrementalIvfPq.merge(spark, state, modelB, vecs.limit(10))
    }
    assert(ex.getMessage.toLowerCase.contains("config") ||
      ex.getMessage.toLowerCase.contains("model"))
  }

  test("s13: persisted codebooks reload bit-identically and never re-derive") {
    val model = graft.util.TmpDirs.scratch("graft_pq_model_spec_").toString
    val fresh = Quantization.pqAdcTopK(spark, dir).collect().toSeq
    val first = Quantization.pqAdcTopKPersisted(spark, dir, model).collect().toSeq
    assert(first == fresh)
    // reload against a nonexistent corpus path: the registry alone must
    // carry the model (would throw if the codebooks were re-derived)
    def flat(c: IndexedSeq[IndexedSeq[Quantization.PqEntry]]) =
      c.map(_.map { case (code, sub, cc) => (code, sub.toSeq, cc) })
    val cb = Quantization.persistedPqCodebooks(spark, "/nonexistent/corpus", model)
    assert(flat(cb) == flat(Quantization.pqCodebooks(spark, dir)))
  }

  test("s12: the corpus is never shuffled with its payload") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, Exchange, ReusedExchangeExec, ShuffleExchangeExec}
    def exchanges(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      (p match {
        case e: Exchange => Seq(e)
        case r: ReusedExchangeExec => Seq(r)
        case _ => Nil
      }) ++ kids.flatMap(exchanges)
    }
    val df = Quantization.ivfPqTopK(spark, dir)
    df.collect() // materialize so AQE finalizes the stages
    val ex = exchanges(df.queryExecution.executedPlan)
    // exactly one broadcast (the probe/lut query side); any shuffle may
    // carry only the top-k candidate projection (qid, vec_id, cell,
    // approx_cosine for the rank window) — never the embedding payload
    assert(ex.exists {
      case _: BroadcastExchangeExec => true
      case r: ReusedExchangeExec => r.child.isInstanceOf[BroadcastExchangeExec]
      case _ => false
    }, s"expected a broadcast of the query side:\n$ex")
    val shuffles = ex.collect { case s: ShuffleExchangeExec => s }
    shuffles.foreach { s =>
      val cols = s.output.map(_.name.toLowerCase)
      // no shuffle may carry the CORPUS vector payload; lut columns may
      // cross only inside the query-side probe ranking (queries × cells
      // rows — model-sized), recognizable by its pcell/ccos columns
      assert(!cols.exists(c => c == "embedding" || c == "e"),
        s"corpus vector payload crossed a shuffle: $cols")
      if (cols.exists(_.startsWith("lut")))
        assert(cols.contains("pcell"),
          s"lut payload crossed a non-probe shuffle: $cols")
    }
  }
}
