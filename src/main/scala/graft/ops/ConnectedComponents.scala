package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * core behind duplicate-cluster assignment ([[Dedup.dupClusters]], d7).
  *
  * Two algorithms, both returning the same labeling (every node mapped to
  * its component's minimum node id):
  *
  *   - [[labelPropagation]] — min-label flooding with pointer jumping:
  *     O(log diameter) rounds, one edge join + one label self-join per
  *     round. The fast path for the near-dup graphs this engine builds
  *     (components are tiny star-ish clusters), but round count grows
  *     with component diameter, so an adversarially chain-shaped graph
  *     can exhaust the round cap.
  *   - [[starContraction]] — alternating large-star/small-star edge
  *     rewriting (Kiveris et al., "Connected Components in MapReduce and
  *     Beyond", SoCC'14): provably O(log n) rounds on ANY graph shape,
  *     each round two shuffles over an edge set that only shrinks. The
  *     guaranteed-convergence fallback when propagation hits its cap.
  *
  * Both algorithms never materialize anything larger than the (symmetric)
  * edge list, and both checkpoint per round through a caller-supplied
  * [[Ckpt]] so lineage stays O(1) deep regardless of iteration count:
  * `local` (RDD-block `localCheckpoint`) for single-JVM runs, `durable`
  * (HDFS/object-store `checkpoint`) for a real cluster where losing an
  * executor must not recompute twenty joins.
  */
object ConnectedComponents {

  /** Lineage-truncation strategy applied once per iteration. */
  type Ckpt = DataFrame => DataFrame

  /** Workaround for a Spark 4.1 constraint-propagation crash on
    * checkpointed plans: `localCheckpoint` preserves the origin plan's
    * constraints on its `LogicalRDD`, and those expressions can reference
    * attributes that are NOT in the LogicalRDD's output (e.g. join-side
    * attrs pruned by the checkpointed projection). `Union.rewriteConstraints`
    * then does a strict AttributeMap lookup over child outputs and dies
    * with `key not found: <attr>`. Both iterative algorithms union a
    * checkpointed table every round, so every plan inside the loops must
    * run with constraint propagation off (it only ADDS inferred filters —
    * pure optimization, no semantics).
    *
    * SCOPED, not session-global: the loop runs under a CLONED session
    * (own SQLConf, shared SparkContext — [[graftbridge.PlanBridge
    * .cloneSession]]) with propagation disabled there, and the input edge
    * plan is re-bound onto the clone. The caller's session is never
    * mutated, so unrelated queries planned concurrently keep their
    * optimization, no lock, no save/restore to strand. The returned label
    * table stays bound to the clone — correct on purpose: its lineage is
    * exactly the checkpoint-union shape the crash bites, so downstream
    * actions on it must keep propagation off, while plans the caller
    * builds on its own session are untouched.
    */
  private def withoutConstraintPropagation(edges: DataFrame): DataFrame = {
    val scoped = org.apache.spark.sql.graftbridge.PlanBridge
      .cloneSession(edges.sparkSession)
    scoped.conf.set("spark.sql.constraintPropagation.enabled", "false")
    org.apache.spark.sql.graftbridge.PlanBridge
      .ofRows(scoped, edges.queryExecution.logical)
  }

  /** In-memory (with disk spill) checkpoint — right for local mode. */
  val local: Ckpt = _.localCheckpoint(true)

  /** Durable checkpoint to `dir` — right for a multi-executor cluster
    * (survives executor loss; `dir` should be HDFS/S3, not local disk).
    *
    * The checkpoint dir is SESSION-GLOBAL SparkContext state, so this sets
    * it only when unset and fails loudly if a different dir is already
    * configured — silently redirecting another holder's checkpoints (the
    * previous behavior) could strand in-flight lineage truncation on a
    * path about to be cleaned up. (`setCheckpointDir` stores a
    * UUID-suffixed subdirectory of the requested path, hence the
    * prefix comparison.)
    */
  def durable(spark: SparkSession, dir: String): Ckpt = {
    // setCheckpointDir stores a UUID subdirectory of the requested path,
    // qualified with scheme + authority; strip the scheme for comparison
    // (an unqualified `dir` must still match its qualified form) and
    // accept only an exact match or a PATH-COMPONENT child — a plain
    // string prefix would wave through sibling dirs like `/ck-old` for a
    // requested `/ck`.
    def bare(p: String): String =
      p.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?", "").stripSuffix("/")
    val want = bare(dir)
    spark.sparkContext.getCheckpointDir match {
      case None => spark.sparkContext.setCheckpointDir(dir)
      case Some(cur) if bare(cur) == want || bare(cur).startsWith(want + "/") => ()
      case Some(cur) =>
        throw new IllegalStateException(
          s"SparkContext checkpoint dir already set to '$cur'; refusing to " +
            s"redirect it to '$dir' — pass that dir explicitly or use a new session")
    }
    df => df.checkpoint(true)
  }

  /** Adaptive min-label CC — the execution dial [[graft.ops.LabelState]]
    * introduced for incremental merges, shared with the one-shot cluster
    * queries: a bounded `limit(N+1)` collect decides the path AND carries
    * the small case's data, so a pair graph under `edgeLimit` edges
    * (≈3 MB — model-sized) is labeled by an exact driver union-find in
    * ONE Spark job instead of a multi-round checkpointed loop whose
    * per-round durable checkpoint + convergence aggregate dominate small
    * inputs. Past the bound, the distributed loop runs. Identical
    * labeling either way (both assign every node its component's min id —
    * the union-find/propagation parity is property-pinned in
    * UnionFindSpec), so callers can switch freely on measured size.
    */
  def adaptiveMinLabels(spark: SparkSession, edges: DataFrame,
      edgeLimit: Int = LabelState.smallEdgeLimit, maxIters: Int = 50,
      checkpointDir: Option[String] = None): DataFrame = {
    val sample = edges.limit(edgeLimit + 1).collect()
    if (sample.length <= edgeLimit) {
      import spark.implicits._
      LabelState.unionFindMinLabels(sample.map(r => (r.getLong(0), r.getLong(1))))
        .toSeq.toDF("node", "label")
    } else {
      val ckpt = durable(spark, checkpointDir.getOrElse(
        graft.util.TmpDirs.sessionCheckpointDir(spark)))
      labelPropagation(edges, maxIters, ckpt)
        .map(_._1)
        // fallback keeps its own cap: it bounds rounds by O(log n), not by
        // the diameter-sensitive budget that just ran out
        .getOrElse(starContraction(edges, ckpt = ckpt)._1)
    }
  }

  /** Min-label propagation with pointer jumping. `edges` is any (src, dst)
    * pair list (need not be symmetric or deduplicated). Returns the
    * (node, label) table and the round count, or None if the labeling did
    * not reach its fixpoint within `maxIters` rounds.
    *
    * Each round: every node takes the min of its own label and its
    * neighbors' labels (one join on the symmetric edge list), then follows
    * its label one hop in the label table (`label(n) := label(label(n))`,
    * a self-join on the far smaller label table). The jump halves
    * pointer-chain depth per round, so convergence is O(log diameter).
    * Labels are monotone non-increasing and every label value is a node id
    * inside the same component, so the fixpoint is the component min;
    * convergence is detected by the label-sum fixpoint (labels only ever
    * decrease, so an unchanged sum means an unchanged labeling — one
    * scalar aggregate per round, no row-level diff join).
    */
  def labelPropagation(edges: DataFrame, maxIters: Int,
      ckpt: Ckpt = local): Option[(DataFrame, Int)] = {
    val pairs = withoutConstraintPropagation(edges).toDF("src", "dst")
    val sym = pairs.union(pairs.select(col("dst"), col("src")))
      .toDF("src", "dst")
      .repartition(col("src"))
      .persist()
    // init label(n) = min(n, min neighbor) — the same one-aggregation cost
    // as a distinct-node scan (sym is symmetric, so src covers every
    // node), but it IS round one's neighbor-min, so the loop starts a
    // round ahead; the invariants (label ≤ node, label in-component,
    // monotone non-increasing) hold from the start.
    var labels = ckpt(sym.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .select(col("src").as("node"), col("label")))
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val prev = labels
      // checkpointed BEFORE the self-join below — referenced twice, and an
      // unmaterialized plan would recompute the neighbor join per branch
      val prop = ckpt(sym.as("e")
        .join(prev.as("l"), col("e.src") === col("l.node"))
        .select(col("e.dst").as("node"), col("l.label").as("label"))
        .union(prev)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label")))
      // pointer jump: label(n) := min(label(n), label(label(n))). Every
      // label value is a node id of the same component, so the (tiny)
      // label-table self-join is total; `least` is monotone insurance.
      // Deliberately NOT checkpointed: both of its inputs are the
      // just-checkpointed `prop`, so its lineage is one join deep — a
      // durable write here would double the loop's checkpoint I/O (the
      // dominant per-round fixed cost on near-dup-sized graphs) to save
      // at most three one-stage recomputes of a small self-join (the
      // convergence aggregate plus the two references in the next
      // round's neighbor-min). Fault tolerance is unchanged: recovery
      // replays from the last `prop` files either way.
      labels = prop.as("x")
        .join(prop.select(col("node").as("jn"), col("label").as("jl")).as("y"),
          col("x.label") === col("jn"), "left")
        .select(col("x.node").as("node"),
          least(col("x.label"), coalesce(col("jl"), col("x.label"))).as("label"))
      val s = labelSum(labels)
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    sym.unpersist()
    if (converged) Some((labels, iter)) else None
  }

  /** Alternating large-star/small-star contraction. `edges` is any
    * (src, dst) pair list. Returns the (node, label) table — label = the
    * component's min node id, nodes drawn from the edge endpoints — and
    * the round count. Throws if the edge set is not a min-rooted star
    * forest within `maxIters` rounds (cannot happen below ~2^maxIters
    * nodes; the cap is a runaway guard, not a tuning knob).
    *
    * One round = large-star then small-star, each two shuffles (a
    * per-node min aggregate and an edge join against it):
    *   - large-star: every node connects its LARGER neighbors to its
    *     smallest neighbor-or-self — emit (v, m(u)) for v in N(u), v > u,
    *     where m(u) = min(N(u) ∪ {u});
    *   - small-star: orient edges (big, small); every node connects its
    *     smaller neighbors AND itself to the smallest — emit (v, m(u))
    *     and (u, m(u)) for v in N⁻(u).
    * Both steps preserve connectivity and only ever decrease the
    * (multiset of) edge endpoints; the fixpoint is a forest of stars
    * whose roots are component minima. Convergence is detected by an
    * (order-insensitive) edge-set checksum reaching a fixpoint, then
    * VERIFIED structurally — every child has exactly one root and no
    * root is also a child — so a checksum collision cannot smuggle out a
    * partial clustering.
    */
  def starContraction(edges: DataFrame, maxIters: Int = 50,
      ckpt: Ckpt = local): (DataFrame, Int) = {
    val scopedEdges = withoutConstraintPropagation(edges)
    val nodes = ckpt(scopedEdges.toDF("src", "dst")
      .select(explode(array(col("src"), col("dst"))).as("node")).distinct())

    // canonical orientation (big, small), no self-loops, deduplicated
    def orient(e: DataFrame): DataFrame = e
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v"), col("u")).toDF("u", "v"))
      val mins = sym.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      // emit (v, m(u)) for the strictly-larger neighbors; v > u >= m so
      // the output is already (big, small)-oriented
      sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val o = orient(e.toDF("u", "v"))
      val mins = o.groupBy(col("u")).agg(min(col("v")).as("m"))
      o.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()
    }

    // order-insensitive edge-set checksum: (count, Σ (xxhash64(u, v) mod
    // 2^32)) over the canonically-oriented set — equal sets hash equal;
    // unequal sets collide with probability ~2^-32·2^-(count bits) and the
    // structural check below catches even that. The mod keeps the ANSI-mode
    // sum overflow-free below 2^31 edges.
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(pmod(xxhash64(col("u"), col("v")), lit(1L << 32))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var cur = ckpt(orient(scopedEdges.toDF("u", "v")))
    var prevSum = checksum(cur)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      cur = ckpt(smallStar(largeStar(cur)))
      val s = checksum(cur)
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    // structural star-forest verification (fail loudly on a partial
    // clustering — a silent one would keep the wrong documents downstream)
    val multiRoot = cur.groupBy(col("u")).agg(countDistinct(col("v")).as("nr"))
      .where(col("nr") > 1).limit(1).count() > 0
    val rootIsChild = cur.as("a")
      .join(cur.as("b"), col("a.v") === col("b.u"), "left_semi")
      .limit(1).count() > 0
    if (!converged || multiRoot || rootIsChild) throw new IllegalStateException(
      s"starContraction: not a min-rooted star forest after $iter rounds " +
        s"(converged=$converged multiRoot=$multiRoot rootIsChild=$rootIsChild)")
    val labels = nodes.as("n")
      .join(cur.as("s"), col("n.node") === col("s.u"), "left")
      .select(col("n.node").as("node"),
        coalesce(col("s.v"), col("n.node")).as("label"))
    (labels, iter)
  }
}
