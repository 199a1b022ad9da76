package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators over the `documents` table: per-language
  * aggregate stats, n-gram-heuristic language ID, quality scoring, token
  * frequency, and bottom-k document fingerprints.
  *
  * All are single-shuffle (or shuffle-free projection + small agg) plans:
  * the per-document feature extraction is a pure expression layer that
  * scans once, so at 100 TB each is a map-side pass plus one low-
  * cardinality aggregation.
  */
object TextAnalysis {
  import Text._

  /** Per-language corpus stats. One partial-agg shuffle on 5 keys.
    *
    * avg_stop_ratio must be aggregation-order-insensitive (Spark's partial
    * aggregation sums doubles in a different order than a sequential
    * engine, which can flip a 6-dp rounded hash): the per-doc ratio is
    * floored to an exact integer at 1e12 scale, summed exactly as longs,
    * and divided once at the end — identical bits on any engine, any plan.
    */
  def langStats(spark: SparkSession, dir: String): DataFrame = {
    // one compiled lexicon_counts pass yields the token count AND the
    // stopword hits (stopwordRatio reads the same expression — whole-stage
    // codegen's subexpression elimination computes it once per row)
    val lc = lexiconCounts(col("text"), Seq(stopwords))
    Tables.documents(spark, dir)
      .select(col("lang"), col("n_chars"), element_at(lc, 2).as("ntok"),
        floor(stopwordRatio(col("text")) * lit(1e12)).as("sr_scaled"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("total_tokens"),
        round(avg(col("ntok")), 4).as("avg_tokens"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        // decimal(38,0) sum: exact like DuckDB's BIGINT→HUGEINT widening
        // (a long sum would silently wrap past ~9.2e6 docs/group at 1e12
        // scale); one cast to double of the exact total on both engines.
        round(sum(col("sr_scaled").cast("decimal(38,0)")).cast("double") / count(lit(1)) / lit(1e12), 6)
          .as("avg_stop_ratio"))
      .orderBy(col("lang"))
  }

  /** Heuristic lexicons for language ID (stopword hit counts). The data's
    * synthetic vocabulary is English-ish, so the interesting part is the
    * deterministic argmax chain, not the linguistics.
    */
  private val lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "und", "nicht"),
    "es" -> Seq("el", "la", "los", "que"),
    "fr" -> Seq("le", "les", "des", "est"))

  /** Language-ID: argmax of lexicon hit counts (ties resolved by lexicon
    * order; zero hits → "und"). Output: confusion counts vs the labeled
    * lang column.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    // ONE native lexicon_counts pass scores all four lexicons (was four
    // interpreted size(filter(...)) HOF passes per row)
    val lc = lexiconCounts(col("text"), lexicons.map(_._2))
    val scores = lexicons.zipWithIndex.map { case ((l, _), i) =>
      l -> element_at(lc, i + 1)
    }.toMap
    val g = greatest(lexicons.map(l => scores(l._1)): _*)
    val best = when(g === 0, lit("und"))
      .when(scores("en") === g, lit("en"))
      .when(scores("de") === g, lit("de"))
      .when(scores("es") === g, lit("es"))
      .otherwise(lit("fr"))
    Tables.documents(spark, dir)
      .select(col("lang"), best.as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Per-document quality score (length, lexical diversity, stopword
    * presence — the usual cheap pre-filters for training data), every doc.
    * Pure projection, no shuffle; consumed by [[qualityScores]] and by
    * [[Dedup.keeperByQuality]].
    */
  def scored(spark: SparkSession, dir: String): DataFrame = {
    // lexicon_counts carries [stopword hits, ntok, ndistinct] in one
    // compiled pass — no tokenize-per-feature HOF lambdas
    val lc = lexiconCounts(col("text"), Seq(stopwords))
    val ntokL = element_at(lc, 2)
    val ntok = ntokL.cast("double")
    // empty documents score 0 across the board (zero-token branch first —
    // ANSI double division throws on /0)
    val distinctRatio = when(ntokL === lit(0L), lit(0.0))
      .otherwise(element_at(lc, 3).cast("double") / ntok)
    val score =
      lit(0.4) * least(ntok / 128, lit(1.0)) +
      lit(0.4) * distinctRatio +
      lit(0.2) * least(stopwordRatio(col("text")) * 4, lit(1.0))
    Tables.documents(spark, dir)
      .select(col("doc_id"), ntokL.cast("int").as("ntok"),
        round(distinctRatio, 6).as("distinct_ratio"),
        round(score, 6).as("score"))
  }

  /** Top-25 quality scores (see [[scored]]). */
  def qualityScores(spark: SparkSession, dir: String, topN: Int = 25): DataFrame =
    scored(spark, dir)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)

  /** Global token frequency, top 20 (explode + count: one shuffle with
    * map-side partial aggregation; top-k via TakeOrdered, no full sort).
    */
  def tokenFreq(spark: SparkSession, dir: String, topN: Int = 20): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(topN)

  /** b4: PROVABLY-EXACT heavy hitters via a Misra-Gries sketch + a
    * candidate-bounded exact recount — t5's answer with a plan that
    * survives a distinct-token blow-up. t5's groupBy shuffles one row per
    * distinct token per mapper; at 100 TB of web text (billions of
    * distinct tokens, Zipf head) that shuffle IS the job. Here:
    *
    *  1. sketch pass: one global [[graft.exprs.MisraGries]] aggregate —
    *     mergeable, so Spark runs it map-side and ships ≤ capacity
    *     (token, count) entries per partition, never the token table;
    *  2. exact pass: recount ONLY the ≤ capacity candidates (broadcast
    *     semi-join, map-side combine onto ≤ capacity keys), top-N with
    *     the (n DESC, token) tie-break.
    *
    * The result is exact-or-refuse, in-plan: the MG guarantee says any
    * non-candidate's true count is ≤ total/(capacity+1), so if every
    * returned row's exact count clears that bound STRICTLY (ties could
    * lose the tie-break to an unseen token), the top-N provably equals
    * the full recount — and a row that can't clear it raises instead of
    * serving a maybe-wrong answer. Both passes read the same exploded
    * scan; the sketch row also carries the total, so no third pass.
    */
  def heavyHitters(spark: SparkSession, dir: String, topN: Int = 20,
      capacity: Int = 4096): DataFrame =
    heavyHittersOf(Tables.documents(spark, dir)
      .select(explode(Text.tokens(col("text"))).as("token")), topN, capacity)

  private[graft] def heavyHittersOf(toks: DataFrame, topN: Int,
      capacity: Int): DataFrame = {
    import toks.sparkSession.implicits._
    // the sketch pass runs EAGERLY: its entire result is one model-sized
    // row (≤ capacity tokens + the scalar total), and evaluating it on
    // the driver closes the empty-candidate hole a lazy in-plan guard
    // cannot (AQE's empty-relation propagation would cancel the guard's
    // job along with the empty join). This is the same collect class as
    // the persisted-model loads elsewhere — bounded by construction.
    val first = toks.agg(
      expr(s"misra_gries(token, $capacity)").as("cands"),
      count(lit(1)).as("total")).collect()(0)
    val cands = first.getSeq[String](0)
    val total = first.getLong(1)
    require(cands.size >= topN,
      s"heavy_hitters: only ${cands.size} candidates survived the sketch for a " +
        s"top-$topN — raise capacity or fall back to the exact groupBy (t5)")
    toks.join(broadcast(cands.toDF("token")), Seq("token")) // ≤ capacity keys
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(topN)
      .select(col("token"),
        when(col("n") * (capacity + 1) > lit(total), col("n"))
          .otherwise(raise_error(concat(
            lit(s"heavy_hitters: rank-$topN count "), col("n"),
            lit(s" does not clear the MG bound total/(capacity+1) = $total/${capacity + 1} — "),
            lit("raise capacity or fall back to the exact groupBy (t5)"))))
          .as("n"))
  }

  /** TF-IDF: top terms by tf·idf across the corpus. Two aggregations (term
    * frequency per (doc, token); document frequency per token — the df side
    * is tiny after aggregation and broadcasts back). idf = ln(N/df) with N
    * derived IN-PLAN as a broadcast scalar (the t8 pattern) — no driver
    * `count()` action, no extra corpus scan.
    *
    * The explicit hash-partitioning on (doc_id, token) is a
    * materialization barrier AND the distribution the tf aggregation
    * needs, so tf aggregates exchange-free; df is derived FROM the tf
    * aggregation (tf has exactly one row per (doc, token), so counting tf
    * rows per token IS the document frequency) — both consumers sit on
    * ONE shuffle whose scan+explode runs once (ReuseExchange, the d2
    * pattern; previously the corpus was exploded twice and the df branch
    * re-deduplicated what tf had already grouped). The explicit
    * doc_id-not-null filter keeps the two subtrees byte-identical — the
    * ntok join would otherwise push an isnotnull into only ITS branch's
    * scan and defeat the reuse.
    */
  def tfidfTop(spark: SparkSession, dir: String, topN: Int = 25): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .where(col("doc_id").isNotNull)
      .repartition(col("doc_id"), col("token"))
    val tfRaw = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val tf = tfRaw
      .join(docs.select(col("doc_id"), size(tokens(col("text"))).as("ntok")), "doc_id")
    val df = tfRaw.groupBy("token").agg(count(lit(1)).as("df"))
    // corpus size as an in-plan broadcast scalar — counts ALL documents
    // (token-less included), matching count(*) semantics
    val nDf = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val tfidf = (col("tf").cast("double") / col("ntok")) *
      log(col("n_docs") / col("df"))
    tf.join(broadcast(df), "token")
      .crossJoin(broadcast(nDf))
      .select(col("doc_id"), col("token"), round(tfidf, 6).as("tfidf"))
      .orderBy(col("tfidf").desc, col("doc_id"), col("token"))
      .limit(topN)
  }

  /** Unigram-surprisal scoring — the cheap stand-in for the LM-perplexity
    * quality filter (CCNet-style): score each document by the average
    * negative log-probability of its tokens under the corpus's own
    * unigram distribution. Low = stereotyped/repetitive text, high =
    * rare-token text; both tails get dropped in a real pipeline.
    *
    * Scale design: one explode + one broadcast join against the (small,
    * post-aggregation) frequency table + one per-doc aggregation — the
    * same shape as TF-IDF. Float determinism: per-token surprisal is
    * floored to an integer at 1e6 scale (6-dp output precision) and
    * summed exactly as decimal, so the aggregate is order-insensitive —
    * the t1 rule.
    */
  def unigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // one exploded token stream, hash-partitioned on doc_id and reused by
    // BOTH consumers (the freq aggregation and the broadcast-join scoring
    // pass — the t6 ReuseExchange pattern); the broadcast join preserves
    // the partitioning, so the final per-doc aggregation is exchange-free.
    // The explicit token-not-null filter keeps the two subtrees identical
    // (the freq join would otherwise push an isnotnull into only its
    // branch and defeat the reuse).
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .where(col("token").isNotNull)
      .repartition(col("doc_id"))
    val freq = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    // corpus total derived IN-PLAN from the tiny post-aggregation freq
    // table (sum of counts == token total) — no driver action, no third
    // scan of the corpus
    val tot = freq.agg(sum(col("cnt")).cast("double").as("total"))
    val sur = floor(-log(col("cnt").cast("double") / col("total")) * lit(1e6))
      .cast("decimal(38,0)")
    toks.join(broadcast(freq), "token")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ntok"),
        round((sum(sur).cast("double") / count(lit(1)) / lit(1e6)), 6)
          .as("avg_surprisal"))
      .orderBy(col("doc_id"))
  }

  /** t19: bigram Stupid-Backoff surprisal (Brants et al. 2007, "Large
    * Language Models in Machine Translation") — the HELD-OUT LM scoring
    * step t8's self-scored unigram model can't provide: the benchmark
    * slice is scored against a bigram model fit on everything else, so
    * unseen bigrams actually occur and the backoff path is exercised.
    * Per test-doc position i:
    *
    *   - seen bigram:  S = C2(prev,w) / C1(prev)
    *   - else seen w:  S = 0.4 · C1(w) / N     (the paper's fixed α)
    *   - else (OOV):   S = 0.4 / N
    *
    * reported as the per-doc mean of −ln S plus the backed-off position
    * count (the OOV-pressure diagnostic a data pipeline actually
    * thresholds on).
    *
    * Exactness: every −ln is floored to integer micro-nats from EXACT
    * integer counts (the t8 trick), so per-doc sums are
    * aggregation-order-independent; the two divisions at the end happen
    * once per doc. Scale shape: the model tables are (type)-keyed counts
    * with map-side partial aggregation (bigram types are corpus-bounded,
    * unigram types Heaps-bounded); scoring is hash joins of the test
    * stream against them and N rides in-plan from the tiny post-agg
    * table — no driver action, corpus text read once per side.
    */
  def bigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    bigramSurprisalOf(
      docs.where(col("source") =!= Corpus.benchmarkSource),
      docs.where(col("source") === Corpus.benchmarkSource))
  }

  /** The t19 core over explicit train/test slices (each needs `doc_id`
    * and `text`) — the spec drives the backoff branches through this with
    * synthetic corpora (the harness corpus is duplicate-dense enough that
    * its benchmark slice contains no unseen bigram at all).
    */
  private[graft] def bigramSurprisalOf(train: DataFrame, test: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val len = greatest(size(t) - 1, lit(0))
    val bigrams = zip_with(slice(t, lit(1), len), slice(t, lit(2), len),
      (a, b) => struct(a.as("prev"), b.as("w")))
    def bigramRows(df: DataFrame) = df
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .select(col("doc_id"), col("bg.prev"), col("bg.w"))
    val c2 = bigramRows(train).groupBy(col("prev"), col("w"))
      .agg(count(lit(1)).as("c2"))
    val c1 = train.select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c1"))
    val tot = c1.agg(sum(col("c1")).cast("double").as("total"))
    val scored = bigramRows(test)
      .join(c2, Seq("prev", "w"), "left")
      .join(c1.select(col("token").as("prev"), col("c1").as("c1p")), Seq("prev"), "left")
      .join(c1.select(col("token").as("w"), col("c1").as("c1w")), Seq("w"), "left")
      .crossJoin(broadcast(tot))
    val sb = when(col("c2").isNotNull,
        floor(-log(col("c2").cast("double") / col("c1p").cast("double")) * lit(1e6)))
      .when(col("c1w").isNotNull,
        floor(-log(lit(0.4) * col("c1w").cast("double") / col("total")) * lit(1e6)))
      .otherwise(floor(-log(lit(0.4) / col("total")) * lit(1e6)))
      .cast("decimal(38,0)")
    scored
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("c2").isNull.cast("long")).as("n_backoff"),
        round(sum(sb).cast("double") / count(lit(1)) / lit(1e6), 6)
          .as("avg_surprisal"))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style repetition/shape rules — the classic cheap filters from
    * the Gopher/MassiveText cleaning recipe, per document: duplicate
    * 3-gram fraction (1 − distinct/total trigrams; boilerplate and looped
    * text score high), mean word length, and non-alphanumeric character
    * ratio. Pure projection (one compiled pass per row, no shuffle except
    * the final ORDER BY for the gate); a real pipeline uses these as
    * WHERE thresholds, which then push down to the scan.
    *
    * All three ratios divide exact integers once, so they are
    * engine-deterministic at 6 dp.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val ntok = size(t)
    val ntri = greatest(ntok - 2, lit(0))
    val ndistinct = size(shingles(col("text"))) // shingles are distinct by construction
    val nchar = length(col("text"))
    val nsym = nchar - length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""))
    val totlen = aggregate(transform(t, w => length(w)), lit(0), (a, x) => a + x)
    Tables.documents(spark, dir)
      .select(col("doc_id"), ntok.as("ntok"),
        round(when(ntri > 0,
            (ntri - ndistinct).cast("double") / ntri).otherwise(lit(0.0)), 6)
          .as("dup_trigram_frac"),
        // zero guards: an empty/whitespace-only doc must yield 0.0, not
        // NaN/Infinity (the oracle's list_sum of an empty list is NULL)
        round(when(ntok > 0, totlen.cast("double") / ntok).otherwise(lit(0.0)), 6)
          .as("mean_word_len"),
        round(when(nchar > 0, nsym.cast("double") / nchar).otherwise(lit(0.0)), 6)
          .as("symbol_ratio"))
      .orderBy(col("doc_id"))
  }

  /** t15: repetition profile — the Gopher-style repetition signals t10's
    * ratio trio does not cover, shaped for a corpus whose repetition
    * lives at the TOKEN level (this table has no line structure):
    *
    *   - `top_bigram_frac`: occurrences of the most frequent word bigram
    *     / total bigrams (Rae et al.'s "top n-gram fraction" at n=2) —
    *     boilerplate and template spam concentrate mass in one bigram;
    *   - `max_token_run`: the longest same-token run ("batch batch
    *     batch" → 3) — degenerate generation/OCR stutter;
    *   - `dup_token_frac`: 1 − type/token ratio, the coarse vocabulary-
    *     collapse signal.
    *
    * Scale shape: the run is a single `aggregate` HOF fold over the
    * token array — per-row expression work (interpreted, like t10's
    * totlen fold — fine because it is O(tokens) per row), NO shuffle; the bigram mode
    * needs multiplicity so it explodes to the classic inverted-index
    * shape (partial-agg'd groupBy, two slim shuffles keyed by (doc,
    * bigram) then doc); all ratios divide exact integers once.
    */
  def repetitionProfile(spark: SparkSession, dir: String): DataFrame = {
    // longest run: fold (prev, run, best) left to right in one expression
    def maxRunOf(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val run0 = struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best"))
      aggregate(arr, run0, (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      }, _.getField("best"))
    }
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).as("ntok"),
        size(array_distinct(col("t"))).as("ndis"),
        maxRunOf(col("t")).as("max_token_run"))
      .repartition(col("doc_id")) // one tokenize pass feeds both consumers
    val bigrams = base
      .where(col("ntok") >= 2)
      .select(col("doc_id"), explode(transform(sequence(lit(0), col("ntok") - 2),
        i => concat_ws(" ", element_at(col("t"), i + 1),
          element_at(col("t"), i + 2)))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("topc"))
    base.join(bigrams, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(when(col("ntok") >= 2,
            coalesce(col("topc"), lit(0L)).cast("double") / (col("ntok") - 1))
          .otherwise(lit(0.0)), 6).as("top_bigram_frac"),
        col("max_token_run"),
        round(when(col("ntok") > 0,
            (col("ntok") - col("ndis")).cast("double") / col("ntok"))
          .otherwise(lit(0.0)), 6).as("dup_token_frac"))
      .orderBy(col("doc_id"))
  }

  /** GPT-2-style pretokenizer regex, simplified to the RE2-safe subset
    * (no lookahead) so the oracle runs it verbatim: contraction suffixes,
    * space-prefixed letter runs, digit runs, punctuation runs. Shared
    * with the oracle via interpolation.
    */
  val bpeishRe = "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  /** Token counting under a BPE-ish pretokenizer vs whitespace — the
    * "how many training tokens is this corpus" estimate, where whitespace
    * counts undershoot subword reality. Pure projection + one small agg;
    * the per-language ratio divides two exact integer sums once, so it is
    * engine-deterministic.
    */
  def bpeishTokens(spark: SparkSession, dir: String): DataFrame = {
    val ws = size(tokens(col("text")))
    val bpe = regexp_count(col("text"), lit(bpeishRe))
    Tables.documents(spark, dir)
      .select(col("lang"), ws.as("ws"), bpe.as("bpe"))
      .groupBy(col("lang"))
      .agg(sum(col("ws")).as("ws_tokens"), sum(col("bpe")).as("bpe_tokens"),
        round(sum(col("bpe")).cast("double") / sum(col("ws")), 6).as("bpe_per_ws"))
      .orderBy(col("lang"))
  }

  /** t12: REAL vocab-based BPE token counting — greedy ranked merges over
    * [[graft.exprs.BpeStats.merges]] per whitespace word, token ids from
    * the base-alphabet + merge vocabulary. Where t9 stops at
    * pretokenization (counting word-ish spans), this produces actual
    * subword token ids: `sum_token_id` pins the full id assignment, so a
    * single mis-merged word anywhere in the corpus flips the hash.
    *
    * Scale shape: one compiled `bpe_stats` pass per row (the merge loop
    * runs behind a Zipf-friendly word memo), then a per-language exact
    * integer aggregation — no joins, no shuffles beyond the final group.
    * The DuckDB oracle replays the merge loop itself with a recursive CTE
    * over the distinct-word set, so both engines derive the encoding from
    * the same ranked merge table rather than trusting golden values.
    */
  def bpeVocabTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        call_function("bpe_stats", col("text"),
          lit(graft.exprs.BpeStats.spec)).as("b"))
      .groupBy(col("lang"))
      .agg(sum(element_at(col("b"), 1)).as("n_words"),
        sum(element_at(col("b"), 2)).as("n_tokens"),
        sum(element_at(col("b"), 3)).as("sum_token_id"))
      .orderBy(col("lang"))

  /** Fixed training-round count for [[trainBpeMerges]] — a constant so the
    * DuckDB oracle unrolls exactly this many argmax+re-encode rounds (the
    * s5 Lloyd's-iterations precedent).
    */
  val bpeTrainRounds = 6

  /** t13: LEARN the ranked BPE merge table from the corpus — the step t12
    * (which applies a checked-in table) was missing; without it the
    * tokenizer cannot adapt to a new corpus. Classic greedy BPE training,
    * Spark-shaped:
    *
    *   1. one corpus pass reduces to the word-frequency VOCABULARY
    *      (`ws_tokens` explode + groupBy word) — after this, training cost
    *      scales with |vocab| (Zipf: ≪ corpus), the shape every real BPE
    *      trainer (Sennrich's subword-nmt, fastBPE) uses;
    *   2. per round: encode every vocab word with the merges learned so
    *      far and emit its adjacent symbol pairs (ONE compiled `bpe_pairs`
    *      pass — the t12 merge-loop machinery), weight by word frequency,
    *      groupBy pair, and take the argmax. The winning pair is model
    *      metadata (a 1-row collect, the s5 centroid precedent);
    *      tie-break: highest count, then lexicographically smallest pair —
    *      deterministic on both engines.
    *
    * Re-encoding from scratch each round (rather than patching the prior
    * encoding) is sound because a trained table always ranks a merge
    * after the merges that build its components, making the greedy
    * lowest-rank loop equal to in-order application; it keeps every round
    * a pure function of (vocab, merges) — no mutable corpus state.
    *
    * Scale: one corpus shuffle (vocab build, memoized behind a lazy
    * localCheckpoint), then `rounds` vocab-sized aggregations each ending
    * in a 1-row collect. At 100 TB the vocab is maybe 10⁷ rows — each
    * round is a small map+shuffle job, and the corpus is never re-read.
    */
  /** One training run per (session, corpus, budget) — the learned table
    * is a model artifact a pipeline trains ONCE and feeds to every
    * consumer (here t13's table dump and t14's tokenization; without the
    * memo t14 re-runs the whole training loop). Same convention as
    * [[Dedup.clusterLabels]]'s label memo: the bench clears it between
    * passes so per-pass timings stay honest, and the fill lands on the
    * first consumer in pass order.
    */
  private val trainCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int), Seq[(Int, String, Long)]]

  /** Drop the per-session training memo (bench calls between passes). */
  def clearCaches(): Unit = trainCache.clear()

  def trainBpeMerges(spark: SparkSession, dir: String,
      rounds: Int = bpeTrainRounds): Seq[(Int, String, Long)] =
    trainCache.computeIfAbsent((spark, dir, rounds),
      _ => trainBpeMergesUncached(spark, dir, rounds))

  private def trainBpeMergesUncached(spark: SparkSession, dir: String,
      rounds: Int): Seq[(Int, String, Long)] = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(call_function("ws_tokens", col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .localCheckpoint(false)
    var learned = List.empty[(Int, String, Long)]
    for (r <- 0 until rounds) {
      val spec = learned.reverse.map(_._2).mkString(";")
      val top = vocab
        .select(col("freq"),
          explode(call_function("bpe_pairs", col("word"), lit(spec))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(1).collect()
      if (top.nonEmpty) learned ::= ((r, top(0).getString(0), top(0).getLong(1)))
    }
    learned.reverse
  }

  /** The learned merge table as a query result: (rank, pair, freq). */
  def bpeTrainTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainBpeMerges(spark, dir).toDF("rank", "pair", "freq").orderBy(col("rank"))
  }

  /** Tokenizer-model REGISTRY (the s7 pattern for the BPE table): train
    * once, write the ranked merge table to a parquet model dir, and from
    * then on every consumer reloads it — strings and longs round-trip
    * parquet losslessly, so a reloaded table tokenizes bit-identically to
    * training fresh. This is the artifact a production pipeline ships to
    * its tokenization fleet: training sees the corpus once; tokenizers
    * see only the (rounds)-row model.
    */
  def persistedBpeMerges(spark: SparkSession, dir: String, modelDir: String,
      rounds: Int = bpeTrainRounds): Seq[(Int, String, Long)] = {
    val marker = new org.apache.hadoop.fs.Path(modelDir, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      import spark.implicits._
      trainBpeMerges(spark, dir, rounds).toDF("rank", "pair", "freq")
        .repartition(1) // a ≤rounds-row model: one file, atomic _SUCCESS
        .write.mode("overwrite").parquet(modelDir)
    }
    spark.read.parquet(modelDir).orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
  }

  /** t16: t12's counting on the PERSISTED model — reload, never retrain
    * (the spec proves the corpus is untouched on the reload path). Same
    * output shape and values as [[bpeLearnedTokens]].
    */
  def bpePersistedTokens(spark: SparkSession, dir: String, modelDir: String): DataFrame = {
    val spec = persistedBpeMerges(spark, dir, modelDir).map(_._2).mkString(";")
    Tables.documents(spark, dir)
      .select(col("lang"),
        call_function("bpe_stats", col("text"), lit(spec)).as("b"))
      .groupBy(col("lang"))
      .agg(sum(element_at(col("b"), 1)).as("n_words"),
        sum(element_at(col("b"), 2)).as("n_tokens"),
        sum(element_at(col("b"), 3)).as("sum_token_id"))
      .orderBy(col("lang"))
  }

  /** t14: t12's token counting run on the LEARNED table — the full loop
    * closed: train on the corpus, then tokenize the corpus with what was
    * learned. Same output shape as [[bpeVocabTokens]]; the oracle replays
    * training AND encoding, so a single divergent merge anywhere flips
    * every count downstream.
    */
  def bpeLearnedTokens(spark: SparkSession, dir: String): DataFrame = {
    val spec = trainBpeMerges(spark, dir).map(_._2).mkString(";")
    Tables.documents(spark, dir)
      .select(col("lang"),
        call_function("bpe_stats", col("text"), lit(spec)).as("b"))
      .groupBy(col("lang"))
      .agg(sum(element_at(col("b"), 1)).as("n_words"),
        sum(element_at(col("b"), 2)).as("n_tokens"),
        sum(element_at(col("b"), 3)).as("sum_token_id"))
      .orderBy(col("lang"))
  }

  /** t20: TOKENIZER FERTILITY AUDIT — the standard multilingual
    * tokenizer-quality report over the learned BPE table: per language,
    * tokens-per-word (fertility) and chars-per-token (compression). A
    * tokenizer trained on skewed data over-fragments the low-resource
    * languages (fertility up, chars/token down), silently inflating their
    * training cost and shrinking their effective context window — this is
    * the number that catches it before a training run does.
    *
    * All inputs are exact integer sums in ONE pass (the compiled
    * `bpe_stats` walk plus a codegen `length(translate(...))` — non-space
    * chars ≡ total word chars under the single-space tokenizer); the two
    * ratios divide once at the end, so both engines agree at 6 dp.
    */
  def bpeFertility(spark: SparkSession, dir: String): DataFrame = {
    val spec = trainBpeMerges(spark, dir).map(_._2).mkString(";")
    Tables.documents(spark, dir)
      .select(col("lang"),
        call_function("bpe_stats", col("text"), lit(spec)).as("b"),
        length(translate(col("text"), " ", "")).as("nc"))
      .groupBy(col("lang"))
      .agg(sum(element_at(col("b"), 1)).as("n_words"),
        sum(element_at(col("b"), 2)).as("n_tokens"),
        sum(col("nc").cast("long")).as("n_chars"))
      .select(col("lang"), col("n_words"), col("n_tokens"), col("n_chars"),
        round(col("n_tokens").cast("double") / col("n_words"), 6).as("fertility"),
        round(col("n_chars").cast("double") / col("n_tokens"), 6).as("chars_per_token"))
      .orderBy(col("lang"))
  }

  /** Golden corpus for [[redactPii]] — the synthetic `documents` table
    * contains no PII-shaped strings, so the redaction op is exercised over
    * an inline corpus (one definition: these rows are interpolated into
    * the DuckDB oracle's VALUES list too). ASCII, no quotes, so SQL
    * literal interpolation is trivially safe.
    */
  val piiCorpus: Seq[(Long, String)] = Seq(
    (0L, "no pii here just plain text"),
    (1L, "contact john.doe@example.com for details"),
    (2L, "call 555-123-4567 or 555.987.6543 today"),
    (3L, "server at 192.168.0.1 and backup at 10.0.0.254"),
    (4L, "mail a@b.io and c.d+e@sub.domain.org now"),
    (5L, "mixed: jane@corp.net 777-000-1111 8.8.8.8"),
    (6L, "edge 999.999.999.999 still matches the naive ip regex"),
    (7L, "dot phone 123.456.7890 and dash phone 321-654-0987"))

  /** Redaction patterns, shared verbatim with the oracle (both Java regex
    * and RE2 dialects read these identically: no lookaround, no backrefs).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
  val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII redaction — the compliance pass every training-data pipeline
    * runs before anything else sees the text: scrub emails, phone
    * numbers, and IPv4 literals, and count what was scrubbed (the counts
    * feed a per-source audit). Counts are taken on the ORIGINAL text;
    * replacement order (email → phone → IP) means earlier placeholders
    * can never create later matches (placeholders contain no digits).
    *
    * Scale design: a pure per-row projection — three compiled regex
    * passes, no shuffle, no UDF; 100 TB redacts at scan speed. The
    * patterns are deliberately naive (row 6 documents a false-positive
    * IPv4); production swaps patterns, not plumbing.
    */
  def redactPii(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), emailRe, "[EMAIL]"),
          phoneRe, "[PHONE]"),
        ipRe, "[IP]")
    piiCorpus.toDF("id", "text")
      .select(col("id"),
        regexp_count(col("text"), lit(emailRe)).cast("bigint").as("n_email"),
        regexp_count(col("text"), lit(phoneRe)).cast("bigint").as("n_phone"),
        regexp_count(col("text"), lit(ipRe)).cast("bigint").as("n_ip"),
        redacted.as("redacted"))
      .orderBy(col("id"))
  }

  /** k-anonymity audit (t11) — the privacy companion to [[redactPii]]:
    * after direct identifiers are scrubbed, documents can still be
    * re-identified through QUASI-identifier combinations (here: language ×
    * source × size bucket — the metadata a release would publish). A
    * combination shared by fewer than k documents is a re-identification
    * risk; this reports every such group with its size, the audit a
    * release pipeline gates on (k-anonymity, Sweeney 2002).
    *
    * Scale shape: one partial-agg shuffle on the quasi-identifier tuple,
    * then a tiny filtered result — the same cost as any groupBy count at
    * 100 TB. All arithmetic is exact integers.
    */
  def kAnonymityAudit(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"),
        floor(col("n_chars") / lit(100.0)).cast("long").as("size_bucket"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") < k)
      .orderBy(col("lang"), col("source"), col("size_bucket"))

  /** Bottom-k sketch fingerprint: the 5 lexicographically smallest
    * md5(shingle) values concatenated, plus the exact content hash.
    * Shuffle-free (pure projection); at scale the fingerprint column
    * feeds grouping or indexing downstream.
    */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_join(slice(array_sort(transform(shingles(col("text")), s => md5(s))), 1, 5), "")
          .as("bottomk"),
        md5(normalized(col("text")).cast("binary")).as("content_md5"))
      .orderBy(col("doc_id"))

  /** The "curated" provenance slice [[qualityClassifier]] learns to
    * recognize (the CCNet/LLaMA recipe: label by source, not by hand).
    */
  val qualitySources: Seq[String] = (0 to 4).map(i => s"src$i")

  /** t17: LEARNED quality classifier — t3's score is a fixed lexicon
    * heuristic; this TRAINS a model instead, the way production pipelines
    * bootstrap quality filters (CCNet, LLaMA): label every document by
    * PROVENANCE (curated sources = positive), featurize with the t10
    * shape signals, fit Naive Bayes, and score the corpus with the
    * learned posteriors.
    *
    * Determinism is the whole design: features are INTEGER deciles
    * (integer `div`, never float floor), class/feature-bin counts are
    * exact integers, Laplace smoothing is `(c + 1) / (n_class + 10)`
    * with the fixed bin space 10, and the posterior comparison
    * cross-multiplies to clear every denominator:
    *
    *   n1 · Π_f (c1_f + 1) · (n0 + 10)⁴  vs  n0 · Π_f (c0_f + 1) · (n1 + 10)⁴
    *
    * evaluated in decimal(38,0) (≤ ~10²⁵, exact; the oracle uses
    * HUGEINT) — the s5 integer-exact-training precedent, so the DuckDB
    * oracle REPLAYS the training and lands on bit-identical predictions.
    * Ties predict 0.
    *
    * Scale shape: one compiled featurize pass over the corpus, four
    * 10-row feature-count aggregates plus one 1-row class count (all
    * broadcast back), zero corpus shuffles before the final ORDER BY —
    * training IS one partial-agg pass, scoring is map-side. 100 TB of
    * text trains and scores in two scans (this implementation folds them
    * into one via the broadcast joins).
    */
  private[graft] val nbFeatureNames = Seq("f_dup", "f_wlen", "f_sym", "f_ttr")

  /** The t17 feature/label projection over a raw (doc_id, text, source)
    * batch — integer deciles only (integer `div`, never float floors).
    */
  private[graft] def qualityFeatures(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val ntok = size(t)
    val ntri = greatest(ntok - 2, lit(0))
    val ndis3 = size(shingles(col("text")))
    val nchar = length(col("text"))
    val nsym = nchar - length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""))
    val totlen = aggregate(transform(t, w => length(w)), lit(0), (a, x) => a + x)
    val ndtok = size(array_distinct(t))
    docs
      .select(col("doc_id"), col("source"), ntok.as("ntok"), ntri.as("ntri"),
        ndis3.as("ndis3"), nchar.as("nchar"), nsym.as("nsym"),
        totlen.as("totlen"), ndtok.as("ndtok"))
      .select(col("doc_id"),
        expr("least(9, (ntri - ndis3) * 10 div greatest(ntri, 1))").cast("long").as("f_dup"),
        expr("least(9, totlen div greatest(ntok, 1))").cast("long").as("f_wlen"),
        expr("least(9, nsym * 10 div greatest(nchar, 1))").cast("long").as("f_sym"),
        expr("least(9, (ntok - ndtok) * 10 div greatest(ntok, 1))").cast("long").as("f_ttr"),
        col("source").isin(qualitySources: _*).cast("long").as("label"))
  }

  /** The Naive Bayes sufficient statistics of one feature batch in LONG
    * form: (feature, v, c1, c0) per (feature, bin) plus a `_class` row
    * holding the class totals. Pure associative counts — summable across
    * batches, which is what makes training state write-only (t18).
    */
  private[graft] def nbCounts(feats: DataFrame): DataFrame = {
    val perFeature = nbFeatureNames.map { f =>
      feats.groupBy(lit(f).as("feature"), col(f).as("v"))
        .agg(sum(col("label")).as("c1"),
          (count(lit(1)) - sum(col("label"))).as("c0"))
    }
    val cls = feats.agg(sum(col("label")).as("c1"),
        (count(lit(1)) - sum(col("label"))).as("c0"))
      .select(lit("_class").as("feature"), lit(0L).as("v"), col("c1"), col("c0"))
    perFeature.reduce(_ unionByName _).unionByName(cls)
  }

  /** Score a feature table against a (possibly re-aggregated) long-form
    * count table: Laplace `(c + 1) / (n_class + 10)` posteriors compared
    * by decimal(38,0) cross-multiplication (exact at ~10²⁵; ties → 0).
    */
  private[graft] def nbClassify(feats: DataFrame, countsLong: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val d38 = "decimal(38,0)"
    def side(n: org.apache.spark.sql.Column, cs: Seq[org.apache.spark.sql.Column],
        other: org.apache.spark.sql.Column) =
      cs.foldLeft(n.cast(d38))((acc, c) => acc * (c + lit(1)).cast(d38)) *
        (other + lit(10)).cast(d38) * (other + lit(10)).cast(d38) *
        (other + lit(10)).cast(d38) * (other + lit(10)).cast(d38)
    val scored = nbFeatureNames.foldLeft(feats) { (df, f) =>
      val cf = countsLong.where(col("feature") === f)
        .select(col("v"), col("c1").as(s"c1_$f"), col("c0").as(s"c0_$f"))
      df.join(broadcast(cf), df(f) === col("v")).drop("v")
    }.crossJoin(broadcast(countsLong.where(col("feature") === "_class")
      .select(col("c1").as("n1"), col("c0").as("n0"))))
    scored.select(col("doc_id"), col("f_dup"), col("f_wlen"), col("f_sym"),
        col("f_ttr"), col("label"),
        when(side(col("n1"), nbFeatureNames.map(f => col(s"c1_$f")), col("n0")) >
            side(col("n0"), nbFeatureNames.map(f => col(s"c0_$f")), col("n1")),
          lit(1L)).otherwise(lit(0L)).as("pred"))
      .orderBy(col("doc_id"))
  }

  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    // six consumers (class count, four bin counts, the scoring join)
    // read this slim table; persist so the featurize pass runs once
    val feats = qualityFeatures(Tables.documents(spark, dir)).persist()
    nbClassify(feats, nbCounts(feats))
  }

  /** t22: DATASET CARD — the per-source datasheet a training corpus ships
    * with: volume (docs / tokens / chars), language spread, exact-content
    * duplication rate (d1's normalized sha256 as the content key), and
    * mean heuristic quality ([[scored]]'s formula). This is the report a
    * data consumer reads before a single training token flows — and
    * because every number here is exact (count-distinct on the content
    * hash, scaled-integer score sums per t1's trick), two engines agree
    * bit for bit.
    *
    * One corpus pass: every per-doc column (token count, score, content
    * hash) is a compiled projection over the same scan, then one
    * aggregation by source (count-distinct rewrites to an expand +
    * two-phase aggregate — map-side partials, no row explosion).
    */
  /** The per-doc projection behind the dataset card: (doc_id, source,
    * lang, n_chars, ntok, scaled score, content hash) — one compiled
    * pass; shared by the one-shot card (t22) and the incremental
    * maintenance (t23/q76) so the two paths cannot diverge on a single
    * doc's stats. `doc_id` rides along for the t26 delete sidecar
    * (tombstones address docs by id).
    */
  private[graft] def cardDocStats(docs: DataFrame): DataFrame = {
    val lc = lexiconCounts(col("text"), Seq(stopwords))
    val ntokL = element_at(lc, 2)
    val ntok = ntokL.cast("double")
    val dr = when(ntokL === lit(0L), lit(0.0))
      .otherwise(element_at(lc, 3).cast("double") / ntok)
    val score =
      lit(0.4) * least(ntok / 128, lit(1.0)) +
      lit(0.4) * dr +
      lit(0.2) * least(stopwordRatio(col("text")) * 4, lit(1.0))
    docs.select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
      ntokL.as("ntok"),
      floor(score * lit(1e12)).as("sc"),
      sha2(normalized(col("text")).cast("binary"), 256).as("h"))
  }

  /** Serve the card from an already-computed per-doc stats table — the
    * t22 aggregation, factored so the incremental fold reuses the exact
    * final arithmetic (rounding only at serve time).
    */
  private[graft] def cardOf(stats: DataFrame): DataFrame =
    stats
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("h")).as("n_distinct_texts"),
        sum(col("sc").cast("decimal(38,0)")).as("sc_sum"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_langs"), col("n_distinct_texts"),
        round(lit(1.0) - col("n_distinct_texts").cast("double") / col("n_docs"), 6)
          .as("dup_rate"),
        round(col("sc_sum").cast("double") / col("n_docs") / lit(1e12), 6)
          .as("avg_score"))
      .orderBy(col("source"))

  def datasetCard(spark: SparkSession, dir: String): DataFrame =
    cardOf(cardDocStats(Tables.documents(spark, dir)))

  /** t21 gauntlet: Unicode edge cases the corpus (ASCII by construction)
    * cannot exercise, with each string expressed twice — once as the Scala
    * literal the Spark side unions in, once as the `chr()`-built SQL
    * expression the DuckDB oracle interpolates. Negative ids keep them
    * disjoint from real documents. Cases: canonical composition (combining
    * acute, ring, Hangul jamo), control/format stripping (tab, VT, BEL,
    * ZWJ, zero-width space), NBSP retention (\\s is ASCII-only in BOTH
    * regex engines — pinned, not accidental), whitespace collapse, and an
    * already-clean identity row.
    */
  val normGauntlet: Seq[(Long, String, String)] = Seq(
    (-1L, "café menu", "'cafe' || chr(769) || ' menu'"),
    (-2L, "Åland islands", "'A' || chr(778) || 'land islands'"),
    (-3L, "가 hangul jamo", "chr(4352) || chr(4449) || ' hangul jamo'"),
    (-4L, "tab\tandbellend", "'tab' || chr(9) || 'and' || chr(11) || 'bell' || chr(7) || 'end'"),
    (-5L, "a b stays nbsp", "'a' || chr(160) || 'b stays nbsp'"),
    (-6L, "  double  spaced  words  ", "'  double  spaced  words  '"),
    (-7L, "zero‍width​join", "'zero' || chr(8205) || 'width' || chr(8203) || 'join'"),
    (-8L, "plain ascii already clean", "'plain ascii already clean'"))

  /** t21: TEXT NORMALIZATION audit — the cleaning stage every hash-based
    * operator upstream depends on: NFC canonical composition (the native
    * [[graft.exprs.NfcNormalize]] codegen expression), control/format
    * character stripping, whitespace collapse, trim. Un-normalized text
    * silently under-dedups (e+◌́ and é shingle differently), so this runs
    * BEFORE fingerprints/minhash in a real pipeline.
    *
    * Emits per doc: changed flag, raw/normalized char counts, and the
    * sha256 of the normalized text (the content key d1-style exact dedup
    * would use downstream). Pure map-side projection — one corpus scan,
    * no shuffle, no UDF. The [[normGauntlet]] rows ride along because the
    * synthetic corpus is ASCII: they make the oracle comparison exercise
    * real composition/stripping, not just the identity path.
    */
  def normalizeAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gauntlet = normGauntlet.map { case (id, s, _) => (id, s) }
      .toDF("doc_id", "text")
    val corpus = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .unionByName(gauntlet)
    val norm = trim(regexp_replace(regexp_replace(
      call_function("nfc_normalize", col("text")),
      "[\\p{Cc}\\p{Cf}]", ""), "\\s+", " "))
    corpus
      .select(col("doc_id"), col("text"), norm.as("norm"))
      .select(col("doc_id"),
        (col("norm") =!= col("text")).cast("int").as("changed"),
        length(col("text")).as("n_raw"),
        length(col("norm")).as("n_norm"),
        sha2(col("norm"), 256).as("sha"))
      .orderBy(col("doc_id"))
  }
}
