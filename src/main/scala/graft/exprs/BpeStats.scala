package graft.exprs

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_stats(text, merge_spec)` — REAL byte-pair-encoding tokenization
  * (t12): per whitespace word, start from single characters and greedily
  * apply the ranked merge table until no adjacent pair is mergeable, then
  * map every surviving symbol to its vocabulary id. Returns
  * `array<long>` `[n_words, n_tokens, sum_token_id]` for the whole text —
  * one compiled pass per row, no interpreted lambdas.
  *
  * Semantics (exactly replayed by the DuckDB oracle's recursive CTE):
  *   - words are `ws_tokens` (single-space split, empties dropped);
  *   - symbols start as the word's characters; each step finds the
  *     LOWEST-RANK adjacent pair present and merges its LEFTMOST
  *     occurrence; repeat to fixpoint. (One-leftmost-at-a-time equals the
  *     textbook merge-all-occurrences order: a merge output string never
  *     equals either of its parts, so merging one occurrence cannot
  *     create an earlier occurrence of the same pair.)
  *   - ids: printable-ASCII base alphabet (codes 33..126) maps to
  *     `code − 33` (0..93); merge `i`'s output maps to `94 + i`; any
  *     other character is the unknown id −1. Spaces never reach symbols.
  *
  * Scale shape: pure per-row map work, codegen-friendly, with a bounded
  * per-JVM word→encoding memo (natural-language corpora repeat words with
  * Zipf skew, so the memo turns the merge loop into a hash probe for the
  * hot vocabulary; the cap keeps memory bounded on adversarial input).
  */
case class BpeStats(child: Expression, spec: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_stats requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_stats"

  @transient private lazy val table: BpeTable = BpeStats.parse(spec)

  override def nullSafeEval(input: Any): Any =
    BpeStats.compute(input.asInstanceOf[UTF8String].toString, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bpeTable", table, "graft.exprs.BpeTable")
      s"${ev.value} = graft.exprs.BpeStats.compute($c.toString(), $ref);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeStats =
    copy(child = newChild)
}

/** `bpe_pairs(word, merge_spec)` — the pair-count primitive of BPE
  * TRAINING (t13): encode ONE word with the ranked merge table (the same
  * greedy lowest-rank loop as `bpe_stats`), then return its adjacent
  * symbol pairs as `"a b"` strings, with multiplicity and in order. The
  * trainer explodes this over the word-frequency vocabulary, weights by
  * frequency, and takes the argmax — one groupBy per training round.
  * Input is a single whitespace-free word (the vocab is built with
  * `ws_tokens`), not a document.
  */
case class BpePairs(child: Expression, spec: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_pairs requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_pairs"

  @transient private lazy val table: BpeTable = BpeStats.parse(spec)

  override def nullSafeEval(input: Any): Any =
    BpeStats.pairsOf(input.asInstanceOf[UTF8String].toString, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bpeTable", table, "graft.exprs.BpeTable")
      s"${ev.value} = graft.exprs.BpeStats.pairsOf($c.toString(), $ref);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpePairs =
    copy(child = newChild)
}

/** Parsed merge table + word-encoding memo (top-level class so the codegen
  * reference-object type name is plain Java).
  */
final class BpeTable(val pairRank: java.util.HashMap[String, Integer],
    val mergedId: java.util.HashMap[String, java.lang.Long]) extends Serializable {
  /** word → (n_tokens, sum of token ids); bounded (see memoCap). */
  @transient lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]
}

object BpeStats {

  /** Base alphabet: printable ASCII 33..126, id = code − 33. */
  val baseLo = 33
  val baseHi = 126
  val baseSize: Int = baseHi - baseLo + 1 // 94

  /** The ranked merge list — THE vocabulary definition, interpolated into
    * the DuckDB oracle so one constant drives both engines. Rank = list
    * index; merge output id = baseSize + rank. Later merges may consume
    * earlier outputs (`th`+`e`, `at`+`ion`) — that is what makes this BPE
    * rather than a digraph table.
    */
  val merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("i", "n"), ("a", "n"), ("e", "r"), ("o", "n"),
    ("r", "e"), ("h", "e"), ("a", "t"), ("e", "n"), ("n", "d"),
    ("o", "r"), ("e", "s"), ("s", "t"), ("a", "r"), ("o", "u"),
    ("i", "s"), ("a", "l"), ("i", "t"), ("e", "d"), ("th", "e"),
    ("an", "d"), ("in", "g"), ("t", "o"), ("o", "f"), ("er", "s"),
    ("the", "r"), ("i", "on"), ("at", "ion"), ("q", "u"), ("e", "a"))

  /** The spec string for the function's constant argument. */
  val spec: String = merges.map { case (a, b) => s"$a $b" }.mkString(";")

  /** Id of a FINAL symbol (used by the oracle generator too, via
    * interpolated CASE arms): single base-alphabet char → code − 33,
    * merge output → baseSize + rank, anything else → −1.
    */
  def symbolId(sym: String, mergedId: java.util.HashMap[String, java.lang.Long]): Long =
    if (sym.length == 1) {
      val c = sym.charAt(0).toInt
      if (c >= baseLo && c <= baseHi) (c - baseLo).toLong else -1L
    } else {
      val id = mergedId.get(sym)
      if (id == null) -1L else id.longValue()
    }

  def parse(spec: String): BpeTable = {
    val ranks = new java.util.HashMap[String, Integer]
    val ids = new java.util.HashMap[String, java.lang.Long]
    // empty spec = no merges yet (training round 0 counts raw char pairs)
    spec.split(";").filter(_.nonEmpty).zipWithIndex.foreach { case (s, i) =>
      val p = s.split(" ", 2)
      ranks.put(s"${p(0)} ${p(1)}", i)
      ids.put(p(0) + p(1), (baseSize + i).toLong)
    }
    new BpeTable(ranks, ids)
  }

  /** Memo cap: past this many distinct words, encode without caching
    * (bounded memory on adversarial/unique-heavy input; correctness
    * unaffected).
    */
  val memoCap = 100000

  /** The word's final symbol sequence under the merge loop — shared by
    * token counting (t12) and pair counting for training (t13).
    */
  private def encodeSymbols(w: String, t: BpeTable): java.util.ArrayList[String] = {
    // split by CODEPOINT, not UTF-16 unit: a supplementary-plane character
    // is ONE initial symbol (one unknown token), matching the oracle's
    // per-character indexing — charAt would split it into two surrogates
    val syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      syms.add(w.substring(i, i + n))
      i += n
    }
    var go = true
    while (go && syms.size > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = t.pairRank.get(s"${syms.get(j)} ${syms.get(j + 1)}")
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); bestPos = j }
        j += 1
      }
      if (bestPos < 0) go = false
      else {
        syms.set(bestPos, syms.get(bestPos) + syms.get(bestPos + 1))
        syms.remove(bestPos + 1)
      }
    }
    syms
  }

  private def encodeWord(w: String, t: BpeTable): (Long, Long) = {
    val syms = encodeSymbols(w, t)
    var n = 0L
    var sum = 0L
    var j = 0
    while (j < syms.size) {
      sum += symbolId(syms.get(j), t.mergedId)
      n += 1
      j += 1
    }
    (n, sum)
  }

  /** Adjacent symbol pairs (as "a b", with multiplicity) of ONE word after
    * encoding with `t` — the [[BpePairs]] kernel.
    */
  def pairsOf(word: String, t: BpeTable): ArrayData = {
    val syms = encodeSymbols(word, t)
    val out = new Array[Any](math.max(0, syms.size - 1))
    var j = 0
    while (j < syms.size - 1) {
      out(j) = UTF8String.fromString(s"${syms.get(j)} ${syms.get(j + 1)}")
      j += 1
    }
    new GenericArrayData(out)
  }

  def compute(text: String, t: BpeTable): ArrayData = {
    val words = TextSketches.tokenize(text)
    var nWords = 0L
    var nToks = 0L
    var idSum = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var enc = t.memo.get(w)
      if (enc == null) {
        enc = encodeWord(w, t)
        if (t.memo.size < memoCap) t.memo.put(w, enc)
      }
      nWords += 1
      nToks += enc._1
      idSum += enc._2
      i += 1
    }
    new GenericArrayData(Array[Any](nWords, nToks, idSum))
  }

  /** Registration triple for SparkSessionExtensions.injectFunction. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bpe_stats"),
      new ExpressionInfo(classOf[BpeStats].getName, "bpe_stats"),
      (cs: Seq[Expression]) => {
        if (cs.length != 2 || !cs(1).foldable) throw new IllegalArgumentException(
          "bpe_stats expects (text, constant merge spec)")
        BpeStats(cs.head, cs(1).eval().asInstanceOf[UTF8String].toString)
      })

  val pairsRegistration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bpe_pairs"),
      new ExpressionInfo(classOf[BpePairs].getName, "bpe_pairs"),
      (cs: Seq[Expression]) => {
        if (cs.length != 2 || !cs(1).foldable) throw new IllegalArgumentException(
          "bpe_pairs expects (word, constant merge spec)")
        BpePairs(cs.head, cs(1).eval() match {
          case null => ""
          case s => s.asInstanceOf[UTF8String].toString
        })
      })
}
