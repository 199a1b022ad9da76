package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-data-pipeline operators.
  *
  * Everything here is a pure Column expression (codegen-friendly, no UDFs)
  * and — deliberately — reproducible in ANSI SQL on the DuckDB oracle:
  * tokenization is a split+filter, and all hashing is md5 hex strings,
  * which both engines render identically (lowercase hex). That makes even
  * the randomized-looking operators (MinHash, SimHash, random projections)
  * bit-for-bit deterministic across engines.
  */
object Text {

  /** Whitespace tokens, empties dropped (duplicates preserved). Backed by
    * the native [[graft.exprs.WsTokens]] codegen expression — the HOF
    * formulation (`filter(split(text, " "), _ =!= "")`) interprets its
    * lambda per element, and this tokenizer sits in front of every text
    * operator's hot path. Parity pinned in TextSketchesSpec.
    */
  def tokens(text: Column): Column =
    call_function("ws_tokens", text)

  /** Distinct k-word shingles in first-occurrence order. Empty array (not
    * null) when the document has fewer than k tokens. Backed by the native
    * [[graft.exprs.Shingles]] codegen expression (one compiled pass per
    * row); the equivalent HOF formulation lives in TextSketchesSpec as the
    * reference oracle.
    */
  def shingles(text: Column, k: Int = 3): Column =
    call_function("shingles", text, lit(k))

  /** Case/whitespace normalization for exact dedup. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Small English stopword set used by the heuristic scorers. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** One compiled pass over the text returning `[hits in lexicon 1, …,
    * hits in lexicon N, token count, distinct token count]` as
    * `array<long>` — the native [[graft.exprs.LexiconCounts]] codegen
    * expression. The equivalent N-pass `size(filter(t, isin(...)))` HOF
    * formulation lives in LexiconCountsSpec as the reference oracle.
    */
  def lexiconCounts(text: Column, lexicons: Seq[Seq[String]]): Column =
    call_function("lexicon_counts", text,
      lit(lexicons.map(_.mkString(",")).mkString("|")))

  /** Stopword fraction of the tokens; an EMPTY document scores 0.0 — the
    * zero-token branch must short-circuit (ANSI double division throws on
    * /0, and CaseWhen evaluates only the taken branch), so a single empty
    * string anywhere in a real corpus cannot kill the stats job.
    */
  def stopwordRatio(text: Column): Column = {
    val lc = lexiconCounts(text, Seq(stopwords))
    when(element_at(lc, 2) === lit(0L), lit(0.0))
      .otherwise(element_at(lc, 1).cast("double") / element_at(lc, 2))
  }
}
