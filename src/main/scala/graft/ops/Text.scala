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

  /** Whitespace tokens, empties dropped (duplicates preserved). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Distinct k-word shingles in first-occurrence order. Empty array (not
    * null) when the document has fewer than k tokens.
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val t = tokens(text)
    when(size(t) >= k,
      array_distinct(transform(sequence(lit(0), size(t) - k), i =>
        array_join(slice(t, i + 1, lit(k)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Case/whitespace normalization for exact dedup. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Small English stopword set used by the heuristic scorers. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    size(filter(t, w => w.isin(stopwords: _*))).cast("double") / size(t)
  }
}
