package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.exprs.MinHashSig
import graft.sources.Tables

/** The native sketch expressions (graft.exprs.TextSketches) must be
  * bit-identical to the declarative HOF formulations they replaced — those
  * formulations are reproduced here verbatim as reference oracles and
  * compared over real table data, plus edge cases the tables don't hit.
  */
class TextSketchesSpec extends SparkSpec {
  import spark.implicits._

  // --- HOF reference formulations (the pre-optimization operators) -------

  private def tokensH(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  private def shinglesH(text: Column, k: Int = 3): Column = {
    val t = tokensH(text)
    when(size(t) >= k,
      array_distinct(transform(sequence(lit(0), size(t) - k), i =>
        array_join(slice(t, i + 1, lit(k)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  private def minhashSigH(sh: Column): Column = {
    val p = MinHashSig.P
    val hs = transform(sh, s =>
      conv(substring(md5(s), 1, 8), 16, 10).cast("long") % p)
    array((0 until MinHashSig.numHashes).map(i =>
      array_min(transform(hs,
        h => (lit(MinHashSig.A(i)) * h + lit(MinHashSig.B(i))) % p))): _*)
  }

  private def simhashH(text: Column): Column = {
    val toks = tokensH(text)
    val hsBits = transform(toks, t =>
      lpad(bin(conv(substring(md5(t), 1, 8), 16, 10).cast("long")), 32, "0"))
    val ones = aggregate(hsBits, array_repeat(lit(0), 32), (acc, s) =>
      zip_with(acc, slice(split(s, ""), 1, 32), (a, c) =>
        a + when(c === "1", 1).otherwise(0)))
    array_join(
      transform(ones, o => when(o * 2 > size(toks), lit("1")).otherwise(lit("0"))), "")
  }

  private def dotH(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def lshBucketH(e: Column): Column = {
    def planeComponent(p: Column, j: Column): Column = {
      val h = md5(concat(lit("h"), p.cast("string"), lit(":"), j.cast("string")))
      (conv(h.substr(1, 1), 16, 10).cast("int") % 2) * 2 - 1
    }
    array_join(
      transform(sequence(lit(0), lit(7)), p => {
        val s = aggregate(
          transform(sequence(lit(0), size(e) - 1), j =>
            planeComponent(p, j) * get(e, j).cast("double")),
          lit(0.0), (acc, v) => acc + v)
        when(s > 0, lit("1")).otherwise(lit("0"))
      }), "")
  }

  private def mismatches(df: org.apache.spark.sql.DataFrame): Long =
    df.where(not(col("want") <=> col("got"))).count()

  // --- parity over real data ---------------------------------------------

  test("ws_tokens == HOF reference over sf0.001 documents (plus edge cases)") {
    val df = Tables.documents(spark, sf0001).select(
      tokensH(col("text")).as("want"),
      call_function("ws_tokens", col("text")).as("got"))
    assert(mismatches(df) == 0)
    val edges = Seq("", "   ", "a  b", " lead", "trail ", "a b a").toDF("text")
      .select(tokensH(col("text")).as("want"),
        call_function("ws_tokens", col("text")).as("got"))
    assert(mismatches(edges) == 0)
  }

  test("shingles == HOF reference over sf0.001 documents") {
    val df = Tables.documents(spark, sf0001).select(
      shinglesH(col("text")).as("want"),
      call_function("shingles", col("text"), lit(3)).as("got"))
    assert(mismatches(df) == 0)
  }

  test("minhash_sig == HOF reference over sf0.001 documents") {
    val df = Tables.documents(spark, sf0001)
      .select(call_function("shingles", col("text"), lit(3)).as("sh"))
      .where(size(col("sh")) > 0)
      .select(minhashSigH(col("sh")).as("want"),
        call_function("minhash_sig", col("sh")).as("got"))
    assert(mismatches(df) == 0)
  }

  test("simhash32 == HOF reference over sf0.001 documents") {
    val df = Tables.documents(spark, sf0001).select(
      simhashH(col("text")).as("want"),
      call_function("simhash32", col("text")).as("got"))
    assert(mismatches(df) == 0)
  }

  test("array_dot == HOF reference over sf0.001 embeddings (incl. norms)") {
    val e = Tables.embeddings(spark, sf0001)
    val pairs = e.select(col("vec_id"), col("embedding").as("a"))
      .join(e.select((col("vec_id") + 50).as("vec_id"), col("embedding").as("b")), "vec_id")
    assert(mismatches(pairs.select(dotH(col("a"), col("b")).as("want"),
      call_function("array_dot", col("a"), col("b")).as("got"))) == 0)
    assert(mismatches(e.select(dotH(col("embedding"), col("embedding")).as("want"),
      call_function("array_dot", col("embedding"), col("embedding")).as("got"))) == 0)
  }

  test("srp_bucket == HOF reference over sf0.001 embeddings") {
    val df = Tables.embeddings(spark, sf0001).select(
      lshBucketH(col("embedding")).as("want"),
      call_function("srp_bucket", col("embedding")).as("got"))
    assert(mismatches(df) == 0)
  }

  test("int8_quantize == HOF reference over sf0.001 embeddings") {
    // the aggregate-max + transform-round formulation it replaces
    val e = transform(col("embedding"), x => x.cast("double"))
    val scale = aggregate(e, lit(0.0), (a, x) => greatest(a, abs(x))) / 127.0
    val want = when(scale > 0, transform(e, x => round(x / scale).cast("double")))
    val df = Tables.embeddings(spark, sf0001).select(
      want.as("want"),
      call_function("int8_quantize", col("embedding")).as("got"))
    assert(mismatches(df) == 0)
  }

  test("int8_quantize: all-zero vector is null; ties round HALF_UP like round()") {
    val z = Seq(Seq(0.0f, 0.0f)).toDF("a")
      .select(call_function("int8_quantize", col("a"))).head()
    assert(z.isNullAt(0))
    // max = 127 so scale = 1: ±2.5 must round like Spark's round(): 3 / -3
    val t = Seq(Seq(2.5, -2.5, 127.0)).toDF("a")
      .select(call_function("int8_quantize", col("a"))).head().getSeq[Double](0)
    assert(t == Seq(3.0, -3.0, 127.0))
  }

  // --- edge cases ----------------------------------------------------------

  test("shingles: fewer than k tokens yields empty array; null passes through") {
    val got = Seq("a b", "x", "", "a a a a").toDF("s")
      .select(call_function("shingles", col("s"), lit(3)).as("r"))
      .collect().map(_.getSeq[String](0))
    assert(got(0).isEmpty && got(1).isEmpty && got(2).isEmpty)
    assert(got(3) == Seq("a a a")) // duplicates collapse, order preserved
    val n = Seq(Option.empty[String]).toDF("s")
      .select(call_function("shingles", col("s"), lit(3))).head()
    assert(n.isNullAt(0))
  }

  test("minhash_sig: empty shingle set yields null (no signature)") {
    val r = Seq(Seq.empty[String]).toDF("sh")
      .select(call_function("minhash_sig", col("sh"))).head()
    assert(r.isNullAt(0))
  }

  test("simhash32: zero tokens yields the all-zero signature") {
    val r = Seq("", "   ").toDF("s")
      .select(call_function("simhash32", col("s"))).collect()
    assert(r.forall(_.getString(0) == "0" * 32))
  }

  test("array_dot: length mismatch and double arrays") {
    val mismatch = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
      .select(call_function("array_dot", col("a"), col("b"))).head()
    assert(mismatch.isNullAt(0))
    val d = Seq((Seq(1.5, 2.0), Seq(2.0, 3.0))).toDF("a", "b")
      .select(call_function("array_dot", col("a"), col("b"))).head().getDouble(0)
    assert(d == 9.0)
  }

  test("bottom_k_md5 UDAF: distinct, sorted, bounded; merge-safe across partitions") {
    val df = Seq("a", "b", "a", "c", "d", "e", "b").toDF("s").repartition(5)
    spark.udf // force session init
    df.createOrReplaceTempView("bk_in")
    val got = spark.sql("SELECT bottom_k_md5(s, 3) AS sk FROM bk_in")
      .head().getSeq[String](0)
    // expected: 3 smallest of the 5 DISTINCT md5s, ascending
    val want = Seq("a", "b", "c", "d", "e")
      .map(s => graft.exprs.BottomKMd5.md5Hex(s.getBytes("UTF-8"))).sorted.take(3)
    assert(got == want)
    // group smaller than k: returns all distinct hashes, no padding
    val small = spark.sql("SELECT bottom_k_md5(s, 99) AS sk FROM bk_in")
      .head().getSeq[String](0)
    assert(small.length == 5 && small == small.sorted)
  }

  test("simhash64: single token = its md5 head; consistency with the 32-bit prefix vote") {
    // one token: every bit's majority vote IS that token's md5 bit, so the
    // signature equals the first 64 md5 bits verbatim
    import spark.implicits._
    val got = Seq("hello").toDF("s")
      .select(call_function("simhash64", col("s"))).head().getLong(0)
    assert(got == graft.exprs.TextSketches.md5Head64("hello".getBytes("UTF-8")))
    // the high 32 bits vote on the same md5 bits as simhash32 — for any
    // text the prefix must match the 32-bit signature exactly
    val both = graft.sources.Tables.documents(spark, sf0001)
      .select(call_function("simhash32", col("text")).as("s32"),
        call_function("simhash64", col("text")).as("s64"))
      .where(conv(col("s32"), 2, 10).cast("long") =!=
        shiftrightunsigned(col("s64"), 32))
    assert(both.count() == 0, "simhash64 high half diverged from simhash32")
    // zero tokens → all-zero signature, matching the 32-bit convention
    assert(Seq("   ").toDF("s")
      .select(call_function("simhash64", col("s"))).head().getLong(0) == 0L)
  }

  test("d17: 4-block index fans out exactly 4 rows per doc — no probe-variant explosion") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val n = docs.count()
    val sigs = docs.select(col("doc_id"),
      call_function("simhash64", col("text")).as("sigint"))
    assert(graft.ops.Dedup.blockBandsOf(sigs).count() == 4 * n)
    // identical texts pair at hamming 0 under the strict 64-bit predicate
    val pairs = graft.ops.Dedup.simhashPairs64(spark, sf0001)
    assert(pairs.where(col("hamming") === 0).count() > 0,
      "exact clones should survive the 64-bit hamming<=3 predicate")
    // stricter-by-construction vs a hamming bound is not comparable across
    // hash widths, but recall at hamming 0 is: every d1 exact-dup pair of
    // equal TEXT must appear (same tokens => same signature)
    val h = graft.ops.Dedup.simhashPairs64(spark, sf0001, maxHamming = 0)
    assert(h.count() <= pairs.count())
  }

  test("sketch expressions are callable from SQL text (extension surface)") {
    val r = spark.sql(
      "SELECT simhash32('a b c') AS s, shingles('a b c d', 2) AS sh, " +
        "array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getString(0).length == 32)
    assert(r.getSeq[String](1) == Seq("a b", "b c", "c d"))
    assert(r.getDouble(2) == 11.0)
  }
}
