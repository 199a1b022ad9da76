package graft.exprs

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text/embedding sketch hot paths.
  *
  * The dedup/similarity operators were first written as declarative
  * higher-order-function trees (`transform`/`aggregate`/`zip_with`). Those
  * are semantically right but HOFs are interpreted per element — a MinHash
  * signature touched every shingle 12 times through a lambda interpreter,
  * and the SRP bucket recomputed 512 md5 calls per ROW for what are
  * compile-time constants. Each expression here does the same computation
  * as one compiled JVM loop per row and participates in whole-stage codegen
  * (`doGenCode` emits a static call — no interpreted fallback, no UDF
  * serialization).
  *
  * Bit-compatibility contract (the DuckDB oracle depends on it):
  *   - all hashing is md5 over UTF-8 bytes, first 8 hex chars as an
  *     unsigned 32-bit value — identical to `conv(substring(md5(x),1,8),
  *     16,10)` and DuckDB's `md5(x)[1:8]` nibble fold;
  *   - all float folds run in DOUBLE, ascending index order, acc+v —
  *     identical to `aggregate(zip_with(...))` and DuckDB `list_sum` over a
  *     list comprehension;
  *   - integer arithmetic is exact 64-bit (no overflow by construction).
  *
  * The original HOF formulations are kept in the test suite as reference
  * oracles: `TextSketchesSpec` asserts expression == HOF on real data.
  */
object TextSketches {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes of the UTF-8 input as an unsigned 32-bit value —
    * equals `conv(substring(md5(x), 1, 8), 16, 10)`.
    */
  def md5Head32(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** First 64 md5 bits, big-endian — the [[SimHash64]] bit source. */
  def md5Head64(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (h(i) & 0xffL)
      i += 1
    }
    v
  }

  /** Whitespace tokens of `Text.tokens` semantics: split on single spaces,
    * empties dropped, duplicates preserved.
    */
  def tokenize(s: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      var j = i
      while (j < n && s.charAt(j) != ' ') j += 1
      if (j > i) out += s.substring(i, j)
      i = j + 1
    }
    out.result()
  }

  def registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("shingles"),
        new ExpressionInfo(classOf[Shingles].getName, "shingles"),
        (cs: Seq[Expression]) => {
          if (cs.size > 1 && !cs(1).foldable) throw new IllegalArgumentException(
            "shingles: k must be a constant")
          Shingles(cs.head,
            if (cs.size > 1) cs(1).eval().asInstanceOf[Number].intValue() else 3)
        }),
      (FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
        (cs: Seq[Expression]) => MinHashSig(cs.head)),
      (FunctionIdentifier("simhash32"),
        new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
        (cs: Seq[Expression]) => SimHash32(cs.head)),
      (FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (cs: Seq[Expression]) => SimHash64(cs.head)),
      (FunctionIdentifier("array_dot"),
        new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
        (cs: Seq[Expression]) => ArrayDot(cs.head, cs(1))),
      (FunctionIdentifier("srp_bucket"),
        new ExpressionInfo(classOf[SrpBucket].getName, "srp_bucket"),
        (cs: Seq[Expression]) => {
          val n = if (cs.size < 2) SrpBucket.numPlanes
          else {
            if (!cs(1).foldable) throw new IllegalArgumentException(
              "srp_bucket: the plane count must be a constant")
            cs(1).eval().asInstanceOf[Number].intValue()
          }
          SrpBucket(cs.head, n)
        }),
      (FunctionIdentifier("int8_quantize"),
        new ExpressionInfo(classOf[Int8Quantize].getName, "int8_quantize"),
        (cs: Seq[Expression]) => Int8Quantize(cs.head)),
      (FunctionIdentifier("nfc_normalize"),
        new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
        (cs: Seq[Expression]) => NfcNormalize(cs.head)),
      (FunctionIdentifier("ws_tokens"),
        new ExpressionInfo(classOf[WsTokens].getName, "ws_tokens"),
        (cs: Seq[Expression]) => WsTokens(cs.head)),
      (FunctionIdentifier("lexicon_counts"),
        new ExpressionInfo(classOf[LexiconCounts].getName, "lexicon_counts"),
        (cs: Seq[Expression]) => {
          if (cs.size != 2 || !cs(1).foldable) throw new IllegalArgumentException(
            "lexicon_counts: the lexicon spec must be a constant string")
          LexiconCounts(cs.head,
            cs(1).eval().asInstanceOf[UTF8String].toString)
        }))
}

/** `shingles(text[, k])` — distinct k-word shingles in first-occurrence
  * order; empty array when the document has fewer than k tokens. Equals
  * `graft.ops.Text.shingles` (HOF formulation).
  */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "shingles: k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.exprs.Shingles.compute($c.toString(), $k);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  def compute(s: String, k: Int): ArrayData = {
    val toks = TextSketches.tokenize(s)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + k <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }
}

/** `minhash_sig(shingles)` — the 12-hash MinHash signature: base hash =
  * first 32 md5 bits of each shingle mod p, permuted by the affine family
  * (a_i·h + b_i) mod p; signature element i is the minimum over shingles.
  * Null for an empty shingle set (no signature — cannot near-dup match).
  * Constants are THE single definition: `graft.ops.Dedup` and the DuckDB
  * oracle SQL both interpolate from here.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.exprs.MinHashSig.compute($c);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val P = 2147483647L // 2^31 - 1 (Mersenne prime)
  val numHashes = 12
  val A: Array[Long] = Array(973717083L, 388916825L, 1122824377L,
    1156439251L, 1550959721L, 1241362649L, 2005430819L, 1558641197L,
    689046827L, 1927793921L, 1123562147L, 1653359563L)
  val B: Array[Long] = Array(1852938293L, 1706799503L, 1472706723L,
    1205230523L, 982616981L, 1121324977L, 1398263921L, 2044101221L,
    1870037483L, 1035371213L, 1497247889L, 656987819L)

  def compute(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // a·(h mod p) + b < 2^62: never overflows a 64-bit long
      val h = TextSketches.md5Head32(sh.getUTF8String(i).getBytes) % P
      var j = 0
      while (j < numHashes) {
        val v = (A(j) * h + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(v => v: Any))
  }
}

/** `simhash32(text)` — 32-bit SimHash over whitespace tokens (term
  * frequency preserved), rendered as a 32-char bitstring: bit b is 1 iff
  * more than half the tokens have md5-bit b set (Σ(2·bit−1) > 0).
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.exprs.SimHash32.compute($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  def compute(s: String): UTF8String = {
    val toks = TextSketches.tokenize(s)
    val ones = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val h = TextSketches.md5Head32(toks(i).getBytes("UTF-8"))
      var b = 0
      while (b < 32) {
        ones(b) += ((h >>> (31 - b)) & 1L).toInt
        b += 1
      }
      i += 1
    }
    val n = toks.length
    val out = new Array[Char](32)
    var b = 0
    while (b < 32) {
      out(b) = if (ones(b) * 2 > n) '1' else '0'
      b += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** `simhash64(text)` — 64-bit SimHash over whitespace tokens, packed as a
  * LONG (bit b of the [[SimHash32]]-style bitstring is long bit 63−b):
  * the scale dial the 32-bit signature's fixed 2×16-bit probe domain
  * caps out of. Same vote rule per bit, twice the bits — collision-driven
  * false candidates drop by 2³² while the 4×16-bit exact-block candidate
  * join ([[graft.ops.Dedup.simhashPairs64]]) keeps full recall at
  * Hamming ≤ 3 by pigeonhole.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.exprs.SimHash64.compute($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def compute(s: String): Long = {
    val toks = TextSketches.tokenize(s)
    val ones = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = TextSketches.md5Head64(toks(i).getBytes("UTF-8"))
      var b = 0
      while (b < 64) {
        ones(b) += ((h >>> (63 - b)) & 1L).toInt
        b += 1
      }
      i += 1
    }
    val n = toks.length
    var out = 0L
    var b = 0
    while (b < 64) {
      if (ones(b) * 2 > n) out |= 1L << (63 - b)
      b += 1
    }
    out
  }
}

/** `array_dot(a, b)` — dot product of two float/double arrays in DOUBLE,
  * folded in ascending index order (acc + a_i·b_i). Null if lengths differ
  * or any touched element is null — exactly the
  * `aggregate(zip_with(a, b, _·_), 0.0, _+_)` semantics it replaces.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires two array<float|double> arguments, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  private def isFloatL = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def isFloatR = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatL, isFloatR)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r =
         |  graft.exprs.ArrayDot.compute($a, $b, $isFloatL, $isFloatR);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(left = l, right = r)
}

object ArrayDot {
  def compute(a: ArrayData, b: ArrayData, fa: Boolean, fb: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

/** `srp_bucket(embedding[, numPlanes])` — sign-random-projection bucket:
  * bit p is the sign of the dot product with hyperplane p, whose
  * components are ±1 from md5 hex parity (`md5("h<p>:<j>")` first nibble
  * odd → +1). The hyperplanes are deterministic CONSTANTS — precomputed
  * here once, not recomputed per row as the HOF formulation did (512 md5
  * calls per row).
  *
  * `numPlanes` (default 8, max [[SrpBucket.maxPlanes]]) is the
  * precision/recall dial: plane p is independent of the count, so a
  * narrower bucket is a PREFIX of a wider one — `srp_bucket(e, 32)`
  * computed once can be sliced into 8-bit bands for an OR-construction
  * (see `Similarity.srpBandedPairs`), and `srp_bucket(e)` equals its
  * first 8 characters.
  */
case class SrpBucket(child: Expression, numPlanes: Int = SrpBucket.numPlanes)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if numPlanes < 1 || numPlanes > SrpBucket.maxPlanes =>
      TypeCheckResult.TypeCheckFailure(
        s"srp_bucket supports 1..${SrpBucket.maxPlanes} planes, got $numPlanes")
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket requires array<float|double>, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "srp_bucket"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    SrpBucket.compute(input.asInstanceOf[ArrayData], isFloat, numPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.unsafe.types.UTF8String ${ev.value}_r =
         |  graft.exprs.SrpBucket.compute($c, $isFloat, $numPlanes);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}

object SrpBucket {
  /** Default plane count — kept at 8 for oracle parity with the original
    * surface; wider corpora dial this up (or band a wide bucket, see the
    * class doc).
    */
  val numPlanes = 8
  val maxPlanes = 32
  private val maxDim = 1024

  /** planes(p)(j) = +1 when the first hex digit of md5("h<p>:<j>") is odd,
    * else −1 — byte-identical to the Column/SQL derivation, computed once
    * for all [[maxPlanes]] (plane p does not depend on the requested
    * count, so every width shares this one table).
    */
  lazy val planes: Array[Array[Double]] = {
    val d = MessageDigest.getInstance("MD5")
    Array.tabulate(maxPlanes) { p =>
      Array.tabulate(maxDim) { j =>
        d.reset()
        val h = d.digest(s"h$p:$j".getBytes("UTF-8"))
        // first hex char = high nibble of byte 0
        if (((h(0) >> 4) & 1) == 1) 1.0 else -1.0
      }
    }
  }

  def compute(e: ArrayData, isFloat: Boolean, nPlanes: Int): UTF8String = {
    val n = e.numElements()
    if (n > maxDim) {
      throw new IllegalArgumentException(
        s"srp_bucket supports up to $maxDim dims, got $n")
    }
    val out = new Array[Char](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val plane = planes(p)
      var acc = 0.0
      var j = 0
      while (j < n) {
        if (e.isNullAt(j)) return null
        val x = if (isFloat) e.getFloat(j).toDouble else e.getDouble(j)
        acc += plane(j) * x
        j += 1
      }
      out(p) = if (acc > 0) '1' else '0'
      p += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** `int8_quantize(embedding)` — symmetric int8 quantization in one codegen
  * pass: per-vector scale = max|x|/127, components `round(x/scale)` as
  * doubles (integers in [-127, 127], exact in IEEE 754). Null for the
  * all-zero/empty vector (scale 0 ⇒ undefined direction) and on any null
  * element. Byte-identical to the HOF formulation it replaces
  * (`aggregate` max + `transform` round, interpreted per element —
  * quantization is the full-corpus pass of the ANN pipeline, so it
  * belongs in compiled code): rounding uses the same BigDecimal HALF_UP
  * Spark's `round` applies to doubles.
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8_quantize requires array<float|double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "int8_quantize"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    Int8Quantize.compute(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.exprs.Int8Quantize.compute($c, $isFloat);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

object Int8Quantize {
  /** Spark `Round` semantics for DoubleType at scale 0: decimal HALF_UP
    * over the double's shortest decimal representation (scala BigDecimal),
    * NOT `Math.round` (which differs on negative .5 ties).
    */
  private def roundHalfUp(x: Double): Double =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble

  def compute(e: ArrayData, isFloat: Boolean): ArrayData = {
    val n = e.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (e.isNullAt(i)) return null
      val a = math.abs(if (isFloat) e.getFloat(i).toDouble else e.getDouble(i))
      if (a > mx) mx = a
      i += 1
    }
    val scale = mx / 127.0
    if (!(scale > 0)) return null
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val x = if (isFloat) e.getFloat(i).toDouble else e.getDouble(i)
      out(i) = roundHalfUp(x / scale)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `lexicon_counts(text, 'w1,w2|w3,w4|…')` — ONE tokenizing pass per row
  * that returns `array<long>` of length N+2 for N `|`-separated lexicons:
  * `[hits in lexicon 1, …, hits in lexicon N, token count, distinct token
  * count]`. Tokenization is `Text.tokens` semantics (single-space split,
  * empties dropped, duplicates preserved); a token present in several
  * lexicons counts for each — the same semantics as N independent
  * `size(filter(t, isin(...)))` passes, which this replaces: those HOF
  * lambdas are interpreted per element and re-tokenize per lexicon (the
  * language-ID scorer paid 4 interpreted passes per row), while this is one
  * compiled loop with O(1) set probes that participates in whole-stage
  * codegen.
  */
case class LexiconCounts(child: Expression, spec: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lexicon_counts requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lexicon_counts"

  @transient private lazy val lexicons: Array[java.util.HashSet[String]] =
    LexiconCounts.parse(spec)

  override def nullSafeEval(input: Any): Any =
    LexiconCounts.compute(input.asInstanceOf[UTF8String].toString, lexicons)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // the parsed sets ride along as a codegen reference object — parsed
      // once on the driver, never per row
      val ref = ctx.addReferenceObj("lexicons", lexicons, "java.util.HashSet[]")
      s"${ev.value} = graft.exprs.LexiconCounts.compute($c.toString(), $ref);"
    })

  override protected def withNewChildInternal(newChild: Expression): LexiconCounts =
    copy(child = newChild)
}

object LexiconCounts {
  def parse(spec: String): Array[java.util.HashSet[String]] =
    spec.split("\\|", -1).map { lex =>
      val s = new java.util.HashSet[String]()
      lex.split(",").foreach(w => if (w.nonEmpty) s.add(w))
      s
    }

  def compute(s: String, lexicons: Array[java.util.HashSet[String]]): ArrayData = {
    val toks = TextSketches.tokenize(s)
    val n = lexicons.length
    val out = new Array[Any](n + 2)
    val counts = new Array[Long](n)
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      seen.add(t)
      var j = 0
      while (j < n) {
        if (lexicons(j).contains(t)) counts(j) += 1
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < n) { out(i) = counts(i); i += 1 }
    out(n) = toks.length.toLong
    out(n + 1) = seen.size.toLong
    new GenericArrayData(out)
  }
}

/** `ws_tokens(text)` — whitespace tokens of `Text.tokens` semantics
  * (single-space split, empties dropped, duplicates preserved) as one
  * compiled pass. This is THE tokenizer feeding explode/size across the
  * text operators; the HOF formulation (`filter(split(text, " "), ...)`)
  * runs its lambda through the expression interpreter per element, which
  * puts an interpreter in front of every downstream aggregation.
  */
case class WsTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ws_tokens requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"

  override def nullSafeEval(input: Any): Any =
    WsTokens.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.exprs.WsTokens.compute($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

object WsTokens {
  def compute(s: String): ArrayData = {
    val toks = TextSketches.tokenize(s)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** `nfc_normalize(s)` — Unicode NFC normalization (canonical compose), the
  * first stage of any text-cleaning pipeline: visually identical strings
  * with different codepoint sequences (e + combining acute vs é) hash,
  * shingle, and dedup differently until they are normalized, so every
  * hash-based operator upstream silently under-dedups un-normalized text.
  *
  * Codegen expression over `java.text.Normalizer` with an
  * `isNormalized` fast path — ASCII and already-NFC text (the vast
  * majority of any real corpus) pays one scan and zero allocation.
  * DuckDB's `nfc_normalize` is the oracle twin (both implement Unicode
  * canonical composition; the t21 gauntlet pins the cases).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.exprs.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
