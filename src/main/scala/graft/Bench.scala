package graft

import java.nio.file.{Files, Paths}

import scala.util.control.NonFatal

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * emits ONE bare JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Harness notes (round-1/3/4 postmortems):
  *   - a warm-up pass runs first so the first timed query does not absorb
  *     JVM/codegen/first-parquet-read startup;
  *   - query failures are NOT swallowed into a fast wall time — a failed
  *     query records `-1` in `queries`, lands in an `"errors"` object, and
  *     the process exits nonzero;
  *   - the JSON line is printed to stdout (build.sbt pins
  *     `run / outputStrategy := StdoutOutput` so sbt does not prefix it
  *     with `[info]`);
  *   - the driver keeps only the LAST 2000 chars of stdout (BENCH_r03 and
  *     r04 both tail-truncated mid-line → `parsed: null`), so the stdout
  *     line uses COMPACT query keys (unique prefix before the first `_`,
  *     e.g. `"q1"`, matching the spec's own example) and 2-dp timings to
  *     stay well under that buffer even with the sbt `[success]` trailer;
  *   - the full-name full-precision line is written to BENCH_LOCAL.json in
  *     cwd and to SPARK_GRAFT_BENCH_OUT if set — that is the durable copy
  *     for cross-round per-query comparison.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("graft-bench")

    // Warm-up: touch each hot table scan + a shuffle + the sketch-expression
    // codegen once, untimed, so the first timed query of each family does
    // not absorb JVM/codegen/first-parquet-read startup.
    def warm(f: => Long): Unit = try { f; () } catch { case NonFatal(_) => () }
    warm(graft.operators.Relational.q1PricingSummary(spark, sfDir).count())
    warm(graft.ops.Dedup.simhashSignatures(spark, sfDir).count())
    warm(graft.ops.Similarity.annLsh(spark, sfDir).count())
    warm(graft.sources.Tables.events(spark, sfDir).count())

    var errors = Map.empty[String, String]
    // Name-sorted: Map iteration order is hash-arbitrary, which would move
    // queries relative to residual warm-up between rounds and make
    // per-query timings incomparable across BENCH_r{N} files.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case NonFatal(e) =>
          errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    // Compact key: the prefix before the first '_' when unique across the
    // query set (q1, d7, s4, …), the full name otherwise (ooh_occupations /
    // ooh_report share "ooh"). Deterministic, round-stable.
    val byPrefix = results.map(_._1).groupBy(_.takeWhile(_ != '_'))
    def shortKey(name: String): String = {
      val p = name.takeWhile(_ != '_')
      if (byPrefix(p).sizeIs == 1) p else name
    }
    def sec2(v: Double): String = {
      val s = f"$v%.2f".reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      if (s.isEmpty || s == "-") s + "0" else s
    }
    def queriesJson(fmtKey: String => String, fmtVal: Double => String): String =
      results.map { case (k, v) => s""""${esc(fmtKey(k))}":${fmtVal(v)}""" }
        .mkString("{", ",", "}")
    def errJson(maxMsg: Int): String =
      errors.map { case (k, v) => s""""${esc(k)}":"${esc(v.take(maxMsg))}"""" }
        .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    def mkLine(qs: String, totalStr: String, errs: String): String =
      s"""{"metric":"total","value":$totalStr,"unit":"sec","queries":$qs,"errors":$errs,"sf":"${esc(sfDir)}"}"""
    val fullLine = mkLine(queriesJson(identity, _.toString), total.toString, errJson(200))
    // 30-char error snippets on stdout: a multi-failure run with 200-char
    // messages would push the line past the driver's 2000-char tail —
    // re-truncating it exactly when the errors matter. Full messages live
    // in the file copy and failure is already signalled by exit 1.
    val compactLine = mkLine(queriesJson(shortKey, sec2), sec2(total), errJson(30))

    if (compactLine.length > 1800)
      System.err.println(s"WARNING: bench stdout line is ${compactLine.length} chars; " +
        "the driver keeps only a 2000-char tail — shorten keys/precision before it truncates")
    println(compactLine)
    System.out.flush()
    // Durable full-detail copy: the driver's stdout capture keeps only a
    // 2000-char tail, so the full-name full-precision line lives in files.
    try Files.writeString(Paths.get("BENCH_LOCAL.json"), fullLine + "\n")
    catch { case NonFatal(_) => () }
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach(p => Files.writeString(Paths.get(p), fullLine + "\n"))
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
