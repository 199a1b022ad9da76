package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stdout contract: the driver keeps only the LAST 2000
  * chars of stdout (BENCH_r03/r04 both tail-truncated mid-line → parsed:
  * null), so the compact line must stay comfortably under that even as
  * the query set grows. Asserted at the CURRENT query count plus 20
  * synthetic future queries, per the round-5 verdict.
  */
class BenchLineSpec extends AnyFunSuite {

  // the measured sf0.1 board shape (r13: 117/177 sub-second, 59 at 1-10 s,
  // 1 above 10 s) — the canary models the whole +20 board at this
  // distribution (two thirds sub-second, a third at 1-10 s, one in nine
  // above 10 s, which pessimizes the >10 s share 20-fold)
  private val realisticMins = Seq(0.3, 0.4, 0.5, 0.6, 0.8, 0.9, 1.2, 3.5, 11.0)

  private def syntheticStats(extra: Int): Seq[Bench.QStat] = {
    val current = SparkEntry.queries.keys.toSeq.sorted
    // future queries get realistically-long names
    val future = (0 until extra).map(i => f"z$i%02d_future_operator_name")
    (current ++ future).zipWithIndex.map { case (n, i) =>
      val v = realisticMins(i % realisticMins.length)
      Bench.QStat(n, v * 2, v, v * 9)
    }
  }

  test("compact stdout line stays under the driver's tail at +20 queries, 300-char headroom") {
    // 1700 = the driver's 2000-char tail minus ≥300 chars of headroom
    // (sbt's [success] trailer plus future growth) — the round-14 bound
    // after the decisecond byte diet
    val line = Bench.compactLine(syntheticStats(20), Map.empty, 3, "/root/testdata/sf0.1")
    assert(line.length < 1700, s"compact line is ${line.length} chars:\n$line")
  }

  test("compact line survives a multi-failure run without blowing the buffer") {
    val stats = syntheticStats(20)
    val errors = stats.take(10).map(s =>
      s.name -> ("x" * 500)).toMap // snippets must be truncated to 30 chars
    val line = Bench.compactLine(stats.map(s =>
      if (errors.contains(s.name)) s.copy(med = -1, min = -1, max = -1) else s),
      errors, 3, "/root/testdata/sf0.1")
    assert(line.length < 2000, s"compact line is ${line.length} chars")
    assert(!line.contains("x" * 31), "error snippet not truncated to 30 chars")
  }

  test("compact line reports per-query MIN in declared deciseconds; file line keeps full seconds") {
    val stats = Seq(Bench.QStat("q1_agg", 12.0, 1.5, 99.0),
      Bench.QStat("d7_clusters", 8.0, 7.5, 50.0),
      Bench.QStat("t3_quality_scores", 1.0, -1.0, 1.0))
    val line = Bench.compactLine(stats, Map.empty, 3, "sf")
    // per-query values are integer DECISECONDS, self-declared by qunit,
    // packed as one `shortkey:value` token string (round-14 diet part
    // two); the failure sentinel stays -1 regardless of unit
    assert(line.contains(""""qu":"ds""""), s"unit declaration missing: $line")
    assert(line.contains("q1:15"), line)
    assert(line.contains("d7:75"), line)
    assert(line.contains("t3:-1"), line)
    // the top-level total stays SECONDS (failures excluded from the sum)
    assert(line.contains(""""value":9"""), s"total must sum mins in seconds: $line")
    // the empty errors object is elided (byte diet) — the json stays valid
    assert(!line.contains(""""errors""""), s"empty errors must be elided: $line")
    // min/med/max live in the FILE line under their own keys, in seconds
    val full = Bench.fullLine(stats, Map.empty, 3, "sf")
    assert(full.contains(""""min":""") && full.contains(""""max":"""),
      s"file line must carry the statistic breakdown: $full")
    assert(full.contains(""""q1_agg":12.0"""),
      s"file line must keep full-precision seconds: $full")
    // BASELINE POLICY (round 18): the committed denominator "queries" is
    // the per-query MIN over passes — the statistic box contention cannot
    // inflate — matching the stdout headline; median rides under "med"
    assert(full.contains(""""queries":{"q1_agg":1.5,"""),
      s"'queries' must publish the per-query min (the 2x-gate denominator): $full")
    assert(full.contains(""""med":{"q1_agg":12.0,"""),
      s"the median must stay visible under 'med': $full")
  }

  test("file line carries the per-pass fixed-cost canary for box-drift attribution") {
    val stats = Seq(Bench.QStat("q1_agg", 12.0, 1.5, 99.0))
    // one canary sample per pass, full precision, stdout line untouched
    val full = Bench.fullLine(stats, Map.empty, 3, "sf", Seq(0.012, 0.01, 0.011),
      Seq(0.1, 0.09, 0.11), Seq(0.02, 0.018, 0.021))
    assert(full.contains(""""canary":[0.012,0.01,0.011]"""), full)
    // the shuffle canary rides beside it: the codegen canary is driver+
    // one-task only and cannot see drift living in shuffle overhead
    assert(full.contains(""""shuffleCanary":[0.1,0.09,0.11]"""), full)
    // and the small-file metadata canary beside both (round 20): a
    // measured +22% board epoch sat entirely in FS metadata work while
    // the CPU and shuffle canaries stayed at floor
    assert(full.contains(""""fsCanary":[0.02,0.018,0.021]"""), full)
    val compact = Bench.compactLine(stats, Map.empty, 3, "sf")
    assert(!compact.contains("canary"),
      "the canary must not spend stdout tail bytes")
    // absent canary (unit-test callers) renders an empty array, valid JSON
    assert(Bench.fullLine(stats, Map.empty, 3, "sf").contains(""""canary":[]"""))
    assert(Bench.fullLine(stats, Map.empty, 3, "sf").contains(""""shuffleCanary":[]"""))
    assert(Bench.fullLine(stats, Map.empty, 3, "sf").contains(""""fsCanary":[]"""))
  }

  test("a pathological all-slow board still fits via the whole-second rail") {
    // every query at 150 s — absurd for a healthy board (that bench run
    // takes a day), but the line must stay parseable: the
    // value-degradation rail drops per-query resolution to whole seconds
    // (the round-14 token-string diet absorbed the old 30 s case in
    // deciseconds outright — the rail now engages one severity later)
    val slow = syntheticStats(20).map(s => s.copy(min = 1500.0))
    val line = Bench.compactLine(slow, Map.empty, 3, "/root/testdata/sf0.1")
    assert(line.length < 1950, s"pathological line is ${line.length} chars")
    assert(line.contains(""""qu":"s""""),
      s"the whole-second rail must declare itself: ${line.take(120)}")
    // beyond even that (every query a day+), the unconditional floor
    // keeps the total and points at the file line
    val absurd = syntheticStats(20).map(s => s.copy(min = 99999.9))
    val floor = Bench.compactLine(absurd, Map.empty, 3, "/root/testdata/sf0.1")
    assert(floor.length < 1950, s"floor line is ${floor.length} chars")
    assert(floor.contains("\"q\":\"\"") && floor.contains("BENCH_LOCAL"), floor)
  }

  test("stdout errors object is capped with an (omitted) count") {
    val stats = syntheticStats(0)
    val errors = stats.take(Bench.maxStdoutErrors + 5)
      .map(s => s.name -> "boom").toMap
    val line = Bench.compactLine(stats, errors, 3, "sf")
    assert(line.contains(""""(omitted)":5"""), line)
    assert(errors.keys.toSeq.sorted.take(Bench.maxStdoutErrors)
      .forall(k => line.contains(k)), "first N error names must survive")
    // the full file line keeps every error, uncapped
    val full = Bench.fullLine(stats, errors, 3, "sf")
    assert(errors.keys.forall(k => full.contains(k)))
    assert(!full.contains("(omitted)"))
  }

  test("natural pass order: d7 (label memo fill) runs before d10 (state reload)") {
    val names = Seq("d10_clusters_persisted", "d7_dup_clusters", "d8_keeper_quality",
      "d12_incremental_dedup", "d1_exact_dedup")
    val ordered = names.sortBy(Bench.naturalKey)
    assert(ordered == Seq("d1_exact_dedup", "d7_dup_clusters", "d8_keeper_quality",
      "d10_clusters_persisted", "d12_incremental_dedup"))
    // the attribution invariant itself: d7 strictly precedes d10 so the
    // SimHash+CC memo fill is timed in d7's sample on EVERY pass
    assert(Bench.naturalKey("d7_dup_clusters") < Bench.naturalKey("d10_clusters_persisted"))
  }

  test("naturalKey: digit runs longer than the old pad width still order numerically") {
    // 13+ digit runs degraded to lexicographic under the fixed-width pad
    // ("0" * negative is empty): 1000000000000 (13 digits) sorted before
    // 999999999999 (12 nines) would be wrong — (length, value) encoding
    assert(Bench.naturalKey("q999999999999") < Bench.naturalKey("q1000000000000"))
    assert(Bench.naturalKey("q7") < Bench.naturalKey("q1000000000000"))
    // leading zeros compare by value ("q007" == "q7" as keys; sort is stable)
    assert(Bench.naturalKey("q007") == Bench.naturalKey("q7"))
  }

  test("median: odd, even, empty") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(Bench.median(Seq(5.0)) == 5.0)
    assert(Bench.median(Nil) == -1.0)
  }

  test("compact keys: unique prefixes shorten, colliders extend to the shortest unique prefix") {
    val short = Bench.shortKeys(Seq("q1_agg", "d7_clusters", "ooh_occupations", "ooh_report"))
    assert(short("q1_agg") == "q1")
    assert(short("d7_clusters") == "d7")
    assert(short("ooh_occupations") == "ooh_o")
    assert(short("ooh_report") == "ooh_r")
    // still injective when colliders share more than the underscore prefix
    val deep = Bench.shortKeys(Seq("ab_cd_one", "ab_cd_two"))
    assert(deep("ab_cd_one") == "ab_cd_o")
    assert(deep("ab_cd_two") == "ab_cd_t")
    assert(Set("q1_agg", "d7_clusters", "ooh_occupations", "ooh_report")
      .map(short).size == 4, "compact keys must stay injective")
  }

  test("sec2 renders 2-dp with trailing zeros stripped and -1 intact") {
    assert(Bench.sec2(1.234) == "1.23")
    assert(Bench.sec2(1.2) == "1.2")
    assert(Bench.sec2(12.0) == "12")
    assert(Bench.sec2(0.001) == "0")
    assert(Bench.sec2(-1.0) == "-1")
  }
}
