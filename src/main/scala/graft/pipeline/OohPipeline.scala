package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.exprs.OohExtractors._
import graft.model.Occupation

/** The reference's entire dataflow (index.js:136-188) as one declarative
  * Spark plan:
  *
  *   XML scan (rowTag=occupation)  — S1/S2
  *     → wide select of 20 extracted columns (P1–P11)  — D1
  *     → null-safe filter over nested map keys  — D2
  *     → report / file sinks  — S5/S6
  *
  * Pipeline DEFINITION is separated from EXECUTION (the reference runs its
  * pipeline at module top level, index.js:186 — a testability flaw SURVEY
  * §3.2 calls out). Nothing here triggers a job until a sink is invoked.
  *
  * Scale notes: the XML source is splittable by `rowTag`, so a 100 TB
  * compilation reads partition-parallel; the wide select is a single
  * narrow (shuffle-free) whole-stage-codegen'd projection; the filter is
  * likewise narrow. The whole pipeline has ZERO shuffles.
  */
object OohPipeline {

  /** Source schema declared explicitly (SURVEY §1.3): nested `qf_*` value
    * elements become structs; CDATA-bearing sections stay StringType and
    * are decomposed by expressions, never re-scanned (S3 mapping).
    */
  val rawSchema: StructType = {
    def s(fields: (String, DataType)*): StructType =
      StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })
    val valueOnly = s("value" -> StringType)
    val sectionBody = s("section_body" -> StringType)
    s(
      "title" -> StringType,
      "description" -> StringType,
      "qf_median_pay_annual" -> valueOnly,
      "qf_median_pay_hourly" -> valueOnly,
      "qf_entry_level_education" -> valueOnly,
      "qf_work_experience" -> valueOnly,
      "qf_on_the_job_training" -> valueOnly,
      "qf_number_of_jobs" -> valueOnly,
      "qf_employment_outlook" -> s("description" -> StringType, "value" -> StringType),
      "qf_employment_openings" -> valueOnly,
      "summary_what_they_do" -> StringType,
      "summary_how_to_become_one" -> StringType,
      "summary_work_environment" -> StringType,
      "summary_pay" -> StringType,
      "similar_occupations" -> sectionBody,
      "work_environment" -> sectionBody,
      "how_to_become_one" -> sectionBody)
  }

  /** S1/S2: the XML file scan. `rowTag=occupation` makes each
    * `<occupation>` element one Row (the reference's `//occupation`
    * iterator, index.js:136); the source is lazy, splittable and prunes to
    * `rawSchema`.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .format("xml")
      .option("rowTag", "occupation")
      .schema(rawSchema)
      .load(path)

  /** D1: the 20-column wide projection (index.js:138-174), with the
    * Military Careers guard (P11, index.js:146-148) nulling every
    * post-guard column, plus a `warnings` data-quality column standing in
    * for the reference's cardinality log line (index.js:33-35).
    */
  def occupations(raw: DataFrame): DataFrame = {
    val military = col("title") === "Military Careers"
    def guarded(c: Column): Column = when(!military, c)

    raw.select(
      col("title"),
      workSchedules(col("work_environment.section_body")).as("workSchedules"),
      importantQualities(col("how_to_become_one.section_body")).as("importantQualities"),
      guarded(col("description")).as("description"),
      guarded(toDoubleOrNull(col("qf_median_pay_annual.value"))).as("medianPayAnnual"),
      guarded(toDoubleOrNull(col("qf_median_pay_hourly.value"))).as("medianPayHourly"),
      guarded(col("qf_entry_level_education.value")).as("education"),
      guarded(col("qf_work_experience.value")).as("workExperience"),
      guarded(col("qf_on_the_job_training.value")).as("training"),
      guarded(col("qf_number_of_jobs.value")).as("numberOfJobs"),
      guarded(col("qf_employment_outlook.description")).as("employmentOutlook"),
      guarded(col("qf_employment_outlook.value")).as("employmentOutlookCode"),
      guarded(col("qf_employment_openings.value")).as("projectedChangeInNumberOfJobs"),
      guarded(cdataConcat(col("summary_what_they_do"), "//p/text()")).as("whatTheyDo"),
      guarded(cdataConcat(col("summary_how_to_become_one"), "//p/text()")).as("howToBecomeOne"),
      guarded(cdataConcat(col("summary_work_environment"), "//p/text()")).as("workEnvironment"),
      guarded(payText(col("summary_pay"))).as("payText"),
      guarded(pay(col("summary_pay"))).as("pay"),
      guarded(similarOccupations(col("similar_occupations.section_body"))).as("similarOccupations"),
      guarded(topIndustries(col("work_environment.section_body"))).as("topIndustries"),
      guarded(filter(array(
        cardinalityWarning(col("summary_what_they_do"), "//p/text()", "summary_what_they_do"),
        cardinalityWarning(col("summary_how_to_become_one"), "//p/text()", "summary_how_to_become_one"),
        cardinalityWarning(col("summary_work_environment"), "//p/text()", "summary_work_environment")),
        w => w.isNotNull)).as("warnings"))
  }

  /** Typed surface: the same projection as a Dataset[Occupation]. */
  def occupationsDs(raw: DataFrame): Dataset[Occupation] = {
    val spark = raw.sparkSession
    import spark.implicits._
    occupations(raw).drop("warnings").as[Occupation]
  }

  /** D2 (index.js:177): keep rows where ANY key of the qualities map is
    * longer than 26 chars. Null-safe divergence (SURVEY §2.3): the
    * reference throws on a null map; `exists` over null yields null →
    * row dropped.
    */
  def qualityFilter(occ: DataFrame): DataFrame =
    occ.where(exists(map_keys(col("importantQualities")), k => length(k) > 26))

  /** S5: the report projection the reference prints (index.js:177-183). */
  def report(occ: DataFrame): DataFrame =
    qualityFilter(occ).select(
      col("title"), col("medianPayAnnual"), col("employmentOutlookCode"),
      col("importantQualities"))

  /** Full pipeline: read → extract → filter → report columns. */
  def run(spark: SparkSession, path: String): DataFrame =
    report(occupations(read(spark, path)))

  /** Default fixture (FIXTURES.md §A) for harness entry points — an
    * ENGINE-SHIPPED classpath resource (`src/main/resources/ooh`),
    * extracted once per JVM to a self-cleaning scratch file so the file
    * source can read it on any checkout/deployment (a hardcoded build-tree
    * path broke everywhere but the original workspace — the same
    * portability fix as the PPM fixtures).
    */
  lazy val fixturePath: String = {
    val dir = graft.util.TmpDirs.scratch("graft_ooh_fixture_")
    val name = "xml-compilation.xml"
    val in = getClass.getResourceAsStream(s"/ooh/$name")
    require(in != null, s"classpath resource /ooh/$name missing from the graft jar")
    try java.nio.file.Files.copy(in, dir.resolve(name)) finally in.close()
    dir.resolve(name).toString
  }
}
