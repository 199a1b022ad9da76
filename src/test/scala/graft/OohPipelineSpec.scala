package graft

import org.apache.spark.sql.Row

import graft.pipeline.OohPipeline

/** End-to-end goldens over the FIXTURES.md §A fixture: full record for the
  * happy case, the Military Careers partial row, and the D2 filter result.
  */
class OohPipelineSpec extends SparkSpec {

  private lazy val occ =
    OohPipeline.occupations(OohPipeline.read(spark, OohPipeline.fixturePath)).cache()

  private def rowFor(title: String): Row =
    occ.where(occ("title") === title).head()

  test("fixture scans into 8 occupation rows (S1/S2)") {
    assert(occ.count() == 8)
    assert(occ.columns.length == 21) // 20 record fields + warnings
  }

  test("happy case: the full 20-column golden record (D1)") {
    val r = rowFor("Data Engineers")
    assert(r.getAs[String]("workSchedules") == "Most work full time.")
    assert(r.getAs[Map[String, String]]("importantQualities") == Map(
      "Analytical skills" -> "They reason about data.",
      "Very long quality name over 26 chars" -> "Sentence body."))
    assert(r.getAs[String]("description") == "Build pipelines.")
    assert(r.getAs[Double]("medianPayAnnual") == 104000.0)
    assert(r.getAs[Double]("medianPayHourly") == 50.0)
    assert(r.getAs[String]("education") == "Bachelor's degree")
    assert(r.getAs[String]("workExperience") == "None")
    assert(r.getAs[String]("training") == "None")
    assert(r.getAs[String]("numberOfJobs") == "168,000") // stays string, index.js:156
    assert(r.getAs[String]("employmentOutlook") == "Much faster than average")
    assert(r.getAs[String]("employmentOutlookCode") == "7")
    assert(r.getAs[String]("projectedChangeInNumberOfJobs") == "12,000")
    assert(r.getAs[String]("whatTheyDo") == "One paragraph.")
    assert(r.getAs[String]("howToBecomeOne") == "Another.")
    assert(r.getAs[String]("workEnvironment") == "Offices.")
    assert(r.getAs[String]("payText") ==
      "The median annual wage for data engineers was $104,000 in May 2023." +
      "The median hourly wage for junior data engineers was $35.50 in May 2023.")
    assert(r.getAs[Map[String, Double]]("pay") ==
      Map("data engineers" -> 50.0, "junior data engineers" -> 35.5))
    assert(r.getAs[collection.Seq[String]]("similarOccupations") == Seq("Database Administrators"))
    assert(r.getAs[Map[String, String]]("topIndustries") == Map("Tech" -> "45", "Finance" -> "20"))
    assert(r.getAs[collection.Seq[String]]("warnings") == Seq.empty)
  }

  test("Military Careers guard keeps only title/workSchedules/importantQualities (P11)") {
    val r = rowFor("Military Careers")
    assert(r.getAs[String]("workSchedules") == "Deployments vary.")
    assert(r.getAs[Map[String, String]]("importantQualities") ==
      Map("Discipline" -> "They follow orders."))
    for (f <- Seq("description", "medianPayAnnual", "medianPayHourly", "education",
        "workExperience", "training", "numberOfJobs", "employmentOutlook",
        "employmentOutlookCode", "projectedChangeInNumberOfJobs", "whatTheyDo",
        "howToBecomeOne", "workEnvironment", "payText", "pay",
        "similarOccupations", "topIndustries", "warnings"))
      assert(r.isNullAt(r.fieldIndex(f)), s"expected null $f on the Military row")
  }

  test("multi-match case concatenates and records a cardinality warning (P3)") {
    val r = rowFor("Statisticians")
    assert(r.getAs[String]("whatTheyDo") == "First part.Second part.")
    assert(r.getAs[collection.Seq[String]]("warnings") == Seq("summary_what_they_do"))
  }

  test("missing headers yield null workSchedules / importantQualities (P8/P9)") {
    val r = rowFor("Mystery Workers")
    assert(r.isNullAt(r.fieldIndex("workSchedules")))
    assert(r.isNullAt(r.fieldIndex("importantQualities")))
  }

  test("odd td count pairs the trailing industry with null (P7 divergence)") {
    val r = rowFor("Surveyors")
    assert(r.getAs[Map[String, String]]("topIndustries") ==
      Map("Engineering" -> "71", "Government" -> null))
  }

  test("D2 filter: >26-char quality key, boundary exact, null-safe") {
    val kept = OohPipeline.qualityFilter(occ).select("title")
      .collect().map(_.getString(0)).toSet
    // 26-char key excluded (Boundary kept only via its 27-char key);
    // Mystery Workers' null map dropped without throwing.
    assert(kept == Set("Data Engineers", "Boundary Testers", "Archivists"))
  }

  test("report projection matches the reference's printed fields (S5)") {
    val rep = OohPipeline.run(spark, OohPipeline.fixturePath)
    assert(rep.columns.toSeq ==
      Seq("title", "medianPayAnnual", "employmentOutlookCode", "importantQualities"))
    val de = rep.where(rep("title") === "Data Engineers").head()
    assert(de.getAs[Double]("medianPayAnnual") == 104000.0)
    assert(de.getAs[String]("employmentOutlookCode") == "7")
  }

  test("typed Dataset[Occupation] surface round-trips the schema") {
    val ds = OohPipeline.occupationsDs(OohPipeline.read(spark, OohPipeline.fixturePath))
    val de = ds.collect().find(_.title == "Data Engineers").get
    assert(de.pay.get == Map("data engineers" -> 50.0, "junior data engineers" -> 35.5))
    assert(ds.collect().find(_.title == "Military Careers").get.description.isEmpty)
  }
}
