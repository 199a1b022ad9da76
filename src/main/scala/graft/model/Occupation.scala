package graft.model

/** The unified occupation record (SURVEY.md §1.2): one row per
  * `<occupation>` element, every field nullable because the
  * `Military Careers` guard (reference index.js:146-148) produces partial
  * rows. Field order matches the reference's assignment order
  * (index.js:140-172).
  */
case class Occupation(
    title: String,
    workSchedules: Option[String],
    importantQualities: Option[Map[String, String]],
    description: Option[String],
    medianPayAnnual: Option[Double],
    medianPayHourly: Option[Double],
    education: Option[String],
    workExperience: Option[String],
    training: Option[String],
    numberOfJobs: Option[String],
    employmentOutlook: Option[String],
    employmentOutlookCode: Option[String],
    projectedChangeInNumberOfJobs: Option[String],
    whatTheyDo: Option[String],
    howToBecomeOne: Option[String],
    workEnvironment: Option[String],
    payText: Option[String],
    pay: Option[Map[String, Double]],
    similarOccupations: Option[Seq[String]],
    topIndustries: Option[Map[String, String]])
