package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * One place to pin the configuration that matters at scale:
  *   - `spark.sql.shuffle.partitions` sized to the executor-core count
  *     (32 locally; on a real cluster this would be ~2-3x total cores or
  *     left to AQE coalescing).
  *   - AQE on (Spark 4 default) so skewed joins and over-partitioned
  *     shuffles re-plan at runtime.
  *   - UTC session timezone so timestamp semantics match the DuckDB oracle.
  */
object GraftSession {
  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def create(appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
