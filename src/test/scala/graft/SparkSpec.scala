package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs — built through GraftSession so tests
  * run under exactly the config Verify/Bench use (UTC, AQE, LAST_WIN map
  * dedup, nanosAsLong).
  */
object SparkSpec {
  lazy val spark: SparkSession = GraftSession.create("graft-test", cores = 4)
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  lazy val sf0001 = "/root/testdata/sf0.001"
}
