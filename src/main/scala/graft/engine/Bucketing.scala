package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: the co-location strategy for repeated big-big
  * joins at scale.
  *
  * A shuffle on the join key is the dominant cost of a fact-fact join at
  * 100 TB. Writing both facts bucketed (and sorted) by the key moves that
  * shuffle to WRITE time, once: every subsequent join on the key is a
  * zero-Exchange sort-merge join (bucket i of A only ever meets bucket i
  * of B). `BucketingSpec` asserts the no-Exchange plan property.
  *
  * Bucket count rule of thumb at scale: total size / bucket ≈ 100–200 MB
  * per bucket per partition; bucket counts of joined tables must be equal
  * (or integer multiples, with spark.sql.bucketing.coalesceBucketsInJoin).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — with equal bucket
    * counts this plans as a sort-merge join with NO Exchange on either
    * side (and no sort, since buckets are written sorted).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
