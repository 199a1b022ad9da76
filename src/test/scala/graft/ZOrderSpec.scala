package graft

import org.apache.spark.sql.functions._

import graft.engine.ZOrder

/** Z-order clustering — the bit arithmetic and, the part that matters at
  * 100 TB, the SKIPPING: after a z-ordered write, the per-file min/max
  * ranges must be tight on BOTH interleaved columns, so a 2-D box
  * predicate can skip most files where a 1-D sorted layout can skip on
  * its sort column only (every file of a user-sorted layout spans all
  * days, so a day filter prunes nothing).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (a odd positions, b even)") {
    val df = Seq((3L, 0L), (0L, 3L), (5L, 6L), (65535L, 0L)).toDF("a", "b")
    val got = df.select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a=0b11,b=0 → 0b1010; a=0,b=0b11 → 0b0101; a=0b101,b=0b110
    // → bits: a2@5,a0@1, b2@4,b1@2 → 0b110110 = 54
    assert(got == Seq(10L, 5L, 54L, 0xAAAAAAAAL))
  }

  /** Per-file [min,max] of two columns for every parquet part-file. */
  private def fileRanges(path: String): Seq[(Long, Long, Long, Long)] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.startsWith("part-"))
      .map { f =>
        val r = spark.read.parquet(f.getPath.toString)
          .agg(min("user_id"), max("user_id"), min("day"), max("day"))
          .head()
        (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getInt(3).toLong)
      }.toSeq
  }

  private def intersecting(ranges: Seq[(Long, Long, Long, Long)],
      u: (Long, Long), d: (Long, Long)): Int =
    ranges.count { case (ulo, uhi, dlo, dhi) =>
      uhi >= u._1 && ulo <= u._2 && dhi >= d._1 && dlo <= d._2
    }

  test("2-D box skipping: z-layout beats a 1-D sorted layout") {
    val ev = graft.sources.Tables.events(spark, sf0001)
      .withColumn("day", datediff(to_date(col("ts")), lit("2024-01-01")))
      .select("user_id", "day", "event_type", "value")
    val n = 8

    val zPath = graft.util.TmpDirs.scratch("graft_zorder_z_").toString
    ZOrder.writeZOrdered(ev, zPath, col("user_id"), col("day"), numFiles = n)
    val sPath = graft.util.TmpDirs.scratch("graft_zorder_s_").toString
    ev.repartitionByRange(n, col("user_id")).sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(sPath)

    val zr = fileRanges(zPath)
    val sr = fileRanges(sPath)
    assert(zr.size == n && sr.size == n)

    // the case 1-D sort CANNOT serve: a box selective in the NON-sort
    // dimension (all users, a few days; sf0.001 has users 0..14, days
    // 0..29). Every user-sorted file spans the full month, so the day
    // filter prunes nothing there — the z-layout's day bits do.
    val (ubox, dbox) = ((0L, 14L), (8L, 11L))
    val zHit = intersecting(zr, ubox, dbox)
    val sHit = intersecting(sr, ubox, dbox)
    assert(sr.forall { case (_, _, dlo, dhi) => dlo <= 1 && dhi >= 28 },
      "sorted layout unexpectedly clustered days — test premise broken")
    assert(sHit == n, "1-D sort must intersect every file on a day box")
    assert(zHit < sHit,
      s"z-order layout must intersect fewer files ($zHit) than 1-D sort ($sHit)")
    // and on a box selective in BOTH dimensions it is never worse than
    // the layout that is PERFECT for one of them
    val zBoth = intersecting(zr, (0L, 3L), (8L, 15L))
    val sBoth = intersecting(sr, (0L, 3L), (8L, 15L))
    assert(zBoth <= sBoth,
      s"z-order 2-D box hit $zBoth exceeded the 1-D sort's $sBoth")

    // and the data survives the layout: round-trip equality
    val back = spark.read.parquet(zPath)
    assert(back.count() == ev.count())
    assert(back.agg(round(sum("value"), 2)).head() == ev.agg(round(sum("value"), 2)).head())
  }
}
