package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.streaming.{EventsStream, Sessionize}

/** State-store provider parity: the two stateful streaming operators with
  * the most state-machine surface — flatMapGroupsWithState sessionization
  * (q24) and the stream-stream LEFT OUTER interval join (q47, state
  * eviction drives outer-row emission) — must produce IDENTICAL results
  * under the RocksDB state store and the default HDFS-backed one. On a
  * real cluster RocksDB is the provider of record for large state (spills
  * to local disk instead of executor heap), so provider-dependent results
  * would silently corrupt any scaled deployment.
  */
class StateStoreParitySpec extends SparkSpec {

  private val key = "spark.sql.streaming.stateStore.providerClass"
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withProvider[T](provider: Option[String])(f: => T): T = {
    val prev = spark.conf.getOption(key)
    provider.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    try f
    finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
  }

  private def parity(name: String)(q: (SparkSession, String) => DataFrame): Unit = {
    val default = withProvider(None)(q(spark, sf0001).collect().toSeq)
    val rocks = withProvider(Some(rocksdb))(q(spark, sf0001).collect().toSeq)
    assert(rocks == default,
      s"$name diverged under RocksDB: ${diffSample(default, rocks)}")
    assert(default.nonEmpty, s"$name parity check ran on an empty result")
  }

  private def diffSample(a: Seq[Row], b: Seq[Row]): String = {
    val onlyA = a.diff(b).take(3)
    val onlyB = b.diff(a).take(3)
    s"default-only=$onlyA rocksdb-only=$onlyB (sizes ${a.size} vs ${b.size})"
  }

  test("the provider conf actually reaches the stream session (negative control)") {
    // a bogus provider must fail the stateful query loudly — if this did
    // NOT throw, the conf was dropped on the way to the stream session and
    // every parity test below would be comparing the default to itself
    withProvider(Some("com.example.NoSuchStateStoreProvider")) {
      val e = intercept[Throwable] {
        EventsStream.runRunningMaxAvailableNow(spark, sf0001).collect()
      }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => String.valueOf(x.getMessage) + x.getClass.getName).mkString(" | ")
      assert(msgs.contains("NoSuchStateStoreProvider"), msgs)
    }
  }

  test("streaming sessionization (flatMapGroupsWithState) is provider-independent") {
    parity("sessionization")(Sessionize.sessionsStreamingAvailableNow)
  }

  test("q47 stream-stream LEFT OUTER interval join is provider-independent") {
    parity("q47")(EventsStream.runFunnelLeftOuterAvailableNow)
  }

  test("q45 mapGroupsWithState running aggregate is provider-independent") {
    parity("q45")(EventsStream.runRunningMaxAvailableNow)
  }
}
