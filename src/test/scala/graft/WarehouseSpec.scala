package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Crash-safe publication contract of [[graft.core.Warehouse]]: a killed
  * writer must never make a partial table visible — readers see the old
  * complete version or the new complete version, nothing in between. */
class WarehouseSpec extends SparkSpec {
  private val W = graft.core.Warehouse

  private def rows(tag: String, n: Int) = {
    val sq = spark
    import sq.implicits._
    (1 to n).map(i => (i.toLong, tag)).toDF("id", "tag")
  }

  test("publish round-trips and versions monotonically") {
    val t = "wh_spec_roundtrip"
    assert(W.publishedVersion(spark, t).isEmpty)
    assert(W.publish(rows("a", 5), t) === 1L)
    assert(W.readTable(spark, t).count() === 5)
    assert(W.publish(rows("b", 7), t) === 2L)
    val r = W.readTable(spark, t)
    assert(r.count() === 7 && r.select("tag").distinct().head().getString(0) === "b")
    // the superseded version is still on disk, immutable — time-travel
    // debugging / delayed readers keep working until a GC pass prunes it
    assert(spark.read.parquet(s"${W.tablePath(spark, t)}/v=1").count() === 5)
  }

  test("a writer killed mid-write leaves readers on the old complete version") {
    val t = "wh_spec_crash_midwrite"
    W.publish(rows("live", 4), t)
    // simulate a writer that died after creating part of its version
    // tree but BEFORE the pointer flip: an orphan v=2 with a torn file
    val orphan = Paths.get(W.tablePath(spark, t), "v=2")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-00000.parquet"), "torn bytes")
    // readers are untouched: pointer still names v=1, content complete
    assert(W.publishedVersion(spark, t) === Some(1L))
    val r = W.readTable(spark, t)
    assert(r.count() === 4 &&
      r.select("tag").distinct().head().getString(0) === "live")
  }

  test("publish after a crash skips the orphan version and recovers") {
    val t = "wh_spec_crash_recover"
    W.publish(rows("v1", 3), t)
    val orphan = Paths.get(W.tablePath(spark, t), "v=2")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-00000.parquet"), "torn")
    // the next publish must never reuse (and thereby "bless") the
    // orphan's number: it writes v=3 and flips the pointer past it
    assert(W.publish(rows("v3", 6), t) === 3L)
    assert(W.publishedVersion(spark, t) === Some(3L))
    val r = W.readTable(spark, t)
    assert(r.count() === 6 &&
      r.select("tag").distinct().head().getString(0) === "v3")
  }

  test("a stray pointer temp file cannot tear the pointer or block publishes") {
    val t = "wh_spec_torn_pointer"
    W.publish(rows("ok", 2), t)
    // simulate death between writing .CURRENT.tmp and the atomic move
    Files.writeString(
      Paths.get(W.tablePath(spark, t), ".CURRENT.tmp"), "garbage")
    assert(W.publishedVersion(spark, t) === Some(1L))
    assert(W.readTable(spark, t).count() === 2)
    // the next publish overwrites the stray temp and completes
    assert(W.publish(rows("ok2", 9), t) === 2L)
    assert(W.readTable(spark, t).count() === 9)
  }

  test("gc prunes superseded and orphan versions, never the published one") {
    val t = "wh_spec_gc"
    W.publish(rows("v1", 1), t)
    W.publish(rows("v2", 2), t)
    W.publish(rows("v3", 3), t)
    // plus a crashed writer's orphan past the pointer
    val orphan = Paths.get(W.tablePath(spark, t), "v=9")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-00000.parquet"), "torn")
    // time travel works while predecessors are retained
    assert(W.readTableAsOf(spark, t, 2L).count() === 2)
    assert(W.gc(spark, t, keepLast = 2) === Seq(1L, 9L))
    assert(W.readTableAsOf(spark, t, 2L).count() === 2, "kept predecessor")
    assert(W.readTable(spark, t).count() === 3)
    // keepLast clamps to >= 1: the published version is untouchable
    assert(W.gc(spark, t, keepLast = 0) === Seq(2L))
    assert(W.readTable(spark, t).count() === 3)
    assert(W.publishedVersion(spark, t) === Some(3L))
    // and the next publish continues past the pruned history
    assert(W.publish(rows("v4", 4), t) === 4L)
  }

  test("compactPublish rewrites the archive and swaps readers atomically") {
    val sq = spark
    import sq.implicits._
    val in = Files.createTempDirectory("wh_spec_arch").toString + "/archive"
    val data = (1 to 40).map(i =>
      ("t1", i % 2, i.toLong, s"k$i", s"v$i", new java.sql.Timestamp(i * 1000L)))
      .toDF("topic", "partition", "offset", "key", "value", "ts")
    data.write.partitionBy("topic", "partition").parquet(in)
    val t = "wh_spec_compacted"
    val v = graft.streaming.Archive.compactPublish(spark, in, t, 1000L)
    assert(v === 1L)
    val out = W.readTable(spark, t)
    // lossless rewrite: same rows, offsets intact per (topic, partition)
    assert(out.count() === 40)
    assert(out.select(sum(col("offset"))).head().getLong(0) ===
      (1 to 40).map(_.toLong).sum)
    // partition pruning still works below the version root
    assert(out.filter(col("partition") === 0).count() === 20)
    // a re-compaction publishes the next version; readers follow the flip
    assert(graft.streaming.Archive.compactPublish(spark, in, t, 5L) === 2L)
    assert(W.readTable(spark, t).count() === 40)
  }
}
