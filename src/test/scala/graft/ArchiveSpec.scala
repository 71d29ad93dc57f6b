package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Archive
import graft.streaming.Archive.ArchiveConfig

/** Reference-parity tests for the archival pipeline (SURVEY.md §2.1):
  * partition-isolated Hive layout, white/blacklist, no empty files,
  * checkpoint restart without loss or duplicates. Driven by a
  * MemoryStream with the Kafka source schema (FIXTURES.md §D). */
class ArchiveSpec extends SparkSpec {

  case class KMsg(key: Array[Byte], value: Array[Byte], topic: String,
                  partition: Int, offset: Long, timestamp: Timestamp)

  private def msg(topic: String, partition: Int, offset: Long): KMsg =
    KMsg(null, s"$topic-$partition-$offset".getBytes("UTF-8"), topic,
      partition, offset, new Timestamp(1700000000000L + offset * 1000))

  test("archive writes topic/partition Hive layout, applies topic filter, " +
       "skips empty batches, and resumes exactly-once from checkpoint") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val out = Files.createTempDirectory("archive-out").toString
    val ckpt = Files.createTempDirectory("archive-ckpt").toString
    val cfg = ArchiveConfig(out, ckpt,
      whitelist = Some(Seq("orders", "clicks", "audit")),
      blacklist = Seq("audit"),
      rotationInterval = "1 seconds")

    val source = MemoryStream[KMsg]
    source.addData(
      msg("orders", 0, 0), msg("orders", 0, 1), msg("orders", 1, 0),
      msg("clicks", 0, 0),
      msg("audit", 0, 0),      // blacklisted
      msg("internal", 0, 0))   // not whitelisted
    val q1 = Archive.start(source.toDF(), cfg)
    q1.processAllAvailable()
    q1.stop()

    val archived = Archive.readArchive(spark, out)
    // §2.1.2 white/blacklist: (whitelist ∩ topics) − blacklist
    assert(archived.select("topic").distinct().collect().map(_.getString(0)).sorted
      === Array("clicks", "orders"))
    assert(archived.count() === 4)
    // §2.1.3/§2.1.8 layout: Hive-style topic=/partition= directories
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_ == "_spark_metadata").sorted
    assert(dirs === Array("topic=clicks", "topic=orders"))
    val pdirs = new java.io.File(s"$out/topic=orders").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(pdirs === Array("partition=0", "partition=1"))
    // offsets preserved for replay identity
    val off = archived.filter("topic = 'orders' AND partition = 0")
      .select("offset").collect().map(_.getLong(0)).sorted
    assert(off === Array(0L, 1L))

    // §2.1.5 empty batch ⇒ no new files
    val filesBefore = fileCount(out)
    val q2 = Archive.start(source.toDF(), cfg)
    q2.processAllAvailable() // no new data
    q2.stop()
    assert(fileCount(out) === filesBefore, "empty window must produce no output")

    // §2.1.6-7 restart from checkpoint: new data only, no duplicates
    source.addData(msg("orders", 0, 2))
    val q3 = Archive.start(source.toDF(), cfg)
    q3.processAllAvailable()
    q3.stop()
    val after = Archive.readArchive(spark, out)
    assert(after.count() === 5)
    assert(after.filter("topic = 'orders' AND partition = 0").count() === 3)
    // exactly-once: no (topic, partition, offset) duplicates
    assert(after.dropDuplicates("topic", "partition", "offset").count() === 5)
  }

  test("archive read-back prunes partitions on topic/partition filters") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val out = Files.createTempDirectory("archive-out2").toString
    val ckpt = Files.createTempDirectory("archive-ckpt2").toString
    val source = MemoryStream[KMsg]
    source.addData(msg("a", 0, 0), msg("a", 1, 1), msg("b", 0, 0))
    val q = Archive.start(source.toDF(), ArchiveConfig(out, ckpt, rotationInterval = "1 seconds"))
    q.processAllAvailable()
    q.stop()
    val plan = Archive.readArchive(spark, out)
      .filter("topic = 'a' AND partition = 1")
      .queryExecution.executedPlan.toString
    // partition filters must appear as PartitionFilters on the scan, not post-scan
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("topic") && plan.contains("partition")))
  }

  private def fileCount(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(dir))
  }
}
