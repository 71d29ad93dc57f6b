package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.sql.Timestamp
import scala.jdk.CollectionConverters._
import graft.streaming.{Archive, Telemetry}
import graft.streaming.Archive.ArchiveConfig
import graft.sources.ObjectStore

/** Telemetry (reference A18) + bounded in-flight data (A15/A16): a
  * rate-limited archive run must (a) surface per-batch progress through
  * the listener and (b) admit no more than the configured bound per
  * micro-batch. Plus the StatsD wire path and object-store path helpers. */
class TelemetrySpec extends SparkSpec {

  test("rate-limited archive emits telemetry and bounds every micro-batch") {
    val sq = spark
    import sq.implicits._
    val srcDir = Files.createTempDirectory("tel-src").toString
    val out = Files.createTempDirectory("tel-out").toString
    val ckpt = Files.createTempDirectory("tel-ckpt").toString

    // 4 files x 3 rows, written one at a time so each is its own file
    val rowsPerFile = 3
    (0 until 4).foreach { f =>
      (0 until rowsPerFile).map { i =>
        (Array.empty[Byte], s"v$f-$i".getBytes("UTF-8"), "orders", f,
          (f * rowsPerFile + i).toLong, new Timestamp(1700000000000L))
      }.toDF("key", "value", "topic", "partition", "offset", "timestamp")
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    val schema = spark.read.parquet(srcDir).schema

    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val tel = Telemetry.attach(spark, "graft", lines.add(_))
    try {
      // maxFilesPerTrigger=1 is the file-source form of the Kafka
      // maxOffsetsPerTrigger knob: one file's rows per micro-batch, max
      val src = Archive.fileSource(spark, srcDir, schema, maxFilesPerTrigger = 1)
      val q = Archive.start(src, ArchiveConfig(out, ckpt,
        rotationInterval = "1 seconds", queryName = Some("archive_test")))
      q.processAllAvailable()
      q.stop()

      // listener events are async — give the bus a moment to drain
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      def stats = tel.snapshot.get("archive_test")
      while (System.nanoTime() < deadline &&
             !stats.exists(_.totalRows == 4L * rowsPerFile)) Thread.sleep(100)

      val s = stats.getOrElse(fail("no telemetry snapshot for archive_test"))
      assert(s.totalRows === 4L * rowsPerFile)
      // bounded in-flight: 4 files at 1 file/trigger is at least 4 batches…
      assert(s.batches >= 4, s"expected >= 4 rate-limited batches, got $s")
      // …and no single batch admitted more than one file's rows
      val perBatch = lines.asScala.toSeq
        .filter(_.startsWith("graft.archive_test.input_rows:"))
        .map(_.stripPrefix("graft.archive_test.input_rows:").stripSuffix("|c").toLong)
      assert(perBatch.nonEmpty && perBatch.max <= rowsPerFile,
        s"micro-batch exceeded the admission bound: $perBatch")
      assert(perBatch.sum === 4L * rowsPerFile)
      // rate + duration gauges present
      assert(lines.asScala.exists(_.startsWith("graft.archive_test.rows_per_sec:")))
      assert(lines.asScala.exists(_.startsWith("graft.archive_test.batch_duration_ms:")))
      // and the archive content is intact
      assert(Archive.readArchive(spark, out).count() === 4L * rowsPerFile)
    } finally spark.streams.removeListener(tel)
  }

  test("udp reporter delivers statsd datagrams (loopback)") {
    val sock = new DatagramSocket(0, InetAddress.getByName("127.0.0.1"))
    try {
      sock.setSoTimeout(5000)
      val report = Telemetry.udpReporter("127.0.0.1", sock.getLocalPort)
      report("graft.q.rows_per_sec:42.00|g")
      val buf = new Array[Byte](512)
      val pkt = new DatagramPacket(buf, buf.length)
      sock.receive(pkt)
      assert(new String(pkt.getData, 0, pkt.getLength, StandardCharsets.UTF_8)
        === "graft.q.rows_per_sec:42.00|g")
    } finally sock.close()
  }

  test("object-store path helpers produce scheme-correct URIs") {
    assert(ObjectStore.s3aPath("archive-bucket", "/topics/v1")
      === "s3a://archive-bucket/topics/v1")
    assert(ObjectStore.abfssPath("archive", "prodacct", "topics/v1")
      === "abfss://archive@prodacct.dfs.core.windows.net/topics/v1")
    // credential helpers write the hadoop conf the connectors read
    ObjectStore.configureAzure(spark, "prodacct", "base64key==")
    assert(spark.sparkContext.hadoopConfiguration
      .get("fs.azure.account.key.prodacct.dfs.core.windows.net") === "base64key==")
  }
}
