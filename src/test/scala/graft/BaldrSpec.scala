package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.functions._
import graft.sources.Baldr

/** The bifrost-archive reader: frame codec laws, the reference's exact
  * object layout (s3.clj:15-20), and the torn-object salvage semantics.
  * q295 proves the full round-trip against the DuckDB oracle; these pin
  * the byte-level behavior on hand-built streams. */
class BaldrSpec extends SparkSpec {

  private def frames(values: Array[Byte]*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    values.foreach(Baldr.writeFrame(out, _))
    out.flush()
    bos.toByteArray
  }

  test("frame codec: values round-trip byte-for-byte, empty and large included") {
    val vals = Seq(
      Array.empty[Byte],
      "hello".getBytes("UTF-8"),
      Array.fill(1 << 20)(0x5a.toByte),
      Array[Byte](0, -1, 127, -128))
    val encoded = frames(vals: _*)
    val back = Baldr.frameReader(new ByteArrayInputStream(encoded)).toSeq
    assert(back.size === vals.size)
    back.zip(vals).foreach { case (b, v) =>
      assert(java.util.Arrays.equals(b, v), "payload bytes drifted")
    }
  }

  test("frame codec: header is 8-byte big-endian length") {
    val enc = frames("ab".getBytes("UTF-8"))
    assert(enc.take(8).toSeq === Seq[Byte](0, 0, 0, 0, 0, 0, 0, 2))
    assert(enc.length === 10)
  }

  test("frame codec: truncation inside header or payload throws, boundary EOF is clean") {
    val enc = frames("abcdef".getBytes("UTF-8"))
    // clean boundary
    assert(Baldr.frameReader(new ByteArrayInputStream(enc)).size === 1)
    // torn payload
    intercept[java.io.EOFException] {
      Baldr.frameReader(new ByteArrayInputStream(enc.take(10))).toSeq
    }
    // torn header
    intercept[java.io.EOFException] {
      Baldr.frameReader(new ByteArrayInputStream(enc.take(3))).toSeq
    }
    // implausible length (bit-rot header): first byte 0x7f -> huge
    val rot = enc.clone(); rot(0) = 0x7f
    intercept[java.io.EOFException] {
      Baldr.frameReader(new ByteArrayInputStream(rot)).toSeq
    }
  }

  test("archive writer: reference layout, offset-named rotation, lexicographic = offset order") {
    val sq = spark
    import sq.implicits._
    val root = Files.createTempDirectory("graft-baldr-w").toString
    // two topics x two partitions, 25 records each, rotate every 10:
    // files at offsets 0 / 10 / 20 per (topic, partition)
    val rows = for {
      t <- Seq("alpha", "beta"); p <- 0 to 1; o <- 0L until 25L
    } yield (t, p, o, s"$t/$p/$o".getBytes("UTF-8"))
    Baldr.writeArchive(
      rows.toDF("topic", "partition", "offset", "value"), root, "cg", 10L)
    val alpha0 = new java.io.File(s"$root/cg/alpha/partition=0")
      .list().sorted.toSeq
    assert(alpha0 === Seq("0000000000.baldr.gz", "0000000010.baldr.gz",
      "0000000020.baldr.gz"))
    // read back: every payload intact, offsets reconstructed exactly
    val back = Baldr.readArchive(spark, root, "cg")
    assert(back.filter(!col("decode_ok")).count() === 0)
    val decoded = back.select(col("topic"), col("partition"), col("offset"),
      decode(col("value"), "UTF-8").as("s")).collect()
    assert(decoded.length === rows.size)
    decoded.foreach { r =>
      assert(r.getString(3) ===
        s"${r.getString(0)}/${r.getInt(1)}/${r.getLong(2)}")
    }
  }

  test("torn object: salvaged prefix kept, one loud error row, neighbors untouched") {
    val sq = spark
    import sq.implicits._
    val root = Files.createTempDirectory("graft-baldr-t").toString
    val rows = (0L until 20L).map(o =>
      ("t", 0, o, s"rec$o".getBytes("UTF-8")))
    Baldr.writeArchive(
      rows.toDF("topic", "partition", "offset", "value"), root, "cg", 10L)
    // tear the SECOND object mid-gzip-stream: the first member of a gzip
    // file decodes from a prefix only up to the cut
    val f2 = Paths.get(root, Baldr.objectKey("cg", "t", 0, 10L))
    val bytes = Files.readAllBytes(f2)
    Files.write(f2, bytes.take(bytes.length / 2))
    val back = Baldr.readArchive(spark, root, "cg").collect()
    val bad = back.filter(!_.getBoolean(6))
    assert(bad.length === 1, s"exactly one error row: ${bad.toSeq}")
    assert(bad.head.getLong(2) === 10L, "error row pins the torn object")
    // the intact object's 10 records all survive
    val ok = back.filter(_.getBoolean(6))
    val firstFile = ok.filter(_.getLong(2) == 0L)
    assert(firstFile.length === 10)
    assert(firstFile.map(_.getLong(4)).sorted.toSeq === (0L until 10L))
    // salvage count in seq: however many frames decoded before the cut
    // is <= 10 and equals the error row's seq
    val salvaged = ok.count(_.getLong(2) == 10L)
    assert(bad.head.getLong(3) === salvaged.toLong)
  }
}
