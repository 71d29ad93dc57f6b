package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Formats
import graft.core.Tables

/** Source/sink formats: round-trip fidelity and the text/binaryFile
  * ingest paths (q28 hash-checks the columnar formats; these cover the
  * rest). */
class FormatsSpec extends SparkSpec {

  test("orc round-trip preserves schema and content") {
    val nation = Tables.load(spark, sfDir, "nation")
    val tmp = Files.createTempDirectory("graft-fmt").toString
    val back = Formats.roundTrip(nation, "orc", tmp, "nation")
    assert(back.schema === nation.schema)
    assert(back.except(nation).isEmpty && nation.except(back).isEmpty)
  }

  test("csv round-trip with explicit schema preserves typed content") {
    val region = Tables.load(spark, sfDir, "region")
    val tmp = Files.createTempDirectory("graft-fmt").toString
    val back = Formats.roundTrip(region, "csv", tmp, "region")
    assert(back.schema.fields.map(f => (f.name, f.dataType)) ===
      region.schema.fields.map(f => (f.name, f.dataType)))
    assert(back.count() === region.count())
  }

  test("text source reads lines; binaryFile source reads whole files") {
    val dir = Files.createTempDirectory("graft-src")
    Files.writeString(dir.resolve("a.txt"), "line one\nline two\n")
    Files.writeString(dir.resolve("b.txt"), "line three\n")
    val text = Formats.readText(spark, dir.toString + "/*.txt")
    assert(text.count() === 3)
    assert(text.columns.toSeq === Seq("value"))
    val bin = Formats.readBinary(spark, dir.toString + "/*.txt")
    assert(bin.count() === 2)
    val cols = bin.columns.toSet
    assert(Set("path", "modificationTime", "length", "content").subsetOf(cols))
    val total = bin.agg(sum(length(col("content")))).head.getLong(0)
    assert(total === "line one\nline two\n".length + "line three\n".length)
  }
}
