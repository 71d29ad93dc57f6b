package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Determinism._
import graft.core.Tables
import java.nio.file.Files

/** Batch source/sink surface across every built-in file format
  * (SURVEY.md §2 Part B row "File formats"). The reference persists one
  * format only — gzipped baldr record streams (kafka.clj:69-82,
  * README.md:9-10); the engine's archive is columnar (Parquet primary)
  * with ORC/JSON/CSV/text/binaryFile as first-class interchange formats.
  *
  * Scale notes:
  *  - Parquet/ORC are the at-rest formats: columnar, predicate-pushdown,
  *    splittable, zstd. JSON/CSV exist for ingest/egress interchange only
  *    — a 100 TB pipeline reads them once, converts to Parquet, and
  *    queries the Parquet.
  *  - Every writer here is a plain `df.write` — distributed, one file per
  *    partition, no driver collect.
  */
object Formats {

  /** Write `df` in `format` under `dir/name` and read it back with the
    * original schema (CSV/JSON round-trip through text, so schema-on-read
    * is pinned explicitly — types survive by construction, not luck). */
  def roundTrip(df: DataFrame, format: String, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.$format"
    val writer = df.write.mode("overwrite")
    format match {
      case "csv" => writer.option("header", "true").csv(path)
      case _     => writer.format(format).save(path)
    }
    val spark = df.sparkSession
    format match {
      case "csv"  => spark.read.schema(df.schema).option("header", "true").csv(path)
      case "json" => spark.read.schema(df.schema).json(path)
      case f      => spark.read.format(f).load(path)
    }
  }

  /** Cross-engine content checksum of the nation table: 60-bit md5 hash
    * per row over a canonical string encoding, reduced mod 1e9+7 (so the
    * sum stays in int64 at any row count — ANSI mode overflows otherwise),
    * summed. Equal checksums ⇒ equal content (up to md5), independent of
    * row order and file layout. */
  private def nationChecksum =
    sum(xhash(concat_ws("|",
      col("n_nationkey").cast("string"), col("n_name"),
      col("n_regionkey").cast("string"))) % lit(1000000007L))

  /** q28: round-trip the nation table through parquet, orc, json, and csv;
    * one row per format with row count + content checksum. The oracle
    * computes the same (count, checksum) straight from the source table —
    * a hash-match proves every format preserved every row bit-for-bit.
    *
    * The four writes are independent actions on a tiny table, so they run
    * concurrently (Spark's scheduler is thread-safe; each write is its own
    * job) — sequentially this query is pure job-scheduling latency. */
  def formatsRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val nation = Tables.load(spark, dir, "nation")
    val tmp = Files.createTempDirectory("graft-formats").toString
    val frames = Await.result(
      Future.sequence(Seq("parquet", "orc", "json", "csv").map { fmt =>
        Future {
          roundTrip(nation, fmt, tmp, "nation")
            .agg(count(lit(1)).as("n_rows"), nationChecksum.as("checksum"))
            .withColumn("format", lit(fmt))
            .select("format", "n_rows", "checksum")
        }
      }), Duration.Inf)
    frames.reduce(_ unionByName _).orderBy("format")
  }

  /** q75: oracle-gated compaction round-trip. Events are written as a
    * deliberately fragmented archive (tiny `maxRecordsPerFile`, Hive
    * layout on (topic, partition)), compacted with [[graft.streaming
    * .Archive.compact]], and read back; the result is a per-topic row
    * count + content checksum PLUS a `compacted_fewer_files` flag from a
    * driver-side file listing (metadata only, no data moves through the
    * driver). The oracle recomputes count+checksum straight from the
    * source table with a literal TRUE — a hash match proves compaction
    * preserved every row while actually shrinking the file count. */
  def compactionRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft-compact").toString
    val src = Tables.load(spark, dir, "events")
      .select(col("event_type").as("topic"),
        (col("user_id") % 4).cast("int").as("partition"),
        col("event_id").as("offset"))
    // fragment into ~125-200 small files at ANY scale factor — a fixed
    // records-per-file would degenerate into thousands of file writes as
    // the input grows, timing the file system instead of the operator.
    // Floor of 8 (not 100): at the sf0.001 probe fixture a 100-record
    // floor produced so few raw files that compaction could not shrink
    // the count and the compacted_fewer_files gate read false.
    val fragRecords = math.max(8L, src.count() / 200)
    src.write.partitionBy("topic", "partition")
      .option("maxRecordsPerFile", fragRecords)
      .mode("overwrite").parquet(s"$tmp/raw")
    graft.streaming.Archive.compact(spark, s"$tmp/raw", s"$tmp/compacted",
      targetRecordsPerFile = 10 * 1000 * 1000)
    def nFiles(root: String): Long = {
      val base = new java.io.File(root)
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      walk(base)
    }
    val shrunk = nFiles(s"$tmp/compacted") < nFiles(s"$tmp/raw")
    spark.read.parquet(s"$tmp/compacted")
      .groupBy(col("topic"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(xhash(concat_ws("|", col("topic"), col("offset").cast("string")))
          % lit(1000000007L))).as("checksum"))
      .withColumn("compacted_fewer_files", lit(shrunk))
      .orderBy("topic")
  }

  /** q29: full SQL passthrough — a TPC-H Q5-shaped join pipeline run
    * entirely through `spark.sql` over the registered views, proving the
    * SQL surface (joins, aggregation, ordering) end-to-end. */
  def sqlPassthrough(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(s"""
      SELECT n_name,
             ${sumSql("l_extendedprice * (1.0 - l_discount)", 2)} AS revenue,
             count(1) AS n_lines
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
      GROUP BY n_name
      ORDER BY n_name""")
  }

  /** text source: one string column per line — how raw corpus dumps enter
    * the pipeline before parsing. Exposed for tests; no oracle query. */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** binaryFile source: whole files as (path, modificationTime, length,
    * content) rows — the production entry for multimodal corpora
    * (graft.llm.Multimodal). Exposed for tests; no oracle query. */
  def readBinary(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_formats_roundtrip" -> formatsRoundTrip _,
    "q29_sql_passthrough"   -> sqlPassthrough _,
    "q75_compaction_roundtrip" -> compactionRoundTrip _
  )

  val oracles: Map[String, String] = Map(
    "q28_formats_roundtrip" -> s"""
      SELECT format, count(1) AS n_rows,
        sum(${xhashSql("n_nationkey::VARCHAR || '|' || n_name || '|' || n_regionkey::VARCHAR")} % 1000000007)::BIGINT AS checksum
      FROM nation, (VALUES ('parquet'), ('orc'), ('json'), ('csv')) f(format)
      GROUP BY format
      ORDER BY format""",
    "q75_compaction_roundtrip" -> s"""
      SELECT event_type AS topic, count(1) AS n_rows,
        sum(${xhashSql("event_type || '|' || event_id::VARCHAR")} % 1000000007)::BIGINT
          AS checksum,
        TRUE AS compacted_fewer_files
      FROM events
      GROUP BY event_type
      ORDER BY topic""",
    "q29_sql_passthrough" -> s"""
      SELECT n_name,
             ${sumSql("l_extendedprice * (1.0 - l_discount)", 2)} AS revenue,
             count(1) AS n_lines
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
      GROUP BY n_name
      ORDER BY n_name"""
  )
}
