package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned warehouse layout for derived tables — the batch analog of
  * the archive's `topic/partition=N/` discipline (reference s3.clj:15-20;
  * [[graft.streaming.Archive]] reproduces it for the stream sink).
  *
  * Sketch-at-rest tables (q135 HLL, q136 DDSketch, q137 count-min, q141
  * Bloom) are durable artifacts, not scratch: the whole point of
  * persisting a sketch is that LATER jobs re-read it instead of the raw
  * data. They therefore belong in a stable, named, Hive-partitioned
  * layout — `<root>/<table>/shard=N/` — where a reader prunes shards
  * before any I/O and an incremental ingest overwrites only the shards
  * it touched (dynamic partition overwrite), exactly how the archive
  * treats `partition=N`.
  *
  * The root comes from `graft.warehouse.dir` (production: an object-store
  * URI); unset, it falls back to one stable per-JVM temp directory so
  * tests and the verify harness need no configuration.
  */
object Warehouse {

  private lazy val defaultRoot =
    java.nio.file.Files.createTempDirectory("graft-warehouse").toString

  def root(spark: SparkSession): String =
    spark.conf.getOption("graft.warehouse.dir").getOrElse(defaultRoot)

  def tablePath(spark: SparkSession, table: String): String =
    s"${root(spark)}/$table"

  /** Write `df` as warehouse table `table`, Hive-partitioned by
    * `partitionCols`. Returns the table path. */
  def writeTable(df: DataFrame, table: String,
                 partitionCols: String*): String = {
    val path = tablePath(df.sparkSession, table)
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
    path
  }

  /** Read a warehouse table back (partition columns become prunable). */
  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(tablePath(spark, table))

  // full path -> built marker; keyed by path (not table name) because
  // the root is conf-dependent
  private val built = scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** Materialize-once: the first caller builds and writes the table, every
    * later (or concurrent — first-build serializes under the monitor)
    * caller reads the parquet AT REST. This is the "persist, don't
    * recompute" contract for shared intermediates a whole query family
    * consumes: build cost is paid once per JVM, downstream plans carry a
    * partition-prunable scan instead of the producing subtree. */
  def tableOnce(spark: SparkSession, table: String,
                partitionCols: String*)(build: => DataFrame): DataFrame = {
    val path = tablePath(spark, table)
    def hit = built.get(path)
    if (hit.isEmpty) synchronized {
      if (hit.isEmpty) {
        writeTable(build, table, partitionCols: _*)
        built.put(path, ())
      }
    }
    readTable(spark, table)
  }
}
