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
}
