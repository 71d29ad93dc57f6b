package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry over the archived/test tables (TESTDATA.md / FIXTURES.md).
  *
  * The reference's only "catalog" is the ZooKeeper topic list it archives
  * (kafka.clj:22-41); queryability of the archive comes from its Hive-style
  * `topic/partition=N/` layout (s3.clj:15-20). Here the archive is Parquet
  * and the catalog is explicit: one parquet dataset per table name.
  */
object Tables {
  val relational: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = relational ++ Seq("events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), read as raw nanos
      // (nanosAsLong is set once at session build, GraftSession.tune — no
      // hidden config mutation here) and converted; the fixture has no
      // sub-microsecond components (FIXTURES.md §B), so truncation is
      // lossless. Sessions not built via GraftSession must set
      // spark.sql.legacy.parquet.nanosAsLong=true themselves.
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so SQL queries (grouping sets,
    * subqueries) run against the same data as the DataFrame API. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
