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
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) and
      // TIMESTAMP(MICROS) across fixture generations. With
      // spark.sql.legacy.parquet.nanosAsLong=true (set at session build,
      // GraftSession.tune) the nanos variant surfaces as LongType and must
      // be truncated to micros (lossless: the fixture has no sub-microsecond
      // components, FIXTURES.md §B); the micros variant is already a
      // TimestampType and passes through untouched. Branching on the read
      // schema keeps one loader valid for both.
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // isAdjustedToUTC=false parquet surfaces as TIMESTAMP_NTZ, which
          // unix_millis & co. reject. The session timezone is pinned to UTC
          // (GraftSession.tune), so the NTZ→LTZ cast is value-preserving and
          // matches DuckDB's naive reading of the same file.
          raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so SQL queries (grouping sets,
    * subqueries) run against the same data as the DataFrame API. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
