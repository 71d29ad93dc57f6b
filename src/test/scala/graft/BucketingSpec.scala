package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffling a table ON WRITE so repeated joins/aggs on the
  * bucket key run with no exchange at read time. At 100 TB this is the
  * difference between shuffling the fact table once per query and never —
  * the standard layout for a fact table joined on the same key daily.
  * (The archive's topic/partition layout, SURVEY §2.1.8, gives the same
  * co-location for its access pattern; bucketing generalizes it to join
  * keys.) */
class BucketingSpec extends SparkSpec {

  test("bucketed-table join on the bucket key plans with no shuffle exchange") {
    // managed tables land in the session's warehouse dir (spark-warehouse
    // under cwd for the test session); DROP TABLE below removes the files.
    // A killed prior run can leave the location behind with no catalog
    // entry — DROP alone won't clear it, so scrub the dirs up front too.
    for (t <- Seq("li_bkt", "ord_bkt")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = graft.core.Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bkt")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bkt")
    // broadcast would mask the co-location; force the sort-merge path
    val joined = spark.table("li_bkt").hint("merge")
      .join(spark.table("ord_bkt"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join on the bucket key must not shuffle:\n$plan")
    // same rows as the unbucketed join
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.selectExpr("sum(n)").head.getLong(0) === expected)
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")
  }
}
