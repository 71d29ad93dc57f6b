package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Determinism._
import graft.core.Tables

/** Scalar-function surface: string / date / math / JSON / conditional
  * expressions, plus subquery-shaped plans (SURVEY.md §2 Part B row
  * "Scalar functions"). The reference's entire expression language is one
  * `format` call for object keys (s3.clj:16) and an `inc` of an offset
  * (s3.clj:64); everything here is `org.apache.spark.sql.functions._` —
  * codegen'd, no UDFs in the hot path.
  */
object Scalars {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** String functions over part. Output types pinned (int) to match the
    * oracle exactly. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        upper(col("p_brand")).as("brand_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        split(col("p_type"), " ").getItem(0).as("type_first"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        reverse(col("p_brand")).as("brand_rev"),
        lpad(col("p_partkey").cast("string"), 10, "0").as("key_padded"),
        levenshtein(col("p_brand"), lit("Brand#13")).as("brand_dist"))
      .orderBy("p_partkey")

  /** Date/time functions over orders (restricted key range for brevity). */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") < 2000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mon"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since_epoch"))
      .orderBy("o_orderkey")

  /** Math functions over lineitem. Only IEEE-exact ops (abs/ceil/floor/
    * round/mod/sign/greatest/least/sqrt) so results are bit-identical on
    * any engine; transcendentals live in [[graft.functions]] where no
    * oracle hash is at stake. */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 500)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25.0).as("qty_dev"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        dround(col("l_extendedprice") / 100.0, 2).as("price_pct"),
        (col("l_orderkey") % 7).as("key_mod"),
        signum(col("l_discount") - 0.05).as("disc_sign"),
        greatest(col("l_quantity"), col("l_discount") * 100.0).as("g"),
        least(col("l_tax"), col("l_discount")).as("l"),
        dround(sqrt(col("l_quantity")), 6).as("qty_sqrt"))
      .orderBy("l_orderkey", "l_linenumber")

  /** JSON extraction over the events `props` payload — the natural decode
    * for archived Kafka values (SURVEY.md §1.3: opaque bytes → from_json /
    * get_json_object at the analytics layer). */
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .filter(col("event_id") < 2000)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        (get_json_object(col("props"), "$.k").cast("int") % 10).as("k_bucket"))
      .orderBy("event_id")

  /** CASE WHEN / coalesce / nullif conditionals. */
  def conditionals(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") < 3000)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000.0, "big")
          .when(col("o_totalprice") > 100000.0, "mid")
          .otherwise("small").as("size_class"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("NOT_P")).as("status_np"),
        when(col("o_orderpriority").startsWith("1"), 1).otherwise(0).as("is_urgent"))
      .orderBy("o_orderkey")

  /** Correlated-subquery shape: orders above their customer's mean order
    * value. Planned as agg + broadcast-back join (how Catalyst de-correlates
    * it anyway); mean via exact decimal sum so the predicate is stable. */
  def subqueryAboveAvg(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val custAvg = orders.groupBy(col("o_custkey").as("ck"))
      .agg((sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(30, 8)))
        .cast("double") / count(lit(1))).as("avg_price"))
    orders.join(broadcast(custAvg), col("o_custkey") === col("ck"))
      .filter(col("o_totalprice") > col("avg_price"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        dround(col("avg_price"), 4).as("cust_avg"))
      .orderBy("o_orderkey")
  }

  /** Map-typed columns: parse the JSON props into map<string,int>, then
    * size / keys / explode — the map half of the semi-structured surface
    * (q22 covers path extraction). Map explode is the schema-on-read
    * pattern for property bags whose keys aren't known at write time. */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .filter(col("event_id") < 1000)
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType)).as("m"))
      .select(col("event_id"),
        size(col("m")).as("n_keys"),
        explode(col("m")).as(Seq("key", "val")))
      .orderBy("event_id", "key")

  /** Batch analog of a streaming tumbling window: hourly event rollup
    * (the streaming variant with watermarks lives in graft.streaming). */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
      .orderBy("hour", "event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_string_funcs"  -> stringFuncs _,
    "q20_date_funcs"    -> dateFuncs _,
    "q21_math_funcs"    -> mathFuncs _,
    "q22_json_funcs"    -> jsonFuncs _,
    "q23_conditionals"  -> conditionals _,
    "q24_subquery_avg"  -> subqueryAboveAvg _,
    "q25_events_hourly" -> eventsHourly _,
    "q53_map_funcs"     -> mapFuncs _
  )

  val oracles: Map[String, String] = Map(
    "q19_string_funcs" -> """
      SELECT p_partkey,
        lower(p_name) AS name_lower,
        upper(p_brand) AS brand_upper,
        length(p_name)::INT AS name_len,
        substr(p_name, 1, 8) AS name_prefix,
        regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
        string_split(p_type, ' ')[1] AS type_first,
        p_brand || ':' || p_type AS brand_type,
        reverse(p_brand) AS brand_rev,
        lpad(p_partkey::VARCHAR, 10, '0') AS key_padded,
        levenshtein(p_brand, 'Brand#13')::INT AS brand_dist
      FROM part
      ORDER BY p_partkey""",
    "q20_date_funcs" -> """
      SELECT o_orderkey,
        extract(year FROM o_orderdate)::INT AS yr,
        extract(quarter FROM o_orderdate)::INT AS qtr,
        extract(month FROM o_orderdate)::INT AS mon,
        extract(day FROM o_orderdate)::INT AS dom,
        date_trunc('month', o_orderdate) AS month_start,
        o_orderdate + INTERVAL 30 DAY AS due_date,
        datediff('day', DATE '1995-01-01', o_orderdate::DATE)::INT AS days_since_epoch
      FROM orders
      WHERE o_orderkey < 2000
      ORDER BY o_orderkey""",
    "q21_math_funcs" -> """
      SELECT l_orderkey, l_linenumber,
        abs(l_quantity - 25.0) AS qty_dev,
        ceil(l_extendedprice)::BIGINT AS price_ceil,
        floor(l_extendedprice)::BIGINT AS price_floor,
        floor((l_extendedprice / 100.0) * 1e2 + 0.5) / 1e2 AS price_pct,
        l_orderkey % 7 AS key_mod,
        CASE WHEN l_discount - 0.05 > 0 THEN 1.0
             WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS disc_sign,
        greatest(l_quantity, l_discount * 100.0) AS g,
        least(l_tax, l_discount) AS l,
        floor(sqrt(l_quantity) * 1e6 + 0.5) / 1e6 AS qty_sqrt
      FROM lineitem
      WHERE l_orderkey < 500
      ORDER BY l_orderkey, l_linenumber""",
    "q22_json_funcs" -> """
      SELECT event_id,
        json_extract_string(props, '$.k')::INT AS k,
        json_extract_string(props, '$.k')::INT % 10 AS k_bucket
      FROM events
      WHERE event_id < 2000
      ORDER BY event_id""",
    "q23_conditionals" -> """
      SELECT o_orderkey,
        CASE WHEN o_totalprice > 300000.0 THEN 'big'
             WHEN o_totalprice > 100000.0 THEN 'mid'
             ELSE 'small' END AS size_class,
        coalesce(nullif(o_orderstatus, 'P'), 'NOT_P') AS status_np,
        CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS is_urgent
      FROM orders
      WHERE o_orderkey < 3000
      ORDER BY o_orderkey""",
    "q24_subquery_avg" -> """
      SELECT o_orderkey, o_custkey, o_totalprice, floor(avg_price * 1e4 + 0.5) / 1e4 AS cust_avg
      FROM orders
      JOIN (SELECT o_custkey AS ck,
              sum(CAST(o_totalprice AS DECIMAL(30,8)))::DOUBLE / count(1) AS avg_price
            FROM orders GROUP BY 1) a
        ON o_custkey = ck
      WHERE o_totalprice > avg_price
      ORDER BY o_orderkey""",
    "q25_events_hourly" -> s"""
      SELECT date_trunc('hour', ts) AS hour, event_type,
        count(1) AS n, ${sumSql("value", 2)} AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour, event_type""",
    "q53_map_funcs" -> """
      SELECT event_id,
        len(json_keys(props))::INT AS n_keys,
        k AS key,
        json_extract(props, '$.' || k)::INT AS val
      FROM (SELECT event_id, props, unnest(json_keys(props)) AS k
            FROM events WHERE event_id < 1000)
      ORDER BY event_id, key"""
  )
}
