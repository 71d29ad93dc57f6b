package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Determinism._
import graft.core.Tables

/** Core relational surface: scan → filter/project → hash-agg, every join
  * type, set ops, distinct, rollup/cube (SURVEY.md §2 Part B rows:
  * Projection, Filter, Joins, Aggregation, Set operations).
  *
  * The reference has none of these (its only predicate is a topic-name
  * white/blacklist, kafka.clj:182-186; its only aggregation is a running
  * min/max of offsets, kafka.clj:65-67) — this layer is the "analysis" the
  * archive exists for (README.md:8).
  *
  * Scale notes (100 TB design point):
  *  - Aggregations are `groupBy().agg()` → Catalyst plans partial (map-side)
  *    + final hash aggregation; no driver-side state.
  *  - Fact⋈fact joins (lineitem⋈orders) shuffle on the join key — both sides
  *    hash-partitioned, sort-merge or shuffled-hash chosen by AQE.
  *  - Fact⋈dim joins broadcast the dim side explicitly (`broadcast()`), so
  *    the 100 TB side never moves.
  *  - Filters/projections sit directly over the scan → parquet pushdown +
  *    column pruning (verified via .explain in specs).
  */
object CoreRelational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** TPC-H Q1-shaped pricing summary: scan → filter → project → hash agg → sort. */
  def aggSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Selective filter + narrow projection — exercises parquet predicate
    * pushdown and column pruning (the scan must read 5 of 11 columns). */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24.0)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** 3-way join (TPC-H Q3-shaped): broadcast dim (customer) into orders,
    * shuffle join to lineitem, top-10 revenue. */
  def joinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val orders   = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val lineitem = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    lineitem
      .join(orders.join(broadcast(customer), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Left outer join preserving customers with zero orders. */
  def joinLeftOuter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"), dsum(col("o_totalprice")).as("total_spent"))
      .orderBy("c_custkey")

  /** Left-semi join (EXISTS): orders having a high-quantity line. */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val bigLines = t(spark, dir, "lineitem").filter(col("l_quantity") >= 49.0)
    t(spark, dir, "orders")
      .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def joinAnti(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /** Full outer join of two aggregates (nation coverage of customers vs
    * suppliers); USING-style key coalescing. */
  def joinFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .groupBy(col("c_nationkey").as("nationkey")).agg(count(lit(1)).as("n_cust"))
    val s = t(spark, dir, "supplier")
      .groupBy(col("s_nationkey").as("nationkey")).agg(count(lit(1)).as("n_supp"))
    c.join(s, Seq("nationkey"), "full_outer")
      .select("nationkey", "n_cust", "n_supp")
      .orderBy("nationkey")
  }

  /** Theta (non-equi band) join: parts bucketed into price bands via a
    * broadcast range join — the standard shape for dimension-band lookups. */
  def joinTheta(spark: SparkSession, dir: String): DataFrame = {
    val sq = spark; import sq.implicits._
    val bands = Seq(
      ("b1_900_925", 900.0, 925.0), ("b2_925_950", 925.0, 950.0),
      ("b3_950_975", 950.0, 975.0), ("b4_975_1000", 975.0, 1000.0))
      .toDF("band", "lo", "hi")
    t(spark, dir, "part")
      .join(broadcast(bands), col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_parts"), dsum(col("p_retailprice"), 2).as("sum_price"))
      .orderBy("band")
  }

  /** Row-level set operations: union(distinct) / intersect / except over
    * customer vs supplier nation keys, tagged and stacked. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val cn = t(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val sn = t(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    val u = cn.union(sn).distinct().withColumn("op", lit("union"))
    val i = cn.intersect(sn).withColumn("op", lit("intersect"))
    val e = cn.except(sn).withColumn("op", lit("except"))
    u.unionByName(i).unionByName(e)
      .select("op", "nationkey")
      .orderBy("op", "nationkey")
  }

  /** Distinct combinations (dropDuplicates). */
  def distinctCombos(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select("o_orderstatus", "o_orderpriority")
      .dropDuplicates()
      .orderBy("o_orderstatus", "o_orderpriority")

  /** COUNT(DISTINCT) aggregation (expand+two-phase agg under the hood). */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice"), 2).as("sum_price"))
      .orderBy("o_orderstatus")

  /** ROLLUP over the region→nation hierarchy of customers. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = broadcast(t(spark, dir, "nation"))
    val r = broadcast(t(spark, dir, "region"))
    c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal"), 2).as("sum_bal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_cust"), col("sum_bal"))
      .orderBy("region", "nation")
  }

  /** CUBE over order status × priority. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))
      .orderBy("status", "priority")

  /** GROUPING SETS via SQL passthrough. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(s"""
      SELECT coalesce(l_returnflag, 'ALL') AS rflag,
             coalesce(l_linestatus, 'ALL') AS lstatus,
             count(1) AS n,
             ${sumSql("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY rflag, lstatus""")
  }

  /** PIVOT: returnflag values become columns with explicit value list (no
    * extra distinct-scan job; at scale the value list is always declared).
    * Exact decimal sums pivoted, rounded to double in a follow-up select. */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(30, 8))))
      .select(col("l_linestatus"),
        round(col("A"), 4).cast("double").as("A"),
        round(col("N"), 4).cast("double").as("N"),
        round(col("R"), 4).cast("double").as("R"))
      .orderBy("l_linestatus")

  /** UNPIVOT (melt): the pivoted table back to (status, flag, sum_qty)
    * rows — Dataset.unpivot plans a Generate/Expand, no shuffle. */
  def unpivotAgg(spark: SparkSession, dir: String): DataFrame =
    pivotAgg(spark, dir)
      .unpivot(Array(col("l_linestatus")),
        Array(col("A"), col("N"), col("R")), "flag", "sum_qty")
      .orderBy("l_linestatus", "flag")

  /** Generator / UDTF surface: posexplode of the tokenized text — one row
    * per (doc, position, word). Generate is pipelined with the scan (no
    * shuffle); at 100 TB this is the doc→token flattening every text
    * pipeline starts with. */
  def explodeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(expr(graft.functions.TextFunctions.wordsExpr("text")))
          .as(Seq("pos", "word")))
      .orderBy("doc_id", "pos")

  /** Exact percentiles + moment statistics (stddev, corr) with
    * order-independent arithmetic: every sum runs in Decimal (exact,
    * associative — partition merge order can't change it), and the moment
    * formulas are evaluated on the resulting doubles identically in both
    * engines. Built-in stddev/corr stream fp accumulators whose result
    * depends on Spark's nondeterministic merge order — unusable under a
    * hash-compare gate. */
  def statsAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    // One scan, one codegen'd hash agg on (flag, quantity), then a
    // ~|flags|×|distinct qty|-row re-agg. Three scale moves vs the naive
    // sort-agg form:
    //  - `percentile` runs on the HISTOGRAM (frequency form — identical
    //    interpolation semantics), so the ObjectHashAggregate it needs
    //    sees ~150 rows, not the corpus, and never shares an agg with
    //    (and de-codegens) the sums;
    //  - sums that fit integer grain go through exact BIGINT arithmetic
    //    instead of BigDecimal: quantities are integral and prices are
    //    2-decimal, so qty, qty², round(price·100) and round(qty·price·100)
    //    are exact longs (products first — fp error is ≤1e-9, far inside
    //    the 0.5 rounding margin; headroom at 6e9 rows: sxy·100 ≤ 3e18 <
    //    2^63). The /100 de-scales happen in DECIMAL so the only double
    //    rounding is the final cast — bit-equal to the oracle's
    //    sum(DECIMAL)::DOUBLE at any scale;
    //  - price² genuinely overflows scaled longs (1e14/row), so syy alone
    //    stays a decimal sum.
    spark.sql(s"""
      WITH h AS (
        SELECT l_returnflag, l_quantity, count(1) AS cnt,
          sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy100,
          sum(CAST(round(l_quantity * l_extendedprice * 100) AS BIGINT)) AS sxy100,
          sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,8))) AS syyd
        FROM lineitem GROUP BY l_returnflag, l_quantity),
      s AS (
        SELECT l_returnflag,
          sum(cnt) AS n,
          CAST(sum(CAST(l_quantity AS BIGINT) * cnt) AS DOUBLE) AS sx,
          CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * cnt)
            AS DOUBLE) AS sxx,
          CAST(CAST(sum(sy100) AS DECIMAL(38,0)) / 100 AS DOUBLE) AS sy,
          CAST(sum(syyd) AS DOUBLE) AS syy,
          CAST(CAST(sum(sxy100) AS DECIMAL(38,0)) / 100 AS DOUBLE) AS sxy,
          percentile(l_quantity, 0.5, cnt) AS med,
          percentile(l_quantity, 0.9, cnt) AS p90
        FROM h GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        ${droundSql("med", 6)} AS median_qty,
        ${droundSql("p90", 6)} AS p90_qty,
        ${droundSql("sqrt((n * sxx - sx * sx) / (n * (n - 1)))", 6)} AS stddev_qty,
        ${droundSql(
          "(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))", 8)}
          AS corr_qty_price
      FROM s ORDER BY l_returnflag""")
  }

  /** The 100 TB path for [[statsAgg]]'s percentiles: exact `percentile`
    * is a sort-based aggregate (every group's values collected and
    * sorted); `approx_percentile` (t-digest-style sketch, here accuracy
    * 10000 ≈ 0.01% rank error) is a mergeable one-pass aggregate with
    * map-side partials — the only form that survives groups that don't
    * fit in one task's memory. Not oracle-gated (sketch internals are
    * engine-specific); CoreRelationalSpec asserts agreement with the
    * exact form within tolerance. */
  def statsAggApprox(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("median_qty"),
        expr("approx_percentile(l_quantity, 0.9, 10000)").as("p90_qty"))
      .orderBy("l_returnflag")

  /** Oracle gate for [[statsAggApprox]], the q46 scale path: emit the
    * exact percentiles (oracle-checkable) PLUS booleans asserting the
    * `approx_percentile` sketch landed within tolerance of them — the
    * same make-the-approx-path-gateable move as q26. Tolerance: 1.0
    * absolute on a 1–50 integer-valued column — exact `percentile`
    * interpolates (x.5 values) while the sketch returns data values, so
    * sub-1.0 gaps are inherent; anything over 1.0 means a broken sketch.
    * At accuracy 10000 the rank error is ~0.01%, far inside the band. */
  def approxPercentileGate(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(l_quantity, 0.5)").as("med"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("amed"),
        expr("approx_percentile(l_quantity, 0.9, 10000)").as("ap90"))
      .select(col("l_returnflag"), col("n"),
        dround(col("med"), 6).as("median_qty"),
        dround(col("p90"), 6).as("p90_qty"),
        (abs(col("amed") - col("med")) <= 1.0).as("median_within_tol"),
        (abs(col("ap90") - col("p90")) <= 1.0).as("p90_within_tol"))
      .orderBy("l_returnflag")

  /** Deterministic stratified sampling — the training-data "mixture"
    * primitive (sample source A at 5%, B at 10%, …). RNG-based `sample`/
    * `sampleBy` is irreproducible across runs and partitionings; hash-gate
    * sampling (row in iff xhash(stable key) mod 100 < stratum rate) is
    * exactly reproducible on any cluster layout, needs no RNG state or
    * strata collect, and compiles to a codegen'd filter AT THE SCAN — at
    * 100 TB the rejected rows never leave the scan stage. Output is the
    * per-stratum sample summary (count + exact sum). */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = xhash(concat_ws("-",
      col("l_orderkey").cast("string"), col("l_linenumber").cast("string"))) % 100
    val rate = when(col("l_returnflag") === "A", 5)
      .when(col("l_returnflag") === "N", 10)
      .otherwise(20)
    t(spark, dir, "lineitem")
      .filter(bucket < rate)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sampled"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** Salted skew join: the manual skew-mitigation pattern for when AQE's
    * runtime skew split isn't enough (hot keys known a priori, or the
    * skewed shuffle itself is the bottleneck). The fact side gets a
    * deterministic salt in [0, S); the dim side is replicated ×S with
    * every salt value; the join key becomes (key, salt), spreading each
    * hot key over S reducers. The salt hash is engine-internal (xxhash64)
    * — any row matches exactly one replica, so the result is identical to
    * the unsalted join, which is what the oracle checks. shuffle_hash
    * hint keeps it a real shuffle join (a broadcast would make salting
    * moot — at 100 TB the dim that needs this doesn't fit in broadcast). */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val S = 8
    val events = t(spark, dir, "events")
      .withColumn("esalt", pmod(xxhash64(col("event_id")), lit(S)).cast("int"))
    val dim = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("dsalt", explode(sequence(lit(0), lit(S - 1))))
      .hint("shuffle_hash")
    events
      .join(dim, col("user_id") === col("c_custkey") && col("esalt") === col("dsalt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy("c_mktsegment")
  }

  /** Approximate distinct (HLL++). The approx values themselves are
    * engine-specific, so the oracle-checked output is the exact distinct
    * counts plus booleans asserting the HLL estimate landed within 5% of
    * them (HLL++ at default rsd=5% is deterministic given the input, so
    * the booleans are stable); the oracle emits the exact counts and
    * literal TRUEs — a hash-match gates the approx path for real.
    * rsd=0.02 (4× the default sketch) keeps the estimate comfortably
    * inside the 5% assertion band.
    *
    * Plan shape: each distinct column is pre-deduped with its own
    * two-level aggregation, then the two 3-row results join. Asking for
    * two `count(DISTINCT …)`s in one agg makes Catalyst plan an Expand
    * (3× every input row through the first shuffle — measured 9 s vs
    * ~1.5 s here at sf0.1); the pre-dedup form instead lets map-side
    * partial aggregation crush each partition to ~|distinct| rows before
    * anything shuffles. HLL over the deduped rows is the identical sketch
    * (duplicate-insensitive), so the estimates are unchanged. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    def side(c: String, exact: String, within: String) =
      li.select(col("l_returnflag"), col(c)).distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as(exact),
          approx_count_distinct(col(c), 0.02).as("approx"))
        .select(col("l_returnflag"), col(exact),
          (abs(col("approx") - col(exact)) <= col(exact) * lit(0.05)).as(within))
    side("l_partkey", "exact_parts", "parts_within_5pct")
      .join(side("l_orderkey", "exact_orders", "orders_within_5pct"), "l_returnflag")
      .select("l_returnflag", "exact_parts", "exact_orders",
        "parts_within_5pct", "orders_within_5pct")
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_summary"    -> aggSummary _,
    "q02_filter_project" -> filterProject _,
    "q03_join_revenue"   -> joinRevenue _,
    "q04_join_left_outer"-> joinLeftOuter _,
    "q05_join_semi"      -> joinSemi _,
    "q06_join_anti"      -> joinAnti _,
    "q07_join_full_outer"-> joinFullOuter _,
    "q08_join_theta"     -> joinTheta _,
    "q13_set_ops"        -> setOps _,
    "q14_distinct"       -> distinctCombos _,
    "q15_agg_distinct"   -> aggDistinct _,
    "q16_rollup"         -> rollupAgg _,
    "q17_cube"           -> cubeAgg _,
    "q18_grouping_sets"  -> groupingSets _,
    "q26_approx_distinct"-> approxDistinct _,
    "q44_pivot"          -> pivotAgg _,
    "q45_explode"        -> explodeTokens _,
    "q46_stats_agg"      -> statsAgg _,
    "q47_unpivot"        -> unpivotAgg _,
    "q48_salted_join"    -> saltedJoin _,
    "q49_stratified_sample" -> stratifiedSample _,
    "q61_approx_pctile_gate" -> approxPercentileGate _
  )

  val oracles: Map[String, String] = Map(
    "q01_agg_summary" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${sumSql("l_quantity")} AS sum_qty,
        ${sumSql("l_extendedprice")} AS sum_base_price,
        ${sumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        ${sumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
        ${avgSql("l_quantity")} AS avg_qty,
        ${avgSql("l_extendedprice")} AS avg_price,
        ${avgSql("l_discount")} AS avg_disc,
        count(1) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_project" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0
      ORDER BY l_orderkey, l_linenumber""",
    "q03_join_revenue" -> s"""
      SELECT o_orderkey, o_orderdate, o_orderpriority,
        ${sumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY o_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10""",
    "q04_join_left_outer" -> s"""
      SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        ${sumSql("o_totalprice")} AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name
      ORDER BY c_custkey""",
    "q05_join_semi" -> """
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
      ORDER BY o_orderkey""",
    "q06_join_anti" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",
    "q07_join_full_outer" -> """
      SELECT nationkey, n_cust, n_supp
      FROM (SELECT c_nationkey AS nationkey, count(1) AS n_cust FROM customer GROUP BY 1) c
      FULL JOIN (SELECT s_nationkey AS nationkey, count(1) AS n_supp FROM supplier GROUP BY 1) s
      USING (nationkey)
      ORDER BY nationkey""",
    "q08_join_theta" -> s"""
      SELECT band, count(1) AS n_parts,
        ${sumSql("p_retailprice", 2)} AS sum_price
      FROM part
      JOIN (VALUES ('b1_900_925', 900.0, 925.0), ('b2_925_950', 925.0, 950.0),
                   ('b3_950_975', 950.0, 975.0), ('b4_975_1000', 975.0, 1000.0))
           AS bands(band, lo, hi)
        ON p_retailprice >= lo AND p_retailprice < hi
      GROUP BY band
      ORDER BY band""",
    "q13_set_ops" -> """
      WITH cn AS (SELECT c_nationkey AS nationkey FROM customer),
           sn AS (SELECT s_nationkey AS nationkey FROM supplier)
      SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM cn UNION SELECT nationkey FROM sn)
      UNION ALL
      SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
      UNION ALL
      SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
      ORDER BY op, nationkey""",
    "q14_distinct" -> """
      SELECT DISTINCT o_orderstatus, o_orderpriority
      FROM orders
      ORDER BY o_orderstatus, o_orderpriority""",
    "q15_agg_distinct" -> s"""
      SELECT o_orderstatus,
        count(DISTINCT o_custkey) AS n_customers,
        count(DISTINCT o_orderpriority) AS n_priorities,
        count(1) AS n_orders,
        ${sumSql("o_totalprice", 2)} AS sum_price
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",
    "q16_rollup" -> s"""
      SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        count(1) AS n_cust, ${sumSql("c_acctbal", 2)} AS sum_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY region, nation""",
    "q17_cube" -> s"""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
        coalesce(o_orderpriority, 'ALL') AS priority,
        count(1) AS n_orders, ${sumSql("o_totalprice", 2)} AS sum_price
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, priority""",
    "q18_grouping_sets" -> s"""
      SELECT coalesce(l_returnflag, 'ALL') AS rflag,
             coalesce(l_linestatus, 'ALL') AS lstatus,
             count(1) AS n,
             ${sumSql("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY rflag, lstatus""",
    "q26_approx_distinct" -> """
      SELECT l_returnflag,
        count(DISTINCT l_partkey)::BIGINT AS exact_parts,
        count(DISTINCT l_orderkey)::BIGINT AS exact_orders,
        TRUE AS parts_within_5pct,
        TRUE AS orders_within_5pct
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",
    "q44_pivot" -> s"""
      SELECT l_linestatus,
        ${sumSql("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS "A",
        ${sumSql("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS "N",
        ${sumSql("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS "R"
      FROM lineitem
      GROUP BY l_linestatus
      ORDER BY l_linestatus""",
    "q45_explode" -> """
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                 FROM documents),
      e AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM t)
      SELECT doc_id, (i - 1)::INT AS pos, w[i] AS word
      FROM e ORDER BY doc_id, pos""",
    "q46_stats_agg" -> s"""
      WITH s AS (
        SELECT l_returnflag,
          count(1) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sx,
          CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sxx,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sy,
          CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS syy,
          CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sxy,
          quantile_cont(l_quantity, 0.5) AS med,
          quantile_cont(l_quantity, 0.9) AS p90
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        ${droundSql("med", 6)} AS median_qty,
        ${droundSql("p90", 6)} AS p90_qty,
        ${droundSql("sqrt((n * sxx - sx * sx) / (n * (n - 1)))", 6)} AS stddev_qty,
        ${droundSql(
          "(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))", 8)}
          AS corr_qty_price
      FROM s ORDER BY l_returnflag""",
    "q61_approx_pctile_gate" -> s"""
      SELECT l_returnflag, count(1) AS n,
        ${droundSql("quantile_cont(l_quantity, 0.5)", 6)} AS median_qty,
        ${droundSql("quantile_cont(l_quantity, 0.9)", 6)} AS p90_qty,
        TRUE AS median_within_tol,
        TRUE AS p90_within_tol
      FROM lineitem GROUP BY l_returnflag
      ORDER BY l_returnflag""",
    "q47_unpivot" -> s"""
      WITH p AS (
        SELECT l_linestatus,
          ${sumSql("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS qa,
          ${sumSql("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS qn,
          ${sumSql("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS qr
        FROM lineitem GROUP BY l_linestatus)
      SELECT l_linestatus, flag, sum_qty FROM (
        SELECT l_linestatus, 'A' AS flag, qa AS sum_qty FROM p
        UNION ALL SELECT l_linestatus, 'N', qn FROM p
        UNION ALL SELECT l_linestatus, 'R', qr FROM p)
      ORDER BY l_linestatus, flag""",
    "q48_salted_join" -> s"""
      SELECT c_mktsegment, count(1) AS n_events,
        ${sumSql("value")} AS sum_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",
    "q49_stratified_sample" -> s"""
      SELECT l_returnflag, count(1) AS n_sampled,
        ${sumSql("l_quantity")} AS sum_qty
      FROM lineitem
      WHERE ${xhashSql("l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR")} % 100
        < CASE l_returnflag WHEN 'A' THEN 5 WHEN 'N' THEN 10 ELSE 20 END
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""
  )
}
