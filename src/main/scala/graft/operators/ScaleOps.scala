package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Determinism._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Round-4b operator surface: warehouse temporal modeling (SCD-2),
  * iterative graph ranking (PageRank), sparse-vector similarity
  * (TF-IDF cosine pairs over an inverted index), product-quantization
  * encoding (the IVF-PQ building block), and last-touch revenue
  * attribution. Same contract as every other query group: one
  * `queries` entry + one DuckDB oracle per operator; every
  * fp-critical expression is decimal-bridged so the two engines
  * cannot drift.
  */
object ScaleOps {

  // Shared tuning constants (Spark plan ⟷ oracle SQL)
  val SparseDfMin = 2      // df=1 terms cannot contribute to any pair
  val SparseDfCap = 50     // stop-term cap: bounds every posting list,
                           //   so the term self-join is O(vocab·cap²)
                           //   worst-case instead of O(n²)
  val SparseTau = "0.6"    // cosine threshold, spelled once for both engines
  val PrDamping = "0.85"   // PageRank damping, literal for both engines
  val PrIters = 3
  val PqM = 4              // PQ subspaces
  val PqSub = 16           // dims per subspace (4 × 16 = 64-dim fixture)
  val PqK = 8              // centroids per subspace
  val PqTopK = 10          // ADC results per probe
  val PqProbeMod = 100     // probes = vec_ids ≡ 0 (mod 100)
  val MergeInserts = 50    // CDC fixture: rows appended past max key

  // ---------------------------------------------------------------- q102
  /** SCD-2 dimension build from an event-ordered fact: collapse each
    * customer's order-status observations into validity intervals
    * [valid_from, valid_to) with an is_current flag — the standard
    * slowly-changing-dimension type-2 construction (gaps-and-islands:
    * change flag → running island id → min/lead per island). At scale
    * this is two window passes and one hash agg, all partitioned by the
    * dimension key — one shuffle on o_custkey total, because Spark
    * reuses the (o_custkey)-hash exchange across the two windows and
    * the groupBy. Dialect-neutral: the SAME string is the Spark plan
    * and the DuckDB oracle. */
  def scd2Sql(table: String, sentinel: String): String = s"""
    WITH s AS (
      SELECT o_custkey, o_orderkey, o_orderdate AS ts, o_orderstatus AS status,
        lag(o_orderstatus) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey) AS prev_status
      FROM $table),
    c AS (
      SELECT o_custkey, o_orderkey, ts, status,
        CASE WHEN prev_status IS NULL OR prev_status <> status
             THEN 1 ELSE 0 END AS chg
      FROM s),
    g AS (
      SELECT o_custkey, ts, status,
        sum(chg) OVER (PARTITION BY o_custkey ORDER BY ts, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM c),
    r AS (
      SELECT o_custkey, status, island,
        min(ts) AS valid_from, count(1) AS n_obs
      FROM g GROUP BY o_custkey, status, island)
    SELECT o_custkey, status, valid_from,
      coalesce(lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY island),
        $sentinel) AS valid_to,
      (lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY island)
        IS NULL) AS is_current,
      n_obs
    FROM r
    ORDER BY o_custkey, island"""

  def scd2(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    // the fact table reads as TIMESTAMP_NTZ (nanos-safe load), so the
    // open-interval sentinel must be NTZ too; DuckDB's plain TIMESTAMP
    // is already time-zone-naive
    spark.sql(scd2Sql("orders", "TIMESTAMP_NTZ '9999-12-31 00:00:00'"))
  }

  // ---------------------------------------------------------------- q103
  /** Sparse TF-IDF cosine near-dup pairs via an inverted index — the
    * lexical mirror of q38's dense-embedding near-dup. Postings are
    * df-capped ([SparseDfMin, SparseDfCap]): rare-but-shared terms
    * drive the signal, stop-terms (whose posting lists would each
    * produce df² candidate pairs) are dropped, so the term self-join
    * is bounded by cap·Σdf — linear in the corpus, never O(n²).
    * Exactness: weights are decimal-bridged to a 1e-6 grid as int64
    * the moment they leave fp (`ln` of identical doubles — q73/q90
    * precedent); dot products and squared norms are then EXACT integer
    * arithmetic (decimal-widened products), so the only fp in the
    * output expression is one divide + two sqrt on identical integers. */
  private def sparseCosineSql(unnestDocs: String): String = s"""
    WITH uni AS ($unnestDocs),
    tf AS (SELECT doc_id, term, count(1) AS tf FROM uni GROUP BY doc_id, term),
    df AS (SELECT term, count(1) AS df FROM tf GROUP BY term
           HAVING count(1) BETWEEN $SparseDfMin AND $SparseDfCap),
    nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS nd FROM uni),
    w AS (
      SELECT tf.doc_id, tf.term,
        CAST(floor(CAST(tf AS DOUBLE) * ln(nd / CAST(df AS DOUBLE)) * 1e6 + 0.5)
          AS BIGINT) AS w6
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN nd),
    nrm AS (
      SELECT doc_id, CAST(sum(CAST(w6 AS DECIMAL(19,0)) * w6) AS DECIMAL(38,0)) AS s
      FROM w GROUP BY doc_id),
    dot AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(sum(CAST(a.w6 AS DECIMAL(19,0)) * b.w6) AS DECIMAL(38,0)) AS dp
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    cos AS (
      SELECT id_a, id_b,
        floor(CAST(dp AS DOUBLE) /
          (sqrt(CAST(na.s AS DOUBLE)) * sqrt(CAST(nb.s AS DOUBLE))) * 1e6 + 0.5)
          / 1e6 AS cos6
      FROM dot
      JOIN nrm na ON dot.id_a = na.doc_id
      JOIN nrm nb ON dot.id_b = nb.doc_id)
    SELECT id_a, id_b, cos6 FROM cos
    WHERE cos6 >= $SparseTau
    ORDER BY id_a, id_b"""

  /** Spark side splits [[sparseCosineSql]] at the weights table and
    * persists it: `w` feeds the norm agg AND both branches of the term
    * self-join, and Spark inlines multiply-referenced CTEs — without
    * the persist the explode+tf+df pipeline runs three times. Same
    * expressions, so the oracle hash is unchanged. */
  def sparseCosine(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "documents").createOrReplaceTempView("documents")
    val w = spark.sql(s"""
      WITH uni AS (
        SELECT doc_id, explode(${wordsExpr("text")}) AS term FROM documents),
      tf AS (SELECT doc_id, term, count(1) AS tf FROM uni GROUP BY doc_id, term),
      df AS (SELECT term, count(1) AS df FROM tf GROUP BY term
             HAVING count(1) BETWEEN $SparseDfMin AND $SparseDfCap),
      nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS nd FROM uni)
      SELECT tf.doc_id, tf.term,
        CAST(floor(CAST(tf AS DOUBLE) * ln(nd / CAST(df AS DOUBLE)) * 1e6 + 0.5)
          AS BIGINT) AS w6
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN nd""")
      .transform(graft.core.EngineCache.persisted)
    w.createOrReplaceTempView("sparse_w")
    spark.sql(s"""
      WITH nrm AS (
        SELECT doc_id, CAST(sum(CAST(w6 AS DECIMAL(19,0)) * w6) AS DECIMAL(38,0)) AS s
        FROM sparse_w GROUP BY doc_id),
      dot AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(sum(CAST(a.w6 AS DECIMAL(19,0)) * b.w6) AS DECIMAL(38,0)) AS dp
        FROM sparse_w a JOIN sparse_w b
          ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id),
      cos AS (
        SELECT id_a, id_b,
          floor(CAST(dp AS DOUBLE) /
            (sqrt(CAST(na.s AS DOUBLE)) * sqrt(CAST(nb.s AS DOUBLE))) * 1e6 + 0.5)
            / 1e6 AS cos6
        FROM dot
        JOIN nrm na ON dot.id_a = na.doc_id
        JOIN nrm nb ON dot.id_b = nb.doc_id)
      SELECT id_a, id_b, cos6 FROM cos
      WHERE cos6 >= $SparseTau
      ORDER BY id_a, id_b""")
  }

  // ---------------------------------------------------------------- q104
  /** Fixed-iteration PageRank over the part co-purchase graph (two
    * parts are adjacent when they appear in the same order; edges
    * symmetrized, so there are no dangling nodes). Each iteration is
    * one edge⋈rank join + one hash agg — the canonical scale shape: the
    * edge list partitions by src once and every iteration reuses that
    * exchange; rank state is O(|V|), never materialized per-edge beyond
    * the shuffle. Exactness: per-edge contributions r/deg are
    * half-up-bridged to a 1e-12 grid as DECIMAL before the
    * order-nondeterministic sum, and each new rank is re-rounded onto
    * the grid, so every iteration starts from bit-identical state in
    * both engines. Dialect-neutral: one string, both engines. */
  def pageRankSql(table: String, iters: Int): String = {
    val d = PrDamping
    val iterCtes = (1 to iters).map { i =>
      val p = s"r${i - 1}"
      s"""c$i AS (
      SELECT e.dst AS node,
        CAST(floor($p.r / CAST($p.deg AS DOUBLE) * 1e12 + 0.5)
          AS DECIMAL(38,0)) AS c
      FROM e JOIN $p ON e.src = $p.node),
    s$i AS (SELECT node, sum(c) AS sc FROM c$i GROUP BY node),
    r$i AS (
      SELECT dg.node, dg.deg,
        floor((((1.0 - $d) / nd.nd) +
               $d * (CAST(coalesce(s$i.sc, 0) AS DOUBLE) / 1e12)) * 1e12 + 0.5)
          / 1e12 AS r
      FROM deg dg CROSS JOIN nd
      LEFT JOIN s$i ON dg.node = s$i.node)"""
    }.mkString(",\n    ")
    s"""
    WITH e0 AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM $table a JOIN $table b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    deg AS (SELECT src AS node, count(1) AS deg FROM e GROUP BY src),
    nd AS (SELECT CAST(count(1) AS DOUBLE) AS nd FROM deg),
    r0 AS (
      SELECT node, deg, floor(1e12 / nd.nd + 0.5) / 1e12 AS r
      FROM deg CROSS JOIN nd),
    $iterCtes
    SELECT node, ${droundSql("r", 9)} AS pagerank
    FROM r$iters
    ORDER BY node"""
  }

  /** Spark-side PageRank: same arithmetic as [[pageRankSql]] (the
    * oracle), but with the edge list and degree table persisted ONCE —
    * the unrolled-CTE form recomputes the distinct self-join every
    * iteration (Spark inlines CTEs), which is exactly the mistake a
    * 100 TB iteration cannot afford. `deg.count()` doubles as the
    * materialization action and the |V| the teleport term needs. */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.storage.StorageLevel
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val e0 = li.alias("a")
      .join(li.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .transform(graft.core.EngineCache.persisted)
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .transform(graft.core.EngineCache.persisted)
    val n = deg.count() // materializes both persists; |V| for teleport
    val d = PrDamping
    var r = deg.select(col("node"), col("deg"),
      expr(s"floor(1e12 / CAST($n AS DOUBLE) + 0.5) / 1e12").as("r"))
    for (i <- 1 to PrIters) {
      val contrib = e.join(r, e("src") === r("node"))
        .select(col("dst").as("node"),
          expr("CAST(floor(r / CAST(deg AS DOUBLE) * 1e12 + 0.5) " +
            "AS DECIMAL(38,0))").as("c"))
      val sums = contrib.groupBy("node").agg(sum("c").as("sc"))
      r = deg.join(sums, Seq("node"), "left")
        .select(col("node"), col("deg"),
          expr(s"floor((((1.0 - $d) / CAST($n AS DOUBLE)) + " +
            s"$d * (CAST(coalesce(sc, 0) AS DOUBLE) / 1e12)) * 1e12 + 0.5) " +
            "/ 1e12").as("r"))
      // q149's barrier discipline: persist + materialize each round so
      // the execution is five short independent jobs over cached state
      // instead of one 12-stage DAG — the lazily-chained form ran ~2×
      // slower deep in a long-lived session (accumulated listener/GC
      // pressure stretches long DAGs first) with rare far-worse spikes
      if (i < PrIters) {
        r = r.transform(graft.core.EngineCache.persisted)
        r.count()
      }
    }
    r.select(col("node"), dround(col("r"), 9).as("pagerank")).orderBy("node")
  }

  // ---------------------------------------------------------------- q149
  /** HITS hubs & authorities over the bipartite customer→part purchase
    * graph (edges = distinct (o_custkey, l_partkey) via orders⋈lineitem)
    * — the classic mutual-reinforcement ranking: a part is authoritative
    * when influential customers buy it; a customer is a hub when they
    * buy authoritative parts. [[HitsIters]] fixed alternations of
    * h = Σ a(out-neighbors), a = Σ h(in-neighbors), each half-step
    * max-normalized. Cross-engine determinism mirrors q104: scores live
    * on a 1e12 grid, per-edge contributions are floor-bridged to
    * DECIMAL(38,0) before the order-nondeterministic sum, and the
    * normalizing division casts the same exact integers to double in
    * both engines. Scale shape: the edge list is built and persisted
    * ONCE (the oracle's unrolled CTEs re-derive it per reference —
    * exactly what a 100 TB iteration cannot afford); each half-step is
    * one edge⋈score join + hash agg keyed on the score side, and the
    * 1-row max broadcasts. State is O(|V|) per step. */
  val HitsIters = 3
  private val hitsNormSql =
    "floor(CAST(sc AS DOUBLE) / CAST(mx AS DOUBLE) * 1e12 + 0.5) / 1e12"
  def hits(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val e = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct()
      .transform(graft.core.EngineCache.persisted)
    // Each half-step PERSISTS its raw-sum frame and collects the 1-scalar
    // max on the driver (DistributedRank's counts-collect idiom). The
    // tempting alternative — crossJoin(broadcast(raw.agg(max))) — embeds
    // the frame in its own plan TWICE (max subquery + main), doubling the
    // unpersisted lineage per half-step: 2^(2·iters) re-expansions, which
    // is exactly the CTE-inlining blowup the PQ codebook build hit
    // (observed: 3-iteration HITS > 60 s at sf0.1; with the barrier it is
    // one join + one agg per half-step). BigDecimal.doubleValue is the
    // same round-to-nearest as the oracle's CAST(mx AS DOUBLE).
    var a = e.select(col("part")).distinct().withColumn("a", lit(1.0))
    var h: DataFrame = a // placeholder; assigned in round 1
    def normalized(raw: DataFrame, key: String, out: String): DataFrame = {
      val mx = raw.agg(max(col("sc"))).head.getDecimal(0).doubleValue
      raw.select(col(key),
        (floor(col("sc").cast("double") / lit(mx) * lit(1e12) + lit(0.5)) /
          lit(1e12)).as(out))
    }
    for (_ <- 1 to HitsIters) {
      val hraw = e.join(a, "part").groupBy("cust")
        .agg(expr("sum(CAST(floor(a * 1e12 + 0.5) AS DECIMAL(38,0)))").as("sc"))
        .transform(graft.core.EngineCache.persisted)
      h = normalized(hraw, "cust", "h")
      val araw = e.join(h, "cust").groupBy("part")
        .agg(expr("sum(CAST(floor(h * 1e12 + 0.5) AS DECIMAL(38,0)))").as("sc"))
        .transform(graft.core.EngineCache.persisted)
      a = normalized(araw, "part", "a")
    }
    h.select(lit("customer").as("node_type"), col("cust").as("node_id"),
        dround(col("h"), 9).as("score"))
      .unionByName(a.select(lit("part").as("node_type"),
        col("part").as("node_id"), dround(col("a"), 9).as("score")))
      .orderBy("node_type", "node_id")
  }

  def hitsSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""hs$i AS (
      SELECT e.cust, sum(CAST(floor(a${i - 1}.a * 1e12 + 0.5)
        AS DECIMAL(38,0))) AS sc
      FROM e JOIN a${i - 1} ON e.part = a${i - 1}.part GROUP BY e.cust),
    hm$i AS (SELECT max(sc) AS mx FROM hs$i),
    h$i AS (SELECT cust, $hitsNormSql AS h FROM hs$i CROSS JOIN hm$i),
    as$i AS (
      SELECT e.part, sum(CAST(floor(h$i.h * 1e12 + 0.5)
        AS DECIMAL(38,0))) AS sc
      FROM e JOIN h$i ON e.cust = h$i.cust GROUP BY e.part),
    am$i AS (SELECT max(sc) AS mx FROM as$i),
    a$i AS (SELECT part, $hitsNormSql AS a FROM as$i CROSS JOIN am$i)"""
    }.mkString(",\n    ")
    s"""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    a0 AS (SELECT DISTINCT part, 1.0 AS a FROM e),
    $rounds
    SELECT 'customer' AS node_type, cust AS node_id,
      ${droundSql("h", 9)} AS score FROM h$iters
    UNION ALL
    SELECT 'part' AS node_type, part AS node_id,
      ${droundSql("a", 9)} AS score FROM a$iters
    ORDER BY node_type, node_id"""
  }

  // ---------------------------------------------------------------- q105
  /** Product-quantization encode — the IVF-PQ building block: split the
    * 64-dim embedding into [[PqM]] × [[PqSub]]-dim subspaces; per
    * subspace, assign each vector to its nearest of [[PqK]] centroids
    * (codebook = deterministic-seed k-means, [[PqRounds]] Lloyd
    * iterations per subspace — the production IVF-PQ shape). Output is one
    * (vec_id, m, code) row per subspace — 64 floats compress to PqM
    * codes, the 16×-compression memory story that makes billion-vector
    * ANN fit a cluster. The codebook is O(K·dim) and broadcasts; the
    * corpus is scanned once and never shuffled (argmin is a bounded
    * window over PqK rows per vector×subspace). L2² distances are
    * half-up-bridged to a 1e-6 grid before the argmin; ties break by
    * centroid id (q38/q39 precedent for cross-engine fold equality). */
  /** Shared PQ pipeline through per-(vector, subspace, centroid)
    * distances `d` and the argmin ranking `r` — q105 (encode), q107
    * (ADC search) and q119 (IVF-PQ) all build on this. Spark dialect.
    *
    * The codebook is a REAL per-subspace k-means: seeds are the PqK
    * smallest vec_ids' subvectors (deterministic init), then
    * [[PqRounds]] Lloyd iterations (assign by d6-bridged L2², ties by
    * cid; update = per-dim decimal-bridged mean, q84's proven
    * cross-engine fold) refine them. A centroid that loses all members
    * simply drops out of the next round — same set in both engines.
    * The codebook CTEs are O(PqK·PqM·PqSub) and broadcast; the corpus
    * is scanned once per assign round (at 100 TB the codebook build
    * runs on a SAMPLE — the fixture corpus is already sample-sized). */
  val PqRounds = 2 // Lloyd iterations refining the seed codebook

  /** Per-dim mean with the decimal bridge (Determinism.davg's SQL twin,
    * Spark spelling): exact decimal sum → double → half-up 1e-8 grid. */
  private def davgSparkSql(x: String): String =
    s"floor((CAST(sum(CAST(CAST(($x) AS DOUBLE) AS DECIMAL(30,8))) AS DOUBLE)" +
      s" / count($x)) * 1e8 + 0.5) / 1e8"

  /** `ms` + `sub` CTE bodies shared by the codebook rounds and the final
    * encode: one subvector row per (vector, subspace). The geometry is
    * parameterized — (PqM, PqSub, PqK) is the default audit-sized
    * codebook; q193's retrieval stage passes its finer production
    * geometry through the same machinery. */
  private def pqSubSqlP(m: Int, sub: Int): String =
    s"""ms AS (SELECT explode(sequence(0, ${m - 1})) AS m),
    sub AS (
      SELECT vec_id, m, slice(embedding, m * $sub + 1, $sub) AS v
      FROM embeddings CROSS JOIN ms)"""
  private def pqSubSql: String = pqSubSqlP(PqM, PqSub)

  /** The Lloyd codebook, built ROUND BY ROUND with a driver-side
    * materialization barrier between iterations.
    *
    * The naive spelling — one WITH chain `c0 → a1 → c1 → a2 → c2` handed
    * to Spark whole — is quadratic-to-exponential in plan size: Spark
    * INLINES multiply-referenced CTEs, and every round references both
    * `sub` and the entire previous round's subtree twice (assign join +
    * update join), so each added iteration re-expands everything before
    * it. At 2 rounds that plan ran ~40× slower than the seed-only
    * codebook (27 s for a 2 000 × 64-float fixture). The codebook itself
    * is PqK×PqM rows, so the scalable shape is: run ONE flat
    * assign+update query per round against the previous round's
    * materialized (collected, re-registered) codebook — each round is a
    * bounded scan of `sub`, plan depth constant in `rounds`. Arithmetic
    * is byte-identical to the inline spelling (same SQL expressions,
    * decimal-bridged means, d6 grid, cid tiebreaks), so the oracle's
    * inline CTE chain still folds to the same codebook. At 100 TB the
    * build runs on a sample; the collect is K·M centroid rows, never
    * corpus-sized. */
  /** Codebook rows memoized by (fixture dir, rounds): q105/q107/q119 all
    * need the IDENTICAL codebook over the same embeddings table, and the
    * build is a multi-job driver loop — recomputing it per query tripled
    * the PQ family's cost. The fixture dirs are immutable (read-only
    * testdata / unique temp dirs), so the key is sound. K·M rows per
    * entry — memory-trivial. */
  private val pqCbCache =
    scala.collection.concurrent.TrieMap
      .empty[(String, Int, Int, Int, Int), Array[org.apache.spark.sql.Row]]

  private def pqCodebook(spark: SparkSession, dir: String, rounds: Int,
                         m: Int = PqM, sub: Int = PqSub,
                         k: Int = PqK): DataFrame = {
    import org.apache.spark.sql.types._
    val cbSchema = StructType(Seq(
      StructField("cid", IntegerType), StructField("m", IntegerType),
      StructField("c", ArrayType(FloatType))))
    // Double-checked under the class monitor: Verify launches q105/q107/
    // q119 on concurrent workers, and an unguarded first call would
    // stampede three identical multi-job builds through the session at
    // once (observed starving a neighboring query past its watchdog).
    // The build is driver-coordinated and quick; serializing first-build
    // is cheaper than duplicating it.
    def cached = pqCbCache.get((dir, rounds, m, sub, k))
    val rows = cached.getOrElse(synchronized {
      cached.getOrElse(pqCodebookBuild(spark, rounds, m, sub, k))
    })
    pqCbCache.put((dir, rounds, m, sub, k), rows)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), cbSchema)
  }

  private def pqCodebookBuild(spark: SparkSession, rounds: Int,
                              m: Int, sub: Int,
                              k: Int): Array[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.types._
    val cbSchema = StructType(Seq(
      StructField("cid", IntegerType), StructField("m", IntegerType),
      StructField("c", ArrayType(FloatType))))
    // Temp views are session-global and Verify runs queries on concurrent
    // worker threads; a shared view name would let one query's round-1
    // cents stomp another's mid-iteration. Thread-scoped names make each
    // worker's build race-free without any locking.
    val centsView = s"graft_pq_cents_t${Thread.currentThread().getId}"
    var cents = spark.sql(
      s"""WITH seeds AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid,
               embedding
        FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $k)),
      ms AS (SELECT explode(sequence(0, ${m - 1})) AS m)
      SELECT cid, m, slice(embedding, m * $sub + 1, $sub) AS c
      FROM seeds CROSS JOIN ms""").collect()
    for (_ <- 1 to rounds) {
      spark.createDataFrame(
        spark.sparkContext.parallelize(cents.toIndexedSeq, 1), cbSchema)
        .createOrReplaceTempView(centsView)
      cents = spark.sql(
        s"""WITH ${pqSubSqlP(m, sub)},
        a_d AS (
          SELECT s.vec_id, s.m, c.cid,
            CAST(floor(l2_sq(s.v, c.c) * 1e6 + 0.5) AS BIGINT) AS d6
          FROM sub s JOIN $centsView c ON s.m = c.m),
        a AS (
          SELECT vec_id, m, cid FROM (
            SELECT vec_id, m, cid,
              row_number() OVER (PARTITION BY vec_id, m ORDER BY d6, cid) AS rn
            FROM a_d) WHERE rn = 1),
        e AS (
          SELECT a.m, a.cid, posexplode(s.v) AS (dim, x)
          FROM a JOIN sub s ON a.vec_id = s.vec_id AND a.m = s.m),
        e_d AS (
          SELECT m, cid, dim, ${davgSparkSql("x")} AS c
          FROM e GROUP BY m, cid, dim)
        SELECT cid, m,
          transform(array_sort(collect_list(struct(dim, c))),
            s -> CAST(s.c AS FLOAT)) AS c
        FROM e_d GROUP BY cid, m""").collect()
    }
    cents
  }

  /** Register the materialized `rounds`-iteration codebook as `csub` and
    * return the flat base CTEs (`sub` → `d` → `r`) every PQ query tails
    * onto. Plan depth no longer depends on `rounds`. */
  private def pqFlatBase(spark: SparkSession, dir: String,
                         rounds: Int = PqRounds, m: Int = PqM,
                         sub: Int = PqSub, k: Int = PqK): String = {
    val cbView =
      s"graft_pq_codebook_${m}_${k}_t${Thread.currentThread().getId}"
    pqCodebook(spark, dir, rounds, m, sub, k).createOrReplaceTempView(cbView)
    s"""${pqSubSqlP(m, sub)},
    csub AS (SELECT cid, m, c FROM $cbView),
    d AS (
      SELECT s.vec_id, s.m, c.cid,
        CAST(floor(l2_sq(s.v, c.c) * 1e6 + 0.5) AS BIGINT) AS d6
      FROM sub s JOIN csub c ON s.m = c.m),
    r AS (
      SELECT vec_id, m, cid, d6,
        row_number() OVER (PARTITION BY vec_id, m ORDER BY d6, cid) AS rn
      FROM d)"""
  }

  /** [[pqFlatBase]] with the corpus scan RESTRICTED by `where` — the
    * incremental-index building block: encoding a new batch (or just
    * the probe set) touches only qualifying rows, with the filter
    * pushed into the embedding scan. The codebook stays the memoized
    * frozen one — exactly the production contract, where the codebook
    * is trained once and an arriving batch must never shift it. */
  private def pqFlatBaseWhere(spark: SparkSession, dir: String,
                              where: String,
                              rounds: Int = PqRounds, m: Int = PqM,
                              sub: Int = PqSub, k: Int = PqK): String =
    pqFlatBaseOver(spark, dir, "embeddings", where, rounds, m, sub, k)

  /** The PQ base over an arbitrary `(vec_id, embedding)` source view —
    * the further generalization streaming ingest needs: a micro-batch
    * frame is not a predicate over the corpus table, it is its own
    * (tiny) relation, and only IT gets scanned. */
  private def pqFlatBaseOver(spark: SparkSession, dir: String,
                             srcView: String, where: String,
                             rounds: Int = PqRounds, m: Int = PqM,
                             sub: Int = PqSub, k: Int = PqK): String = {
    val cbView =
      s"graft_pq_codebook_${m}_${k}_t${Thread.currentThread().getId}"
    pqCodebook(spark, dir, rounds, m, sub, k).createOrReplaceTempView(cbView)
    s"""ms AS (SELECT explode(sequence(0, ${m - 1})) AS m),
    sub AS (
      SELECT vec_id, m, slice(embedding, m * $sub + 1, $sub) AS v
      FROM $srcView CROSS JOIN ms WHERE $where),
    csub AS (SELECT cid, m, c FROM $cbView),
    d AS (
      SELECT s.vec_id, s.m, c.cid,
        CAST(floor(l2_sq(s.v, c.c) * 1e6 + 0.5) AS BIGINT) AS d6
      FROM sub s JOIN csub c ON s.m = c.m),
    r AS (
      SELECT vec_id, m, cid, d6,
        row_number() OVER (PARTITION BY vec_id, m ORDER BY d6, cid) AS rn
      FROM d)"""
  }

  private def pqSparkSql(spark: SparkSession, dir: String): String = s"""
    WITH ${pqFlatBase(spark, dir)}
    SELECT vec_id, m, cid AS code, CAST(d6 AS DOUBLE) / 1e6 AS dist
    FROM r WHERE rn = 1
    ORDER BY vec_id, m"""

  /** DuckDB dialect of the PQ base (inline CTE spelling) (unnest/list-slice forms), same
    * seed + [[PqRounds]]-iteration Lloyd codebook, fold-for-fold. */
  private def pqBaseOracle: String =
    pqBaseOracleP(PqM, PqSub, PqK, PqRounds)

  private def pqBaseOracleP(m: Int, sub: Int, k: Int,
                            rounds: Int): String = {
    def l2d6(v: String, c: String) =
      s"""CAST(floor(list_sum(list_transform(range(1, ${sub + 1}),
          i -> (($v)[i]::DOUBLE - ($c)[i]::DOUBLE) *
               (($v)[i]::DOUBLE - ($c)[i]::DOUBLE))) * 1e6 + 0.5)
          AS BIGINT)"""
    def assign(cents: String, name: String) = s""",
    ${name}_d AS (
      SELECT s.vec_id, s.m, c.cid, ${l2d6("s.v", "c.c")} AS d6
      FROM sub s JOIN $cents c ON s.m = c.m),
    $name AS (
      SELECT vec_id, m, cid FROM (
        SELECT vec_id, m, cid,
          row_number() OVER (PARTITION BY vec_id, m ORDER BY d6, cid) AS rn
        FROM ${name}_d) WHERE rn = 1)"""
    def update(assigned: String, name: String) = s""",
    ${name}_e AS (
      SELECT a.m, a.cid, (unnest(range(1, len(s.v) + 1)) - 1)::INT AS dim,
        unnest(s.v) AS x
      FROM $assigned a JOIN sub s ON a.vec_id = s.vec_id AND a.m = s.m),
    ${name}_d AS (
      SELECT m, cid, dim, ${graft.core.Determinism.avgSql("x::DOUBLE", 8)} AS c
      FROM ${name}_e GROUP BY m, cid, dim),
    $name AS (
      SELECT cid, m, list_transform(list(c ORDER BY dim), y -> y::FLOAT) AS c
      FROM ${name}_d GROUP BY cid, m)"""
    val lloyd = (1 to rounds)
      .map(i => assign(s"c${i - 1}", s"a$i") + update(s"a$i", s"c$i"))
      .mkString
    s"""ms AS (SELECT unnest(range(0, $m)) AS m),
    seeds AS (
      SELECT (row_number() OVER (ORDER BY vec_id))::INT - 1 AS cid, embedding
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $k)),
    sub AS (
      SELECT vec_id, m, embedding[m * $sub + 1 : m * $sub + $sub] AS v
      FROM embeddings CROSS JOIN ms),
    c0 AS (
      SELECT cid, m, embedding[m * $sub + 1 : m * $sub + $sub] AS c
      FROM seeds CROSS JOIN ms)$lloyd,
    csub AS (SELECT cid, m, c FROM c$rounds),
    d AS (
      SELECT s.vec_id, s.m, c.cid, ${l2d6("s.v", "c.c")} AS d6
      FROM sub s JOIN csub c ON s.m = c.m),
    r AS (
      SELECT vec_id, m, cid, d6,
        row_number() OVER (PARTITION BY vec_id, m ORDER BY d6, cid) AS rn
      FROM d)"""
  }

  private def pqOracleSql: String = s"""
    WITH $pqBaseOracle
    SELECT vec_id, m::INT AS m, cid AS code, d6::DOUBLE / 1e6 AS dist
    FROM r WHERE rn = 1
    ORDER BY vec_id, m"""

  def pqEncode(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    spark.sql(pqSparkSql(spark, dir))
  }

  /** Mean quantization error (avg d6 of the winning assignment, in L2²
    * units) under a codebook refined by `rounds` Lloyd iterations;
    * rounds = 0 is the raw seed codebook. Spec hook proving the k-means
    * refinement actually lowers distortion. */
  def pqMeanError(spark: SparkSession, dir: String, rounds: Int): Double = {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    spark.sql(s"WITH ${pqFlatBase(spark, dir, rounds)} " +
      "SELECT avg(CAST(d6 AS DOUBLE)) / 1e6 AS e FROM r WHERE rn = 1")
      .head().getDouble(0)
  }

  // ---------------------------------------------------------------- q106
  /** Last-touch revenue attribution: each purchase's value is credited
    * to the user's most recent PRIOR non-purchase event type. The
    * carried "touch" is a lexicographically-ordered `lpad(epoch_ms)`
    * string max over a ROWS frame ending 1 PRECEDING — one window pass
    * per user partition, no self-join, and the string max is engine-
    * independent where a struct max would not be. Revenue sums as exact
    * integer cents (value bridged per-row before the order-
    * nondeterministic aggregation). The epoch is offset by the
    * year-0001 constant before lpad: a negative (pre-1970) epoch would
    * render with a '-' prefix and sort lexicographically WRONG — the
    * offset keeps every representable timestamp nonnegative so the
    * zero-padded string order equals the numeric order. */
  private def attributionSql(epochMs: String): String = s"""
    WITH t AS (
      SELECT event_id, user_id, ts, event_type, value,
        max(CASE WHEN event_type <> 'purchase'
              THEN lpad(CAST(($epochMs) + 62135596800000 AS STRING), 20, '0')
                || ':' || event_type
            END)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      FROM events)
    SELECT substr(touch, 22) AS touch_type,
      count(1) AS n_purchases,
      CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        AS revenue_cents
    FROM t
    WHERE event_type = 'purchase' AND touch IS NOT NULL
    GROUP BY substr(touch, 22)
    ORDER BY touch_type"""

  def attribution(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(attributionSql("unix_millis(ts)"))
  }

  // ---------------------------------------------------------------- q107
  /** PQ ADC (asymmetric distance computation) top-k search — the query
    * side of IVF-PQ: probes keep their exact subvectors; the corpus is
    * represented ONLY by its PqM codes. Per probe, a PqM×PqK distance
    * table is computed once (it is `d` restricted to probe rows — tiny,
    * broadcastable); each corpus vector's approximate distance is then
    * PqM integer table lookups summed — no float math per corpus row at
    * all, which is exactly why ADC scans billions of codes fast. The
    * tail (codes ⋈ dtab → sum → rank) is dialect-neutral; only the PQ
    * base differs per engine. Integer d6 partials make the sum
    * order-independent; ties rank by vec_id. */
  private def pqAdcCtes: String = s""",
    codes AS (SELECT vec_id, m, cid AS code FROM r WHERE rn = 1),
    dtab AS (
      SELECT vec_id AS probe_id, m, cid, d6
      FROM d WHERE vec_id % $PqProbeMod = 0),
    adc AS (
      SELECT t.probe_id, c.vec_id, CAST(sum(t.d6) AS BIGINT) AS ad6
      FROM codes c JOIN dtab t ON c.m = t.m AND c.code = t.cid
      GROUP BY t.probe_id, c.vec_id),
    ranked AS (
      SELECT probe_id, vec_id, ad6,
        CAST(row_number() OVER (PARTITION BY probe_id
          ORDER BY ad6, vec_id) AS INT) AS rk
      FROM adc)"""

  private def pqAdcTail: String = s"""$pqAdcCtes
    SELECT probe_id, rk, vec_id, CAST(ad6 AS DOUBLE) / 1e6 AS adist
    FROM ranked WHERE rk <= $PqTopK
    ORDER BY probe_id, rk"""

  def pqAdcSearch(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    spark.sql(s"WITH ${pqFlatBase(spark, dir)} $pqAdcTail")
  }

  // ---------------------------------------------------------------- q169
  /** ANN recall audit — q159's blocking-audit discipline applied to the
    * similarity leg: each approximate path is scored for recall@k
    * against ITS OWN exact metric on the same probes, so the number
    * isolates exactly what the approximation loses.
    *
    *  - `ivf_cell` (q40's blocking): cell-restricted cosine top-k vs
    *    unblocked brute-force cosine — measures the INVERTED-FILE loss
    *    (neighbors living in other cells), plus the scanned fraction
    *    ((cell−1)/(N−1) per probe) that blocking buys.
    *  - `pq_adc` (q107's compression): ADC ranking over PQ codes vs
    *    exact squared-L2 ranking (probe included, q107's convention) —
    *    measures the QUANTIZATION loss alone; scanned_frac is 1.0 (ADC
    *    reads every code, just 8 bytes instead of 256).
    *
    * recall@k = |approx ∩ exact| / (n_probes·k) on exact integers; the
    * exact-L2 d6 grid is q107's own bridge, so rank ties cannot split
    * across engines. This is the measurement that picks cell counts /
    * code budgets before anyone trusts an ANN index at 10⁹ vectors —
    * and on this fixture it does its job: class labels are a lousy
    * geometric cell (recall@3 ≈ 0.08 for ~10% of the scan), the
    * `ivf_kmeans` leg PROVES the fix — q84's learned Lloyd cells lift
    * recall to ≈ 0.40 at a comparable ≈ 0.13 scan fraction — the
    * `ivf_multiprobe` leg prices the production knob on top (nprobe=2:
    * recall ≈ 0.57 at ≈ 2× the scan, q179) — and the
    * deliberately tiny 4×8 code budget keeps only ≈ 0.26 of the exact
    * top-10 (PqK is sized for oracle replayability, not fidelity; the
    * audit is what would justify 256 centroids in production). */
  def annRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.llm.Similarity
    graft.functions.GraftFunctions.register(spark)
    val vecs = Tables.load(spark, dir, "embeddings")
    val k1 = LlmQueries.IvfK
    val tid = Thread.currentThread().getId
    vecs.createOrReplaceTempView(s"graft_ara_vecs_t$tid")
    Similarity.bruteForceTopK(vecs, col("vec_id") < 50, k1)
      .select(col("query_id"), col("cand_id"))
      .createOrReplaceTempView(s"graft_ara_t1_t$tid")
    Similarity.ivfTopK(vecs, "label", col("vec_id") < 50, k1)
      .select(col("query_id"), col("cand_id"))
      .createOrReplaceTempView(s"graft_ara_i1_t$tid")
    // learned-cell leg: q84's Lloyd assignments as the inverted file
    val vk = vecs.select(col("vec_id"), col("embedding"))
      .join(Similarity.kmeansLloyd(vecs, LlmQueries.KmK, LlmQueries.KmRounds)
        .select(col("vec_id"), col("cell")), "vec_id")
      .transform(graft.core.EngineCache.persisted)
    vk.createOrReplaceTempView(s"graft_ara_vk_t$tid")
    Similarity.ivfTopK(vk, "cell", col("vec_id") < 50, k1)
      .select(col("query_id"), col("cand_id"))
      .createOrReplaceTempView(s"graft_ara_i3_t$tid")
    // nprobe>1 leg: q179's probed cells + results, same probes and k
    val (_, pcells, mpResults) = LlmQueries.annMultiprobeParts(spark, dir)
    pcells.createOrReplaceTempView(s"graft_ara_pc_t$tid")
    mpResults.select(col("query_id"), col("cand_id"))
      .createOrReplaceTempView(s"graft_ara_i4_t$tid")
    // exact-L2 truth for the ADC probes (self included, as ADC ranks it)
    val probes2 = vecs.filter(col("vec_id") % PqProbeMod === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("qv"))
    val corpus2 = vecs
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    broadcast(probes2).join(corpus2)
      .withColumn("d6",
        expr("CAST(floor(l2_sq(qv, cv) * 1e6 + 0.5) AS BIGINT)"))
      .groupBy(col("probe_id"))
      .agg(graft.functions.VectorAggregates
        .topKOf(PqTopK, -col("d6").cast("double"), col("cand_id")).as("top"))
      .select(col("probe_id").as("query_id"),
        explode(col("top.cand_id")).as("cand_id"))
      .createOrReplaceTempView(s"graft_ara_t2_t$tid")
    pqAdcSearch(spark, dir)
      .select(col("probe_id").as("query_id"), col("vec_id").as("cand_id"))
      .createOrReplaceTempView(s"graft_ara_i2_t$tid")
    // two-stage leg: q193's retrieve-then-rerank results vs the same
    // brute-force truth — the row that shows the rerank composition
    // closing the quantization gap at a reported exact-scan fraction
    annRerank(spark, dir)
      .select(col("query_id"), col("cand_id"))
      .createOrReplaceTempView(s"graft_ara_i5_t$tid")
    spark.sql(annRecallAssembleSql(
      s"graft_ara_vecs_t$tid", s"graft_ara_t1_t$tid", s"graft_ara_i1_t$tid",
      s"graft_ara_t2_t$tid", s"graft_ara_i2_t$tid",
      s"graft_ara_vk_t$tid", s"graft_ara_i3_t$tid",
      s"graft_ara_pc_t$tid", s"graft_ara_i4_t$tid",
      s"graft_ara_i5_t$tid", k1))
  }

  /** The dialect-neutral audit assembly over seven relations;
    * `extraCtes` lets the oracle prepend the relation definitions. */
  private def annRecallAssembleSql(vecs: String, t1: String, i1: String,
                                   t2: String, i2: String,
                                   vk: String, i3: String,
                                   pc: String, i4: String,
                                   i5: String, k1: Int,
                                   extraCtes: String = ""): String = {
    def hits(t: String, i: String, name: String) = s"""
      $name AS (
        SELECT CAST(count(1) AS BIGINT) AS h
        FROM $t t JOIN $i i
          ON t.query_id = i.query_id AND t.cand_id = i.cand_id)"""
    def ivfRow(label: String, h: String, sc: String) = s"""
        SELECT '$label' AS method, n1.n AS n_probes, $k1 AS k,
          ${droundSql(
            s"CAST($h.h AS DOUBLE) / (CAST(n1.n AS DOUBLE) * $k1)", 6)}
            AS recall_at_k,
          ${droundSql(
            s"CAST($sc.s AS DOUBLE) / (CAST(n1.n AS DOUBLE) * " +
              "CAST(nv.nn - 1 AS DOUBLE))", 6)} AS scanned_frac
        FROM $h CROSS JOIN n1 CROSS JOIN $sc CROSS JOIN nv"""
    s"""
      WITH $extraCtes ${hits(t1, i1, "h1")},
      n1 AS (SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n FROM $t1),
      cs AS (SELECT label, count(1) AS csz FROM $vecs GROUP BY label),
      sc1 AS (
        SELECT CAST(sum(csz - 1) AS BIGINT) AS s
        FROM (SELECT label FROM $vecs WHERE vec_id < 50) p
        JOIN cs ON p.label = cs.label),
      csk AS (SELECT cell, count(1) AS csz FROM $vk GROUP BY cell),
      sc3 AS (
        SELECT CAST(sum(csz - 1) AS BIGINT) AS s
        FROM (SELECT cell FROM $vk WHERE vec_id < 50) p
        JOIN csk ON p.cell = csk.cell),
      nv AS (SELECT CAST(count(1) AS BIGINT) AS nn FROM $vecs),
      ${hits(t2, i2, "h2").trim},
      n2 AS (SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n FROM $t2),
      ${hits(t1, i3, "h3").trim},
      ${hits(t1, i4, "h4").trim},
      ${hits(t1, i5, "h5").trim},
      csk4 AS (SELECT cell, count(1) AS csz FROM $vk GROUP BY cell),
      sc4 AS (
        SELECT CAST(sum(k.csz) -
          sum(CASE WHEN o.cell IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS s
        FROM $pc p
        JOIN csk4 k ON p.cell = k.cell
        LEFT JOIN (SELECT vec_id, cell FROM $vk) o
          ON o.vec_id = p.query_id AND o.cell = p.cell)
      SELECT method, n_probes, k, recall_at_k, scanned_frac FROM (
        ${ivfRow("ivf_cell", "h1", "sc1")}
        UNION ALL
        ${ivfRow("ivf_kmeans", "h3", "sc3")}
        UNION ALL
        ${ivfRow("ivf_multiprobe", "h4", "sc4")}
        UNION ALL
        SELECT 'pq_adc' AS method, n2.n AS n_probes, $PqTopK AS k,
          ${droundSql(
            s"CAST(h2.h AS DOUBLE) / (CAST(n2.n AS DOUBLE) * $PqTopK)", 6)}
            AS recall_at_k,
          CAST(1.0 AS DOUBLE) AS scanned_frac
        FROM h2 CROSS JOIN n2
        UNION ALL
        -- scanned_frac here prices the FULL-PRECISION rows the rerank
        -- touches (the pool / corpus); the compressed-domain retrieve
        -- reads every 8-byte code, which the pq_adc row already prices
        SELECT 'rerank' AS method, n1.n AS n_probes, $k1 AS k,
          ${droundSql(
            s"CAST(h5.h AS DOUBLE) / (CAST(n1.n AS DOUBLE) * $k1)", 6)}
            AS recall_at_k,
          ${droundSql(
            s"CAST($RerankPool AS DOUBLE) / CAST(nv.nn - 1 AS DOUBLE)", 6)}
            AS scanned_frac
        FROM h5 CROSS JOIN n1 CROSS JOIN nv) u
      ORDER BY method"""
  }

  def annRecallAuditOracleSql: String = {
    import graft.llm.Similarity
    val k1 = LlmQueries.IvfK
    val l2full =
      """CAST(floor(list_sum(list_transform(range(1, len(qv) + 1),
         i -> (qv[i]::DOUBLE - cv[i]::DOUBLE) *
              (qv[i]::DOUBLE - cv[i]::DOUBLE))) * 1e6 + 0.5) AS BIGINT)"""
    val rel = s"""
      ara_vecs AS (SELECT vec_id, embedding, label FROM embeddings),
      ara_t1 AS (SELECT query_id, cand_id FROM
        (${Similarity.bruteForceTopKSql("embeddings", "vec_id < 50", k1)}) q),
      ara_i1 AS (SELECT query_id, cand_id FROM
        (${Similarity.ivfTopKSql("embeddings", "label", "vec_id < 50", k1)}) q),
      ara_p2 AS (
        SELECT vec_id AS probe_id, embedding AS qv FROM embeddings
        WHERE vec_id % $PqProbeMod = 0),
      ara_s2 AS (
        SELECT probe_id, e.vec_id AS cand_id, $l2full AS d6
        FROM ara_p2 CROSS JOIN
          (SELECT vec_id, embedding AS cv FROM embeddings) e),
      ara_t2 AS (
        SELECT probe_id AS query_id, cand_id FROM (
          SELECT probe_id, cand_id,
            row_number() OVER (PARTITION BY probe_id
              ORDER BY d6, cand_id) AS rk
          FROM ara_s2) r WHERE rk <= $PqTopK),
      ara_i2 AS (
        SELECT probe_id AS query_id, vec_id AS cand_id FROM
          (WITH $pqBaseOracle $pqAdcCtes
           SELECT probe_id, vec_id FROM ranked WHERE rk <= $PqTopK) q),
      ara_km AS (SELECT vec_id, cell FROM
        (${Similarity.kmeansLloydSql("embeddings", LlmQueries.KmK,
          LlmQueries.KmRounds)}) q),
      ara_vk AS (
        SELECT e.vec_id, e.embedding, k.cell
        FROM embeddings e JOIN ara_km k ON e.vec_id = k.vec_id),
      ara_i3 AS (SELECT query_id, cand_id FROM
        (${Similarity.ivfTopKSql("ara_vk", "cell", "vec_id < 50", k1)}) q),
      ara_pc AS (SELECT query_id, cell FROM
        (WITH ${LlmQueries.annMultiprobeCtes}
         SELECT query_id, cell FROM pc) q),
      ara_i4 AS (SELECT query_id, cand_id FROM
        (${LlmQueries.annMultiprobeSql}) q),
      ara_i5 AS (SELECT query_id, cand_id FROM
        ($annRerankOracleSql) q)"""
    annRecallAssembleSql(
      "ara_vecs", "ara_t1", "ara_i1", "ara_t2", "ara_i2",
      "ara_vk", "ara_i3", "ara_pc", "ara_i4", "ara_i5", k1, s"$rel,")
  }

  // ---------------------------------------------------------------- q170
  /** Dominant principal component of the embedding corpus by POWER
    * ITERATION — the spectral readout behind embedding-drift and
    * anisotropy monitoring (a collapsing embedding model concentrates
    * variance in one direction; `explained_frac` is that alarm):
    * center (exact-decimal per-dim means), then [[PcaRounds]] rounds of
    * v ← normalize(X'ᵀ(X'v)), Rayleigh quotient at the end. Engineered
    * like q163's GD for bit-identical cross-engine replay: the corpus
    * lives as an exploded (vec_id, dim, x) frame so every step is a
    * join + hash agg (no lambdas, ONE dialect for both engines); every
    * corpus-sized sum bridges per-term to a decimal grid (1e12 for the
    * per-vector projections, 1e9 for the per-dim gradient), so Spark's
    * partition-merge order cannot flake a bit. Per round: two hash
    * aggs over the persisted exploded frame with a broadcast 64-row v —
    * at 10⁹ vectors that is the distributed matvec, no dense matrix
    * anywhere. Output: per dim, the centered mean, the unit loading,
    * and the (repeated) component variance + explained fraction. */
  val PcaRounds = 3
  private def pcaBridge(e: String, grid: String): String =
    s"CAST(sum(CAST(floor(($e) * $grid + 0.5) AS DECIMAL(38,0))) AS DOUBLE)" +
      s" / $grid"

  /** Portable mean + centering CTEs over an exploded `xd(vec_id, dim,
    * x)`; the oracle inlines them, the Spark side materializes the same
    * strings as PERSISTED views (every iteration scans `xc` — persist
    * once, not once per stage). */
  private def pcaMuSql(xd: String): String = s"""
      SELECT dim,
        floor((CAST(sum(CAST(x AS DECIMAL(30,8))) AS DOUBLE) / count(x))
          * 1e8 + 0.5) / 1e8 AS mu
      FROM $xd GROUP BY dim"""
  private def pcaXcSql(xd: String, mu: String): String = s"""
      SELECT $xd.vec_id, $xd.dim, $xd.x - $mu.mu AS xc
      FROM $xd JOIN $mu ON $xd.dim = $mu.dim"""

  /** The PCA chain body; expects `xc(vec_id, dim, xc)` and `mu(dim,
    * mu)` relations in scope (engine-common given that). `prefixCtes`
    * lets the oracle inline xd/mu/xc; Spark passes "" and registers
    * views instead. */
  /** One power-iteration round's CTEs over centered relation `xcRel`;
    * `sfx` namespaces the CTE chain so two chains (q181's deflation)
    * can share a WITH. */
  private def pcaIterSql(xcRel: String, sfx: String, mat: String = "")
                        (t: Int): String = {
    val vp = s"v_$sfx${t - 1}"
    s"""
      s_$sfx$t AS $mat(
        SELECT c.vec_id, ${pcaBridge("c.xc * v.v", "1e12")} AS s
        FROM $xcRel c JOIN $vp v ON c.dim = v.dim
        GROUP BY c.vec_id),
      g_$sfx$t AS $mat(
        SELECT c.dim, ${pcaBridge("s.s * c.xc", "1e9")} AS g
        FROM $xcRel c JOIN s_$sfx$t s ON c.vec_id = s.vec_id
        GROUP BY c.dim),
      nrm_$sfx$t AS $mat(
        SELECT sqrt(${pcaBridge("g * g", "1e12")}) AS nrm FROM g_$sfx$t),
      v_$sfx$t AS $mat(
        SELECT dim, g / nrm AS v FROM g_$sfx$t CROSS JOIN nrm_$sfx$t)"""
  }

  /** v_{sfx}0 start + the [[PcaRounds]] iteration chain. `mat` is ""
    * (Spark, q170's inline chain) or "MATERIALIZED " (q181's DuckDB
    * oracle: without the hint DuckDB re-inlines each stage per
    * reference and the nested deflation chain re-executes
    * exponentially — observed >240 s at sf0.01 vs 0.5 s for q170). */
  private def pcaRoundsSql(xcRel: String, muR: String, sfx: String,
                           mat: String = ""): String = s"""
      v_$sfx${0} AS $mat(
        SELECT dim, 1.0 / sqrt(nd) AS v FROM $muR CROSS JOIN dims),
      ${(1 to PcaRounds).map(pcaIterSql(xcRel, sfx, mat)).mkString(",")}"""

  private def pcaChainSql(prefix: String, xcR: String, muR: String): String = {
    s"""
      WITH ${if (prefix.nonEmpty) s"$prefix," else ""}
      nn AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n FROM $xcR),
      dims AS (SELECT CAST(count(1) AS DOUBLE) AS nd FROM $muR),
      ${pcaRoundsSql(xcR, muR, "").trim},
      lam AS (
        SELECT ${pcaBridge("v.v * g.g", "1e9")} AS lam_raw
        FROM v_$PcaRounds v JOIN g_$PcaRounds g ON v.dim = g.dim),
      tv AS (
        SELECT ${pcaBridge("xc * xc", "1e9")} AS tvn FROM $xcR)
      SELECT v.dim, m.mu,
        ${droundSql("v.v", 6)} AS loading,
        ${droundSql("lam.lam_raw / CAST(nn.n AS DOUBLE)", 6)} AS pc_var,
        ${droundSql(
          "(lam.lam_raw / CAST(nn.n AS DOUBLE)) / (tv.tvn / CAST(nn.n AS DOUBLE))",
          6)} AS explained_frac
      FROM v_$PcaRounds v JOIN $muR m ON v.dim = m.dim
      CROSS JOIN lam CROSS JOIN tv CROSS JOIN nn
      ORDER BY v.dim"""
  }

  def embPca(spark: SparkSession, dir: String): DataFrame =
    embPcaOf(Tables.load(spark, dir, "embeddings"))

  /** [[embPca]] over an arbitrary (vec_id, embedding) frame — the spec
    * entry point (a planted dominant direction must be recovered).
    * Runs the power iteration through [[pcaChainRun]]'s driver-barrier
    * rounds (q181's shape): Spark inlines multiply-referenced CTEs, so
    * the single-WITH spelling re-executed each stage per reference —
    * measured 9 s at sf0.1 vs ~3 s barriered, same bits (the oracle
    * keeps the WITH; DuckDB materializes it fine at this depth). */
  def embPcaOf(vecs: DataFrame): DataFrame = {
    val (spark, xcV, muV) = pcaViews(vecs, "pca")
    val (v, g) = pcaChainRun(spark, xcV, muV, "pca", "a")
    spark.sql(s"""
      SELECT v.dim, m.mu,
        ${droundSql("v.v", 6)} AS loading,
        ${droundSql("lam.lam_raw / CAST(nn.n AS DOUBLE)", 6)} AS pc_var,
        ${droundSql(
          "(lam.lam_raw / CAST(nn.n AS DOUBLE)) / (tv.tvn / CAST(nn.n AS DOUBLE))",
          6)} AS explained_frac
      FROM $v v JOIN $muV m ON v.dim = m.dim
      CROSS JOIN (SELECT ${pcaBridge("v.v * g.g", "1e9")} AS lam_raw
                  FROM $v v JOIN $g g ON v.dim = g.dim) lam
      CROSS JOIN (SELECT ${pcaBridge("xc * xc", "1e9")} AS tvn FROM $xcV) tv
      CROSS JOIN (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n
                  FROM $xcV) nn
      ORDER BY v.dim""")
  }

  /** Register the exploded / mean / CENTERED views for `vecs` (prefix
    * distinguishes q170/q172 so concurrent Verify workers cannot race
    * on view names); `xc` persists — every chain stage scans it, and
    * without the persist Spark re-derives the explode+join per stage
    * (measured 13.9 s → the fix at sf0.1). Returns (session, xc, mu). */
  private def pcaViews(vecs: DataFrame,
                       prefix: String): (SparkSession, String, String) = {
    val spark = vecs.sparkSession
    val tid = Thread.currentThread().getId
    val xd = s"graft_${prefix}_xd_t$tid"
    val mu = s"graft_${prefix}_mu_t$tid"
    val xc = s"graft_${prefix}_xc_t$tid"
    vecs
      .selectExpr("vec_id", "posexplode(embedding) AS (dim, xf)")
      .selectExpr("vec_id", "CAST(dim AS INT) AS dim",
        "CAST(xf AS DOUBLE) AS x")
      .createOrReplaceTempView(xd)
    spark.sql(pcaMuSql(xd))
      .transform(graft.core.EngineCache.persisted)
      .createOrReplaceTempView(mu)
    spark.sql(pcaXcSql(xd, mu))
      .transform(graft.core.EngineCache.persisted)
      .createOrReplaceTempView(xc)
    (spark, xc, mu)
  }

  private def pcaOracleXd: String = s"""xd AS (
        SELECT vec_id, (unnest(range(1, len(embedding) + 1)) - 1)::INT AS dim,
          unnest(embedding)::DOUBLE AS x
        FROM embeddings)"""
  private def pcaOraclePrefix: String =
    s"$pcaOracleXd, mu AS (${pcaMuSql("xd")}), xc AS (${pcaXcSql("xd", "mu")})"
  /** q181's prefix: xc is scanned by every stage of BOTH chains plus
    * tv/nn — materialize it once. */
  private def pcaOraclePrefixMat: String =
    s"$pcaOracleXd, mu AS MATERIALIZED (${pcaMuSql("xd")}), " +
      s"xc AS MATERIALIZED (${pcaXcSql("xd", "mu")})"

  def embPcaOracleSql: String = pcaChainSql(pcaOraclePrefix, "xc", "mu")

  // ---------------------------------------------------------------- q181
  /** Top-2 principal components by DEFLATION — q170's chain run twice:
    * after the first component v₁ converges, each centered vector
    * sheds its projection (xc₂ = xc − s·v₁ — the Hotelling deflation,
    * one join per (vec, dim)) and the same power iteration runs on the
    * residual, yielding the orthogonal second direction. Both
    * components report explained fractions against the ORIGINAL total
    * variance, so the two rows-per-dim output reads as a scree table.
    * Everything rides the namespaced iteration CTEs (suffix a/b in one
    * WITH), same decimal bridges, same persisted centered frame — cost
    * is exactly 2× q170, and k components cost k× (each deflation is
    * one extra join-project over the exploded frame). */
  private def pca2Sql(prefix: String, xcR: String, muR: String): String = s"""
      WITH ${if (prefix.nonEmpty) s"$prefix," else ""}
      nn AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n FROM $xcR),
      dims AS (SELECT CAST(count(1) AS DOUBLE) AS nd FROM $muR),
      ${pcaRoundsSql(xcR, muR, "a", "MATERIALIZED ").trim},
      sfa AS MATERIALIZED (
        SELECT c.vec_id, ${pcaBridge("c.xc * v.v", "1e12")} AS s
        FROM $xcR c JOIN v_a$PcaRounds v ON c.dim = v.dim
        GROUP BY c.vec_id),
      xcb AS MATERIALIZED (
        SELECT c.vec_id, c.dim, c.xc - s.s * v.v AS xc
        FROM $xcR c
        JOIN sfa s ON c.vec_id = s.vec_id
        JOIN v_a$PcaRounds v ON c.dim = v.dim),
      ${pcaRoundsSql("xcb", muR, "b", "MATERIALIZED ").trim},
      lam_a AS (
        SELECT ${pcaBridge("v.v * g.g", "1e9")} AS lam_raw
        FROM v_a$PcaRounds v JOIN g_a$PcaRounds g ON v.dim = g.dim),
      lam_b AS (
        SELECT ${pcaBridge("v.v * g.g", "1e9")} AS lam_raw
        FROM v_b$PcaRounds v JOIN g_b$PcaRounds g ON v.dim = g.dim),
      tv AS (
        SELECT ${pcaBridge("xc * xc", "1e9")} AS tvn FROM $xcR)
      SELECT component, dim, loading, pc_var, explained_frac FROM (
        SELECT 1 AS component, v.dim,
          ${droundSql("v.v", 6)} AS loading,
          ${droundSql("lam_a.lam_raw / CAST(nn.n AS DOUBLE)", 6)} AS pc_var,
          ${droundSql("lam_a.lam_raw / tv.tvn", 6)} AS explained_frac
        FROM v_a$PcaRounds v CROSS JOIN lam_a CROSS JOIN tv CROSS JOIN nn
        UNION ALL
        SELECT 2 AS component, v.dim,
          ${droundSql("v.v", 6)} AS loading,
          ${droundSql("lam_b.lam_raw / CAST(nn.n AS DOUBLE)", 6)} AS pc_var,
          ${droundSql("lam_b.lam_raw / tv.tvn", 6)} AS explained_frac
        FROM v_b$PcaRounds v CROSS JOIN lam_b CROSS JOIN tv CROSS JOIN nn) u
      ORDER BY component, dim"""

  def embPca2(spark: SparkSession, dir: String): DataFrame =
    embPca2Of(Tables.load(spark, dir, "embeddings"))

  /** Run [[PcaRounds]] barriered power-iteration rounds over centered
    * relation `xcRel`: each round is ONE distributed statement (the
    * per-vector projection as a subquery feeding the per-dim gradient
    * agg) whose 64-row gradient COLLECTS and re-registers as a local
    * relation — the q84/PQ-codebook materialization barrier; normalize
    * then runs over that local frame with the exact oracle
    * expressions, so every value is the same bits while plan depth
    * stays CONSTANT in rounds. Lazily chained views instead re-inline
    * each stage's subtree per reference, and with q181's two nested
    * 3-round chains that expansion compounds until planning itself
    * dominates (observed: the analyzed tree wedged
    * `ExplainUtils.generateOperatorIDs` for minutes — the HITS
    * crossJoin lineage lesson, q149, at the planner level). The
    * barrier collect is 64 rows per round, never corpus-sized; the
    * corpus-sized frames (xc, q181's deflated xcb) persist once and
    * every round scans the cache. Statements stay CTE-free: a temp
    * view whose stored plan carries a WITH, referenced from a later
    * statement that also has one, crashes Spark 4.1's
    * PushdownPredicatesAndPruneColumnsForCTEDef ("key not found:
    * <cte id>"). Returns the final (v, g) view names — both 64-row
    * local relations. View names carry `prefix`/`sfx` and the thread
    * id (Verify's workers are concurrent). */
  private def pcaChainRun(spark: SparkSession, xcRel: String, muV: String,
                          prefix: String, sfx: String): (String, String) = {
    import org.apache.spark.sql.types._
    val tid = Thread.currentThread().getId
    def local(name: String, schema: StructType,
              rows: Array[org.apache.spark.sql.Row]): String = {
      val v = s"graft_${prefix}_${name}_t$tid"
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
        .createOrReplaceTempView(v)
      v
    }
    val vSchema = StructType(Seq(StructField("dim", IntegerType),
      StructField("v", DoubleType)))
    val gSchema = StructType(Seq(StructField("dim", IntegerType),
      StructField("g", DoubleType)))
    var v = local(s"v${sfx}0", vSchema, spark.sql(s"""
      SELECT dim, 1.0 / sqrt(nd) AS v FROM $muV CROSS JOIN
        (SELECT CAST(count(1) AS DOUBLE) AS nd FROM $muV)""").collect())
    var g = ""
    for (t <- 1 to PcaRounds) {
      g = local(s"g$sfx$t", gSchema, spark.sql(s"""
        SELECT c.dim, ${pcaBridge("s.s * c.xc", "1e9")} AS g
        FROM $xcRel c JOIN (
          SELECT c2.vec_id, ${pcaBridge("c2.xc * v.v", "1e12")} AS s
          FROM $xcRel c2 JOIN $v v ON c2.dim = v.dim
          GROUP BY c2.vec_id) s ON c.vec_id = s.vec_id
        GROUP BY c.dim""").collect())
      v = local(s"v$sfx$t", vSchema, spark.sql(s"""
        SELECT dim, g / nrm AS v FROM $g CROSS JOIN
          (SELECT sqrt(${pcaBridge("g * g", "1e12")}) AS nrm FROM $g)""")
        .collect())
    }
    (v, g)
  }

  def embPca2Of(vecs: DataFrame): DataFrame = {
    val (spark, xcV, muV) = pcaViews(vecs, "pca2")
    val tid = Thread.currentThread().getId
    val (vA, gA) = pcaChainRun(spark, xcV, muV, "pca2", "a")
    // Hotelling deflation: xc2 = xc − (xc·v1)·v1, persisted once so the
    // second chain's 3 rounds scan the cache, not the join lineage
    val xcB = s"graft_pca2_xcb_t$tid"
    spark.sql(s"""
      SELECT c.vec_id, c.dim, c.xc - s.s * v.v AS xc
      FROM $xcV c
      JOIN (SELECT c2.vec_id, ${pcaBridge("c2.xc * v.v", "1e12")} AS s
            FROM $xcV c2 JOIN $vA v ON c2.dim = v.dim
            GROUP BY c2.vec_id) s ON c.vec_id = s.vec_id
      JOIN $vA v ON c.dim = v.dim""")
      .transform(graft.core.EngineCache.persisted)
      .createOrReplaceTempView(xcB)
    val (vB, gB) = pcaChainRun(spark, xcB, muV, "pca2", "b")
    def rep(comp: Int, v: String, g: String): String = s"""
      SELECT $comp AS component, v.dim,
        ${droundSql("v.v", 6)} AS loading,
        ${droundSql("lam.lam_raw / CAST(nn.n AS DOUBLE)", 6)} AS pc_var,
        ${droundSql("lam.lam_raw / tv.tvn", 6)} AS explained_frac
      FROM $v v
      CROSS JOIN (SELECT ${pcaBridge("v.v * g.g", "1e9")} AS lam_raw
                  FROM $v v JOIN $g g ON v.dim = g.dim) lam
      CROSS JOIN (SELECT ${pcaBridge("xc * xc", "1e9")} AS tvn FROM $xcV) tv
      CROSS JOIN (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n
                  FROM $xcV) nn"""
    spark.sql(s"""
      SELECT component, dim, loading, pc_var, explained_frac FROM (
        ${rep(1, vA, gA)}
        UNION ALL
        ${rep(2, vB, gB)}) u
      ORDER BY component, dim""")
  }

  def embPca2OracleSql: String = pca2Sql(pcaOraclePrefixMat, "xc", "mu")

  // ---------------------------------------------------------------- q172
  /** All-but-the-top embedding correction (Mu & Viswanath 2018) — the
    * standard isotropy fix applied as a query: center every vector and
    * remove its projection onto q170's dominant component. Rides the
    * same power-iteration CTE chain, then needs NO second pass over
    * dims for the result: with v unit, ‖xc − s·v‖² = ‖xc‖² − s², so
    * one more per-vector agg (the bridged projection s and the bridged
    * ‖xc‖²) yields the corrected norm algebraically. Output per vector:
    * the projection coefficient (how much of the doc rode the common
    * direction — the outlier signal) and the residual norm (what a
    * downstream cosine actually sees after correction). O(corpus·dims)
    * total, no dense algebra, same bit-determinism story as q170. */
  private def abttTailSql(xcR: String): String = s""",
      sfin AS (
        SELECT c.vec_id, ${pcaBridge("c.xc * v.v", "1e12")} AS s
        FROM $xcR c JOIN v_$PcaRounds v ON c.dim = v.dim
        GROUP BY c.vec_id),
      n2 AS (
        SELECT vec_id, ${pcaBridge("xc * xc", "1e12")} AS nsq
        FROM $xcR GROUP BY vec_id)
      SELECT s.vec_id,
        ${droundSql("s.s", 6)} AS proj,
        ${droundSql(
          "sqrt(CASE WHEN n2.nsq - s.s * s.s < 0.0 THEN 0.0 " +
            "ELSE n2.nsq - s.s * s.s END)", 6)} AS resid_norm
      FROM sfin s JOIN n2 ON s.vec_id = n2.vec_id
      ORDER BY s.vec_id"""

  /** Splice: the PCA chain up to v_N, with the ABTT projection tail in
    * place of the loading report. */
  private def abttSql(prefix: String, xcR: String, muR: String): String = {
    val chain = pcaChainSql(prefix, xcR, muR)
    val cut = chain.indexOf(",\n      lam AS (")
    require(cut > 0, "pca chain shape changed under abtt")
    chain.substring(0, cut) + abttTailSql(xcR)
  }

  def embAbtt(spark: SparkSession, dir: String): DataFrame =
    embAbttOf(Tables.load(spark, dir, "embeddings"))

  /** Runs the power iteration through [[pcaChainRun]]'s driver-barrier
    * rounds (same bits as the oracle's inline chain, constant plan
    * depth), then one statement computes projection + residual norm
    * against the 64-row local v. */
  def embAbttOf(vecs: DataFrame): DataFrame = {
    val (spark, xcV, muV) = pcaViews(vecs, "abtt")
    val (v, _) = pcaChainRun(spark, xcV, muV, "abtt", "a")
    spark.sql(s"""
      SELECT s.vec_id,
        ${droundSql("s.s", 6)} AS proj,
        ${droundSql(
          "sqrt(CASE WHEN n2.nsq - s.s * s.s < 0.0 THEN 0.0 " +
            "ELSE n2.nsq - s.s * s.s END)", 6)} AS resid_norm
      FROM (SELECT c.vec_id, ${pcaBridge("c.xc * v.v", "1e12")} AS s
            FROM $xcV c JOIN $v v ON c.dim = v.dim
            GROUP BY c.vec_id) s
      JOIN (SELECT vec_id, ${pcaBridge("xc * xc", "1e12")} AS nsq
            FROM $xcV GROUP BY vec_id) n2 ON s.vec_id = n2.vec_id
      ORDER BY s.vec_id""")
  }

  def embAbttOracleSql: String = abttSql(pcaOraclePrefix, "xc", "mu")

  // ---------------------------------------------------------------- q119
  /** IVF-PQ search — the production ANN shape, combining q40's inverted
    * file with q107's ADC: a probe scores ONLY vectors in its own
    * coarse cell (here the fixture's `label`, q40's convention), and
    * those vectors are represented only by their PQ codes. Per probe
    * the work is |cell|·PqM integer lookups instead of |corpus|·dim
    * float ops — the two multiplicative cuts (cell pruning × code
    * compression) that make billion-vector search tractable. Cell
    * membership is one broadcast-sized (vec_id, cell) frame joined on
    * both sides of the ADC. Dialect-neutral tail over the per-engine
    * PQ base. */
  private def pqIvfAdcTail: String = s""",
    cells AS (SELECT vec_id, label AS cell FROM embeddings),
    codes AS (SELECT vec_id, m, cid AS code FROM r WHERE rn = 1),
    dtab AS (
      SELECT vec_id AS probe_id, m, cid, d6
      FROM d WHERE vec_id % $PqProbeMod = 0),
    adc AS (
      SELECT t.probe_id, c.vec_id, cv.cell, CAST(sum(t.d6) AS BIGINT) AS ad6
      FROM codes c
      JOIN cells cv ON c.vec_id = cv.vec_id
      JOIN dtab t ON c.m = t.m AND c.code = t.cid
      JOIN cells cp ON t.probe_id = cp.vec_id AND cp.cell = cv.cell
      GROUP BY t.probe_id, c.vec_id, cv.cell),
    ranked AS (
      SELECT probe_id, vec_id, cell, ad6,
        CAST(row_number() OVER (PARTITION BY probe_id
          ORDER BY ad6, vec_id) AS INT) AS rk
      FROM adc)
    SELECT probe_id, rk, vec_id, CAST(cell AS INT) AS cell,
      CAST(ad6 AS DOUBLE) / 1e6 AS adist
    FROM ranked WHERE rk <= $PqTopK
    ORDER BY probe_id, rk"""

  def ivfPqSearch(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    spark.sql(s"WITH ${pqFlatBase(spark, dir)} $pqIvfAdcTail")
  }

  // ---------------------------------------------------------------- q146
  /** IVF-PQ SERVING from an index at rest — the query-time half of the
    * ANN story q105/q119 build: the (vec_id, m, code, cell) PQ-code index
    * is persisted ONCE to the warehouse (Hive `cell=N` layout via
    * [[graft.core.Warehouse.tableOnce]]) and every search after that
    * touches ONLY the index table plus the probes' own rows — the corpus
    * embedding column is never re-read, let alone re-encoded. This is the
    * billion-vector serving shape: the index is PqM bytes-ish per vector
    * at rest, cell partitioning prunes candidate I/O, and the per-probe
    * work is a PqM×PqK distance table plus integer lookups. The oracle is
    * q119's full-recompute pipeline — a hash match proves the at-rest
    * index reproduces the live computation exactly. */
  /** The q146 at-rest (vec_id, m, code, cell) PQ-code table, built once
    * per fixture dir through the partitioned warehouse and registered
    * under a thread-scoped view — q146 serves from it and q193's
    * retrieve stage scans it. */
  private def atRestCodesView(spark: SparkSession, dir: String): String = {
    val table = "ivfpq_codes_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_").dropWhile(_ == '_')
    val codesView = s"graft_ivfpq_codes_t${Thread.currentThread().getId}"
    graft.core.Warehouse.tableOnce(spark, table, "cell") {
      spark.sql(s"""WITH ${pqFlatBase(spark, dir)}
        SELECT r.vec_id, r.m, r.cid AS code, e.label AS cell
        FROM r JOIN embeddings e ON r.vec_id = e.vec_id WHERE r.rn = 1""")
    }.createOrReplaceTempView(codesView)
    codesView
  }

  def ivfPqServe(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    val codesView = atRestCodesView(spark, dir)
    // d is restricted to probe rows before the join (predicate pushdown
    // into sub's scan) — the corpus side of the search is the index scan
    spark.sql(s"""
      WITH ${pqFlatBase(spark, dir)},
      codes AS (SELECT vec_id, m, code, cell FROM $codesView),
      dtab AS (
        SELECT vec_id AS probe_id, m, cid, d6
        FROM d WHERE vec_id % $PqProbeMod = 0),
      pcell AS (SELECT vec_id, label AS cell FROM embeddings),
      adc AS (
        SELECT t.probe_id, c.vec_id, c.cell, CAST(sum(t.d6) AS BIGINT) AS ad6
        FROM codes c
        JOIN dtab t ON c.m = t.m AND c.code = t.cid
        JOIN pcell cp ON t.probe_id = cp.vec_id AND cp.cell = c.cell
        GROUP BY t.probe_id, c.vec_id, c.cell),
      ranked AS (
        SELECT probe_id, vec_id, cell, ad6,
          CAST(row_number() OVER (PARTITION BY probe_id
            ORDER BY ad6, vec_id) AS INT) AS rk
        FROM adc)
      SELECT probe_id, rk, vec_id, CAST(cell AS INT) AS cell,
        CAST(ad6 AS DOUBLE) / 1e6 AS adist
      FROM ranked WHERE rk <= $PqTopK
      ORDER BY probe_id, rk""")
  }

  // ---------------------------------------------------------------- q193
  /** Two-stage retrieve-then-rerank ANN serving — the composition that
    * closes the recall gap q169's audit prices: production indexes
    * don't serve the quantized ranking (pq_adc keeps ≈0.26 of the exact
    * top-k here), they use it as a CANDIDATE GENERATOR and re-rank a
    * bounded pool with exact distances.
    *
    *  - Stage 1 (retrieve, compressed domain): ADC over an AT-REST
    *    code table encoded with a RETRIEVAL-GRADE codebook —
    *    [[RerankM]]×[[RerankK]] (16 subspaces × 32 centroids, built by
    *    the same parameterized Lloyd machinery as q105's audit-sized
    *    4×8 book) — top-[[RerankPool]] per probe by quantized
    *    distance. The full-precision corpus is untouched; the scan
    *    reads 16-byte codes, which is why a billion-vector compressed
    *    sweep is cheap. Measured on this fixture, the code-budget knob
    *    is exactly what the q169 audit says it is: the 4×8 book's pool
    *    keeps only 0.50 of the exact top-3 at R=50, the 16×32 book
    *    ≈0.94. (Cell structure is priced separately by the audit —
    *    label cells keep 0.08, learned cells 0.40/0.57 — so the
    *    retrieve stage sweeps ALL cells in the compressed domain
    *    rather than paying cell-miss recall; at 10⁹ vectors the same
    *    composition runs with nprobe-restricted cells feeding a
    *    larger pool.)
    *  - Stage 2 (rerank, exact): the pool — [[RerankPool]] ids per
    *    probe, nothing else — joins back to the embedding table for
    *    exact cosine; top-[[graft.operators.LlmQueries.IvfK]] of the
    *    re-scored pool is served. Full-precision rows touched per
    *    probe: RerankPool/(N−1) of the corpus (≈10% at this fixture's
    *    N=500; a FIXED R, so a few % at 2k vectors and vanishing at
    *    production N — the q169 `rerank` row reports it).
    *
    * Both stages are deterministic (integer ad6 ties by cand_id; 6dp
    * half-up cosine ties by cand_id). The oracle recomputes the PQ
    * pipeline live — fine codebook included — and replays both stages;
    * a hash match proves the at-rest index retrieves, and the rerank
    * serves, exactly what the live computation would. */
  val RerankPool = 50
  val RerankM = 16   // retrieval-codebook subspaces (× 4 dims each)
  val RerankSub = 4
  val RerankK = 32   // centroids per subspace

  /** The dialect-neutral two-stage tail: expects PQ CTEs (`d` — probe
    * distance tables) in scope; `codesRel` is the stage-1 code source
    * (engine: the at-rest table; oracle: the live `r` encode), `cos`
    * the per-dialect exact-cosine spelling. Self-matches are excluded
    * to mirror the brute-force truth's convention. */
  private def annRerankTail(codesRel: String, probeWhere: String,
                            cos: (String, String) => String): String = s""",
    codes2 AS (SELECT vec_id, m, code FROM $codesRel),
    dtab2 AS (
      SELECT vec_id AS query_id, m, cid, d6 FROM d WHERE $probeWhere),
    adc2 AS (
      SELECT t.query_id, c.vec_id AS cand_id, CAST(sum(t.d6) AS BIGINT) AS ad6
      FROM codes2 c JOIN dtab2 t ON c.m = t.m AND c.code = t.cid
      WHERE c.vec_id <> t.query_id
      GROUP BY t.query_id, c.vec_id),
    pool AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY ad6, cand_id) AS prk
        FROM adc2) zp WHERE prk <= $RerankPool),
    rr AS (
      SELECT p.query_id, p.cand_id, ${cos("q.embedding", "e.embedding")} AS cos
      FROM pool p
      JOIN embeddings q ON q.vec_id = p.query_id
      JOIN embeddings e ON e.vec_id = p.cand_id)
    SELECT query_id, rnk, cand_id, cos FROM (
      SELECT query_id, cand_id, cos,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, cand_id) AS INT) AS rnk
      FROM rr) zr
    WHERE rnk <= ${LlmQueries.IvfK}
    ORDER BY query_id, rnk"""

  /** The retrieval-grade at-rest code table (16×32 geometry), same
    * warehouse discipline as [[atRestCodesView]] — built once per
    * fixture dir, cell-partitioned, served thereafter. */
  private def rerankCodesView(spark: SparkSession, dir: String): String = {
    val table = "rerank_codes_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_").dropWhile(_ == '_')
    val v = s"graft_rerank_codes_t${Thread.currentThread().getId}"
    graft.core.Warehouse.tableOnce(spark, table, "cell") {
      spark.sql(s"""WITH ${pqFlatBase(spark, dir, PqRounds,
          RerankM, RerankSub, RerankK)}
        SELECT r.vec_id, r.m, r.cid AS code, e.label AS cell
        FROM r JOIN embeddings e ON r.vec_id = e.vec_id WHERE r.rn = 1""")
    }.createOrReplaceTempView(v)
    v
  }

  def annRerank(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    val codesView = rerankCodesView(spark, dir)
    // the PQ base is restricted to PROBE rows: only their subvectors
    // meet the codebook (the probes' RerankM×RerankK distance tables);
    // the corpus side of stage 1 is the at-rest code scan, stage 2 an
    // id-equi join into the embedding table for the pool alone
    spark.sql(s"""
      WITH ${pqFlatBaseWhere(spark, dir, "vec_id < 50", PqRounds,
        RerankM, RerankSub, RerankK)}
      ${annRerankTail(s"(SELECT vec_id, m, code FROM $codesView)",
        "vec_id < 50", graft.llm.Similarity.cosineExpr)}""")
  }

  def annRerankOracleSql: String =
    s"""WITH ${pqBaseOracleP(RerankM, RerankSub, RerankK, PqRounds)}
      ${annRerankTail("(SELECT vec_id, m, cid AS code FROM r WHERE rn = 1)",
        "vec_id < 50", graft.llm.Similarity.cosineSql)}"""

  // ---------------------------------------------------------------- q151
  /** Incremental IVF-PQ index APPEND — the maintenance half of the q146
    * serving story: the corpus's PQ-code index sits at rest partitioned
    * by cell; when a batch of new vectors arrives (here vec_id ≡
    * [[PqBatchMod]] (mod 10), ~10% of the corpus), ONLY the batch is
    * encoded — the filter is pushed into the embedding scan, the frozen
    * memoized codebook broadcasts, and the base index is read back, not
    * rebuilt. Searches then run over stored-base ∪ fresh-batch codes.
    * The oracle is q119's FULL recompute over the whole corpus, so the
    * hash match proves the incremental path is lossless: append ∘ store
    * ≡ rebuild. At 100 TB this is the difference between re-encoding a
    * corpus per ingest batch and an O(batch) increment — the same
    * contract q145 establishes for the dedup signature table. */
  val PqBatchMod = 7 // batch = vec_id ≡ 7 (mod 10); probes (≡0 mod 100) stay in the base
  def ivfPqAppend(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    val batchWhere = s"vec_id % 10 = $PqBatchMod"
    val tid = Thread.currentThread().getId
    val baseView = s"graft_ivfpq_base_t$tid"
    val batchView = s"graft_ivfpq_batch_t$tid"
    val baseTable = "ivfpq_base_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_").dropWhile(_ == '_')
    def encode(where: String) = spark.sql(
      s"""WITH ${pqFlatBaseWhere(spark, dir, where)}
      SELECT r.vec_id, r.m, r.cid AS code, e.label AS cell
      FROM r JOIN embeddings e ON r.vec_id = e.vec_id WHERE r.rn = 1""")
    graft.core.Warehouse.tableOnce(spark, baseTable, "cell") {
      encode(s"NOT ($batchWhere)")
    }.createOrReplaceTempView(baseView)
    encode(batchWhere).createOrReplaceTempView(batchView)
    // the probe leg's distance tables: `d` restricted to probe rows at
    // the scan — the corpus side of the search is the (stored ∪ fresh)
    // index, never the embedding column
    spark.sql(s"""
      WITH ${pqFlatBaseWhere(spark, dir, s"vec_id % $PqProbeMod = 0")},
      codes AS (SELECT vec_id, m, code, cell FROM $baseView
                UNION ALL SELECT vec_id, m, code, cell FROM $batchView),
      dtab AS (SELECT vec_id AS probe_id, m, cid, d6 FROM d),
      pcell AS (SELECT vec_id, label AS cell FROM embeddings),
      adc AS (
        SELECT t.probe_id, c.vec_id, c.cell, CAST(sum(t.d6) AS BIGINT) AS ad6
        FROM codes c
        JOIN dtab t ON c.m = t.m AND c.code = t.cid
        JOIN pcell cp ON t.probe_id = cp.vec_id AND cp.cell = c.cell
        GROUP BY t.probe_id, c.vec_id, c.cell),
      ranked AS (
        SELECT probe_id, vec_id, cell, ad6,
          CAST(row_number() OVER (PARTITION BY probe_id
            ORDER BY ad6, vec_id) AS INT) AS rk
        FROM adc)
      SELECT probe_id, rk, vec_id, CAST(cell AS INT) AS cell,
        CAST(ad6 AS DOUBLE) / 1e6 AS adist
      FROM ranked WHERE rk <= $PqTopK
      ORDER BY probe_id, rk""")
  }

  /** Encode an arriving batch FRAME with the frozen memoized codebook —
    * the entry point streaming/incremental ingest uses: the batch is its
    * own relation (thread-scoped view), only its rows are scanned, and
    * the codebook never shifts. Same arithmetic as q105's encode, so
    * appended codes are bit-compatible with the stored index. */
  def encodeWithFrozenCodebook(spark: SparkSession, dir: String,
                               batch: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // codebook builds lazily off the corpus table on first use
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    val view = s"graft_pq_ingest_t${Thread.currentThread().getId}"
    batch.createOrReplaceTempView(view)
    spark.sql(s"""WITH ${pqFlatBaseOver(spark, dir, view, "true")}
      SELECT vec_id, m, cid AS code FROM r WHERE rn = 1""")
  }

  // ---------------------------------------------------------------- q153
  /** Johnson–Lindenstrauss random-projection audit: project the 64-dim
    * embeddings to [[JlDims]] dims with the deterministic ±1 hyperplane
    * matrix ([[graft.functions.HashKernels.srpSigns]] — the same public
    * md5-parity source the SRP signatures use, so both engines carry the
    * matrix as literals) scaled by 1/√[[JlDims]] = 0.25 (exact binary),
    * then report per-pair L2² distortion `proj/orig` on the
    * deterministic (even id, id+1) pair sample. This is the
    * dimensionality-reduction leg of the ANN story: JL says distances
    * survive a 4× dim cut within (1±ε), and this query MEASURES it
    * instead of assuming it. One scan computes the projections; the
    * pair join is id+1 equi (no fan-out); distances bridge to a 1e6
    * grid before the ratio, ties impossible. */
  val JlDims = 16 // 64 → 16: scale 1/√16 = 0.25 is exact in binary fp
  private def jlProjections: (String, String) = {
    val signs = graft.functions.HashKernels.srpSigns(JlDims, PqM * PqSub)
    val spark = (0 until JlDims).map { j =>
      val lits = signs(j).map(s => if (s > 0) "1.0D" else "-1.0D").mkString(",")
      s"(aggregate(zip_with(embedding, array($lits), " +
        "(x, s) -> CAST(x AS DOUBLE) * s), CAST(0.0 AS DOUBLE), " +
        "(acc, v) -> acc + v) * 0.25D)"
    }.mkString("array(", ", ", ")")
    val duck = (0 until JlDims).map { j =>
      val lits = signs(j).map(s => if (s > 0) "1.0" else "-1.0").mkString(",")
      s"(list_sum(list_transform(range(1, len(embedding) + 1), " +
        s"i -> (embedding[i]::DOUBLE) * ([$lits])[i])) * 0.25)"
    }.mkString("[", ", ", "]")
    (spark, duck)
  }

  def jlDistortion(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    val (projSpark, _) = jlProjections
    spark.sql(s"""
      WITH p AS (
        SELECT vec_id, embedding, $projSpark AS pv FROM embeddings),
      pr AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          CAST(floor(l2_sq(a.embedding, b.embedding) * 1e6 + 0.5) AS BIGINT)
            AS do6,
          CAST(floor(aggregate(zip_with(a.pv, b.pv,
              (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE),
              (acc, v) -> acc + v) * 1e6 + 0.5) AS BIGINT) AS dp6
        FROM p a JOIN p b ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0)
      SELECT id_a, id_b, CAST(do6 AS DOUBLE) / 1e6 AS d_orig,
        CAST(dp6 AS DOUBLE) / 1e6 AS d_proj,
        ${droundSql("CAST(dp6 AS DOUBLE) / CAST(do6 AS DOUBLE)", 6)} AS ratio
      FROM pr WHERE do6 > 0
      ORDER BY id_a""")
  }

  def jlDistortionSql: String = {
    val (_, projDuck) = jlProjections
    val l2Orig = s"""list_sum(list_transform(range(1, len(a.embedding) + 1),
        i -> (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE) *
             (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)))"""
    val l2Proj = s"""list_sum(list_transform(range(1, $JlDims + 1),
        i -> (a.pv[i] - b.pv[i]) * (a.pv[i] - b.pv[i])))"""
    s"""
      WITH p AS (
        SELECT vec_id, embedding, $projDuck AS pv FROM embeddings),
      pr AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          CAST(floor($l2Orig * 1e6 + 0.5) AS BIGINT) AS do6,
          CAST(floor($l2Proj * 1e6 + 0.5) AS BIGINT) AS dp6
        FROM p a JOIN p b ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0)
      SELECT id_a, id_b, do6::DOUBLE / 1e6 AS d_orig,
        dp6::DOUBLE / 1e6 AS d_proj,
        ${droundSql("dp6::DOUBLE / do6::DOUBLE", 6)} AS ratio
      FROM pr WHERE do6 > 0
      ORDER BY id_a"""
  }

  // ---------------------------------------------------------------- q154
  /** Embedding cohesion/drift matrix: mean pairwise cosine between every
    * pair of label groups (and within each group on the diagonal,
    * self-pairs included) — the embedding-space mirror of q93's KL drift
    * matrix, the signal that says two sources' embedding distributions
    * are converging or drifting. The trick that makes it scale: since
    * cos(a,b) = â·b̂, the mean over A×B factorizes as
    * (Σ_A â)·(Σ_B b̂) / (|A||B|) — so ONE corpus scan computes per-group
    * per-dim sums of normalized vectors (each component floor-bridged to
    * a 1e8 grid, so the sums are exact integers), and the "all pairs"
    * answer is a G²·D-sized join over those tiny sums. No pair join
    * over the corpus, ever. Products bridge through DECIMAL(38,0)
    * (s_a·s_b can exceed int64), division happens once per cell. */
  def embDriftSparkSql: String = {
    val norm = "sqrt(aggregate(transform(embedding, " +
      "p -> CAST(p AS DOUBLE) * CAST(p AS DOUBLE)), CAST(0.0 AS DOUBLE), " +
      "(acc, v) -> acc + v))"
    s"""
      WITH e AS (
        SELECT label, posexplode(embedding) AS (dim, v), $norm AS nrm
        FROM embeddings),
      s AS (
        SELECT label, dim,
          CAST(sum(CAST(floor(CAST(v AS DOUBLE) / nrm * 1e8 + 0.5) AS BIGINT))
            AS BIGINT) AS sb
        FROM e GROUP BY label, dim),
      cnt AS (SELECT label, count(1) AS n FROM embeddings GROUP BY label),
      dots AS (
        SELECT a.label AS label_a, b.label AS label_b,
          CAST(sum(CAST(a.sb AS DECIMAL(19,0)) * CAST(b.sb AS DECIMAL(19,0)))
            AS DECIMAL(38,0)) AS dot16
        FROM s a JOIN s b ON a.dim = b.dim AND a.label <= b.label
        GROUP BY a.label, b.label)
      SELECT label_a, label_b,
        ${droundSql("CAST(dot16 AS DOUBLE) / 1e16 / " +
          "(CAST(ca.n AS DOUBLE) * CAST(cb.n AS DOUBLE))", 6)} AS mean_cos
      FROM dots
      JOIN cnt ca ON dots.label_a = ca.label
      JOIN cnt cb ON dots.label_b = cb.label
      ORDER BY label_a, label_b"""
  }

  def embDrift(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    spark.sql(embDriftSparkSql)
  }

  def embDriftSql: String = {
    val norm = "sqrt(list_sum(list_transform(embedding, " +
      "p -> p::DOUBLE * p::DOUBLE)))"
    s"""
      WITH e AS (
        SELECT label,
          (unnest(range(1, len(embedding) + 1)) - 1)::INT AS dim,
          unnest(embedding) AS v, $norm AS nrm
        FROM embeddings),
      s AS (
        SELECT label, dim,
          CAST(sum(CAST(floor(v::DOUBLE / nrm * 1e8 + 0.5) AS BIGINT))
            AS BIGINT) AS sb
        FROM e GROUP BY label, dim),
      cnt AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
      dots AS (
        SELECT a.label AS label_a, b.label AS label_b,
          CAST(sum(a.sb::DECIMAL(19,0) * b.sb::DECIMAL(19,0))
            AS DECIMAL(38,0)) AS dot16
        FROM s a JOIN s b ON a.dim = b.dim AND a.label <= b.label
        GROUP BY a.label, b.label)
      SELECT label_a, label_b,
        ${droundSql("dot16::DOUBLE / 1e16 / (ca.n::DOUBLE * cb.n::DOUBLE)", 6)}
          AS mean_cos
      FROM dots
      JOIN cnt ca ON dots.label_a = ca.label
      JOIN cnt cb ON dots.label_b = cb.label
      ORDER BY label_a, label_b"""
  }

  // ---------------------------------------------------------------- q108
  /** CDC merge-upsert (MERGE INTO semantics without a table format):
    * apply a changeset of updates / deletes / inserts to a keyed target
    * in one pass — target LEFT JOIN changes resolves update-vs-keep,
    * an anti-filter drops deletes, inserts union on. At 100 TB the
    * target is bucketed by key so the join is exchange-free on the big
    * side, and the changeset (typically ≪ target) broadcasts. The
    * changeset here is derived deterministically from the target itself
    * (keys ≡1 mod 10 update, ≡2 delete, MergeInserts fresh keys past
    * max insert), so both engines construct the identical fixture.
    * Dialect-neutral: one string. Balances are exact integer cents. */
  def mergeUpsertSql(table: String): String = s"""
    WITH tgt AS (
      SELECT c_custkey AS k,
        CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM $table),
    upd AS (
      SELECT k, bal_cents + 10000 AS bal_cents, 'U' AS op
      FROM tgt WHERE k % 10 = 1),
    del AS (SELECT k FROM tgt WHERE k % 10 = 2),
    mx AS (SELECT max(k) AS mx FROM tgt),
    ins AS (
      SELECT mx.mx + CAST(row_number() OVER (ORDER BY k) AS BIGINT) AS k,
        CAST(0 AS BIGINT) AS bal_cents, 'I' AS op
      FROM (SELECT k FROM tgt ORDER BY k LIMIT $MergeInserts) seed
      CROSS JOIN mx)
    SELECT t.k, coalesce(u.bal_cents, t.bal_cents) AS bal_cents,
      CASE WHEN u.k IS NOT NULL THEN 'U' ELSE 'K' END AS op
    FROM tgt t
    LEFT JOIN upd u ON t.k = u.k
    LEFT JOIN del d ON t.k = d.k
    WHERE d.k IS NULL
    UNION ALL
    SELECT k, bal_cents, op FROM ins
    ORDER BY k"""

  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(mergeUpsertSql("customer"))
  }

  // ---------------------------------------------------------------- q109
  /** Star-schema flatten — the feature-denormalization step that turns
    * the normalized warehouse into one wide training table: fact
    * lineitem joined to orders, customer, supplier, part, and nation
    * twice (customer's and supplier's). The true dimensions (customer,
    * supplier, part, nation ×2) are broadcast-sized relative to the
    * fact at any scale, so they cost zero shuffles over ONE fact scan;
    * lineitem⋈orders is the lone fact-to-fact edge and shuffles on the
    * order key (or is exchange-free when both are bucketed on it at
    * rest — BucketingSpec shows that layout). Money lands as exact
    * integer cents. */
  def starFlattenSql(dialectRound: String => String): String = s"""
    SELECT l.l_orderkey, l.l_linenumber,
      o.o_orderstatus, cn.n_name AS cust_nation, sn.n_name AS supp_nation,
      p.p_type,
      ${dialectRound("l.l_extendedprice")} AS price_cents,
      CAST(l.l_quantity AS BIGINT) AS qty
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    ORDER BY l.l_orderkey, l.l_linenumber"""

  private val centsRound: String => String =
    e => s"CAST(round($e * 100) AS BIGINT)"

  def starFlatten(spark: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation")
      .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))
    spark.sql(starFlattenSql(centsRound))
  }

  // ---------------------------------------------------------------- q110
  /** Declarative data-quality audit (the Deequ-style constraint pass a
    * pipeline runs before training): uniqueness, composite-key
    * uniqueness, referential integrity, range, accepted-values, and
    * not-null checks, each one aggregate over one scan of its table —
    * violations count, never example rows, so the output is O(checks)
    * regardless of data size. The FK check is a left-anti count, the
    * shape that broadcasts the dimension at scale. Dialect-neutral. */
  def dataQualitySql: String = s"""
    SELECT check_name, violations, violations = 0 AS passed FROM (
      SELECT 'customer.c_custkey unique' AS check_name,
        count(1) - count(DISTINCT c_custkey) AS violations FROM customer
      UNION ALL
      SELECT 'lineitem.(l_orderkey,l_linenumber) unique',
        count(1) - count(DISTINCT CAST(l_orderkey AS STRING) || ':' ||
          CAST(l_linenumber AS STRING)) FROM lineitem
      UNION ALL
      SELECT 'orders.o_custkey references customer', count(1)
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_custkey IS NULL
      UNION ALL
      SELECT 'lineitem.l_quantity in [1,50]', count(1) FROM lineitem
      WHERE l_quantity < 1 OR l_quantity > 50
      UNION ALL
      SELECT 'orders.o_orderstatus accepted', count(1) FROM orders
      WHERE o_orderstatus NOT IN ('F', 'O', 'P')
      UNION ALL
      SELECT 'customer.c_name not null', count(1) FROM customer
      WHERE c_name IS NULL) checks
    ORDER BY check_name"""

  def dataQuality(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem")
      .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))
    spark.sql(dataQualitySql)
  }

  // ---------------------------------------------------------------- q111
  /** Pointwise mutual information between two categorical columns —
    * the feature-selection / association signal. One hash agg builds
    * the joint histogram; marginals reduce it; every cell gets
    * pmi_bits plus its contribution p(x,y)·pmi to total MI (so the MI
    * sum is checkable from the output). The histogram is O(|X|·|Y|)
    * after one corpus pass — nothing downstream sees row counts.
    * `ln` runs on identical doubles in both engines (q88/q93
    * precedent); outputs are half-up rounded at 6dp. Dialect-neutral. */
  def mutualInfoSql(table: String): String = s"""
    WITH j AS (
      SELECT l_returnflag AS x, l_linestatus AS y, count(1) AS c
      FROM $table GROUP BY l_returnflag, l_linestatus),
    n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM j),
    mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM j GROUP BY x),
    my AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM j GROUP BY y)
    SELECT j.x, j.y, CAST(j.c AS BIGINT) AS c,
      ${droundSql("ln((CAST(j.c AS DOUBLE) * n.n) / " +
        "(CAST(mx.cx AS DOUBLE) * CAST(my.cy AS DOUBLE))) / ln(2.0)", 6)}
        AS pmi_bits,
      ${droundSql("(CAST(j.c AS DOUBLE) / n.n) * " +
        "(ln((CAST(j.c AS DOUBLE) * n.n) / " +
        "(CAST(mx.cx AS DOUBLE) * CAST(my.cy AS DOUBLE))) / ln(2.0))", 6)}
        AS mi_contrib_bits
    FROM j JOIN mx ON j.x = mx.x JOIN my ON j.y = my.y CROSS JOIN n
    ORDER BY j.x, j.y"""

  def mutualInfo(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(mutualInfoSql("lineitem"))
  }

  // ---------------------------------------------------------------- q112
  /** Time-weighted average of a sampled signal per user (TWAP): each
    * observation holds until the next one, so its weight is the
    * interval length — the correct average for irregularly-sampled
    * series where arithmetic mean over-weights bursts. One lead()
    * window per user partition, then one hash agg. Exactness: value is
    * bridged to integer cents per row, interval is integer millis, and
    * the cents×millis products (≤ ~1e15, inside int64) accumulate as
    * DECIMAL — the only fp is the final divide on identical integers. */
  private def twapSql(epochMs: String): String = s"""
    WITH t AS (
      SELECT user_id, value,
        lead($epochMs) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          - $epochMs AS dt_ms
      FROM events),
    w AS (
      SELECT user_id,
        CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents, dt_ms
      FROM t WHERE dt_ms IS NOT NULL)
    SELECT user_id, count(1) AS n_intervals,
      CAST(sum(dt_ms) AS BIGINT) AS span_ms,
      ${droundSql("(CAST(sum(CAST(cents AS DECIMAL(19,0)) * dt_ms) AS DOUBLE) /" +
        " CAST(sum(dt_ms) AS DOUBLE)) / 100.0", 6)} AS twap
    FROM w GROUP BY user_id
    ORDER BY user_id"""

  def twap(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(twapSql("unix_millis(ts)"))
  }

  // ---------------------------------------------------------------- q113
  /** Association rules over co-purchases (market-basket): for part
    * pairs in the same order, support / confidence / lift, top rules
    * by lift. Pair supports come from one self-join + hash agg (the
    * q104 edge shape); item supports and the order count broadcast.
    * A minimum-support prune cuts the pair space BEFORE any division,
    * and all scores are ratios of exact integers half-up-bridged at
    * 6dp, ranked on the rounded value with (antecedent, consequent)
    * tiebreak — near-ties cannot reorder across engines. */
  val MinSupport = 3
  val RulesTopK = 100
  def assocRulesSql(table: String): String = s"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM $table),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
    item AS (SELECT l_partkey, count(1) AS sup FROM li GROUP BY l_partkey),
    pair AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(1) AS sup_ab
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING count(1) >= $MinSupport),
    scored AS (
      SELECT pa, pb, sup_ab,
        ${droundSql("CAST(sup_ab AS DOUBLE) / CAST(ia.sup AS DOUBLE)", 6)}
          AS conf,
        ${droundSql("(CAST(sup_ab AS DOUBLE) * CAST(n.n_orders AS DOUBLE)) / " +
          "(CAST(ia.sup AS DOUBLE) * CAST(ib.sup AS DOUBLE))", 6)} AS lift
      FROM pair
      JOIN item ia ON pair.pa = ia.l_partkey
      JOIN item ib ON pair.pb = ib.l_partkey
      CROSS JOIN n)
    SELECT pa, pb, CAST(sup_ab AS BIGINT) AS sup_ab, conf, lift FROM scored
    ORDER BY lift DESC, pa, pb LIMIT $RulesTopK"""

  /** Spark side persists the distinct (order, part) basket table once —
    * it feeds the order count, the item supports, and BOTH branches of
    * the pair self-join, and Spark's CTE inlining would otherwise
    * recompute the distinct (a shuffle) four times. Identical
    * expressions to [[assocRulesSql]], so the oracle hash holds. */
  def assocRules(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .transform(graft.core.EngineCache.persisted)
    val nOrders = li.select(col("l_orderkey")).distinct().count()
    val item = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("sup"))
    val pair = li.alias("a")
      .join(li.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= MinSupport)
    pair
      .join(item.select(col("l_partkey").as("pa"), col("sup").as("sup_a")), "pa")
      .join(item.select(col("l_partkey").as("pb"), col("sup").as("sup_b")), "pb")
      .select(col("pa"), col("pb"),
        col("sup_ab").cast("long").as("sup_ab"),
        expr(droundSql("CAST(sup_ab AS DOUBLE) / CAST(sup_a AS DOUBLE)", 6))
          .as("conf"),
        expr(droundSql(s"(CAST(sup_ab AS DOUBLE) * CAST($nOrders AS DOUBLE)) / " +
          "(CAST(sup_a AS DOUBLE) * CAST(sup_b AS DOUBLE))", 6)).as("lift"))
      .orderBy(col("lift").desc, col("pa"), col("pb"))
      .limit(RulesTopK)
  }

  // ---------------------------------------------------------------- q114
  /** Pareto/skyline filter over (minimize n_chars, maximize n_tokens) —
    * the token-density frontier: documents packing the most tokens into
    * the fewest characters, the multi-objective version of "take the
    * best docs" that a single score cannot express. Distributed form:
    * phase 1 computes a LOCAL skyline per hash bucket (a point
    * dominated within its bucket is dominated globally, so the union of
    * local skylines is a guaranteed superset of the answer — the bucket
    * hash can be engine-specific because it only affects pruning);
    * phase 2 runs the exact same dominance predicate globally over the
    * few survivors. Each phase is two window functions over the negated
    * char count: max-tokens within equal x, and max-tokens over
    * STRICTLY greater x via a DESC RANGE frame ending at 1 PRECEDING.
    * The oracle is the O(n²) NOT EXISTS ground truth, so a hash match
    * proves the window rewrite, not just agreement. */
  private def skylinePhase(src: String, bucketed: Boolean): String = {
    val sameX = if (bucketed) "PARTITION BY bkt, neg_chars"
                else "PARTITION BY neg_chars"
    val gtX = if (bucketed) "PARTITION BY bkt ORDER BY neg_chars DESC"
              else "ORDER BY neg_chars DESC"
    s"""SELECT doc_id, n_chars, neg_chars, n_tokens, bkt FROM (
      SELECT doc_id, n_chars, neg_chars, n_tokens, bkt,
        max(n_tokens) OVER ($sameX) AS mx,
        max(n_tokens) OVER ($gtX
          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mg
      FROM $src) ph
    WHERE n_tokens = mx AND (mg IS NULL OR n_tokens > mg)"""
  }

  def skyline(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "documents").createOrReplaceTempView("documents")
    spark.sql(s"""
      WITH m AS (
        SELECT doc_id, n_chars, -n_chars AS neg_chars,
          CAST(size(${wordsExpr("text")}) AS BIGINT) AS n_tokens,
          pmod(hash(doc_id), 32) AS bkt
        FROM documents),
      l AS (${skylinePhase("m", bucketed = true)})
      SELECT doc_id, n_chars, n_tokens
      FROM (${skylinePhase("l", bucketed = false)}) fin
      ORDER BY doc_id""")
  }

  def skylineOracleSql: String = s"""
    WITH m AS (
      SELECT doc_id, n_chars, ${tokenCountSql("text")}::BIGINT AS n_tokens
      FROM documents)
    SELECT doc_id, n_chars, n_tokens FROM m m1
    WHERE NOT EXISTS (
      SELECT 1 FROM m m2
      WHERE m2.n_chars <= m1.n_chars AND m2.n_tokens >= m1.n_tokens
        AND (m2.n_chars < m1.n_chars OR m2.n_tokens > m1.n_tokens))
    ORDER BY doc_id"""

  // ---------------------------------------------------------------- q115
  /** Triangle counting on the co-purchase graph (min-support 2): the
    * local-clustering / community-density signal. Edges are canonical
    * u < v, so each triangle a<b<c is found exactly once by the
    * two-hop join e(a,b)⋈e(b,c)⋈e(a,c) — the standard distributed
    * formulation (at billion-edge scale you additionally orient edges
    * low-degree→high so the e1⋈e2 wedge join is bounded by Σ deg_out²
    * with deg_out ≤ √m; the canonical orientation here is the same
    * join shape). Per-node counts come from exploding each triangle's
    * three corners into one hash agg. Dialect-neutral. */
  val TriMinSup = 2
  def trianglesSql(table: String): String = s"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM $table),
    e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING count(1) >= $TriMinSup),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
    corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
    SELECT node, count(1) AS triangles
    FROM corners GROUP BY node
    ORDER BY node"""

  /** Spark side persists the pruned edge list once (three join branches
    * would otherwise each recompute the basket self-join), and explodes
    * each triangle's corners in one generator instead of a triple
    * union — one pass, one hash agg. Same semantics as
    * [[trianglesSql]]. */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = li.alias("a")
      .join(li.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("c"))
      .filter(col("c") >= TriMinSup)
      .select("u", "v")
      .transform(graft.core.EngineCache.persisted)
    val tri = e.alias("e1")
      .join(e.alias("e2"), col("e1.v") === col("e2.u"))
      .join(e.alias("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
      .orderBy("node")
  }

  // ---------------------------------------------------------------- q116
  /** Deterministic A/B experiment analysis: users assign to arms by pure
    * hash (reproducible, no assignment table to join), purchase values
    * accumulate as exact integer cents power sums (S0/S1/S2) per arm in
    * ONE conditional-aggregation pass — no per-arm scans, no shuffle
    * beyond the final 1-row reduce — and mean/variance/Welch-z are
    * computed once on identical integers in both engines, then half-up
    * rounded. The single-row output is the whole experiment readout. */
  def abTestSql(hashArm: String): String = s"""
    WITH p AS (
      SELECT CASE WHEN ($hashArm) % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'),
    s AS (
      SELECT
        CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(sum(CASE WHEN arm = 'A' THEN cents ELSE 0 END) AS BIGINT) AS s1a,
        CAST(sum(CASE WHEN arm = 'B' THEN cents ELSE 0 END) AS BIGINT) AS s1b,
        CAST(sum(CASE WHEN arm = 'A'
          THEN CAST(cents AS DECIMAL(19,0)) * cents
          ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS s2a,
        CAST(sum(CASE WHEN arm = 'B'
          THEN CAST(cents AS DECIMAL(19,0)) * cents
          ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS s2b
      FROM p),
    m AS (
      SELECT n_a, n_b,
        CAST(s1a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
        CAST(s1b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
        (CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) /
          CAST(n_a AS DOUBLE)) / CAST(n_a - 1 AS DOUBLE) AS va,
        (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) /
          CAST(n_b AS DOUBLE)) / CAST(n_b - 1 AS DOUBLE) AS vb
      FROM s)
    SELECT n_a, n_b,
      ${droundSql("ma / 100.0", 6)} AS mean_a,
      ${droundSql("mb / 100.0", 6)} AS mean_b,
      ${droundSql("(ma - mb) / sqrt(va / CAST(n_a AS DOUBLE) + " +
        "vb / CAST(n_b AS DOUBLE))", 6)} AS welch_z
    FROM m"""

  def abTest(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(abTestSql(xhashExpr("concat('ab:', CAST(user_id AS STRING))")))
  }

  // ---------------------------------------------------------------- q117
  /** RFM customer segmentation: recency (days since last order),
    * frequency (order count), monetary (lifetime cents) per customer
    * from one orders scan, then ntile(5) per dimension with full
    * deterministic tiebreaks (metric, custkey) — the classic marketing
    * segmentation that doubles as a mixture-weighting signal. One
    * shuffle on o_custkey to the customer-grain frame; the ORACLE then
    * scores with three global ntile(5) windows, but the Spark plan must
    * NOT (empty-partition window = single-task sort) — [[rfm]] ranks
    * each dimension with [[DistributedRank]]'s range-partitioned global
    * rank and assigns quintiles arithmetically, bit-identical to ntile
    * under the same (metric, custkey) total order. */
  def rfmBaseSql(daysBetween: (String, String) => String): String = s"""
    WITH cust AS (
      SELECT o_custkey,
        CAST(max(o_orderdate) AS DATE) AS last_order,
        count(1) AS frequency,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS monetary_cents
      FROM orders GROUP BY o_custkey),
    mx AS (SELECT max(last_order) AS ref_date FROM cust)
    SELECT o_custkey,
      CAST(${daysBetween("last_order", "ref_date")} AS BIGINT) AS recency_days,
      frequency, monetary_cents
    FROM cust CROSS JOIN mx"""

  def rfmSql(daysBetween: (String, String) => String): String = s"""
    WITH r AS (${rfmBaseSql(daysBetween)})
    SELECT o_custkey, recency_days, frequency, monetary_cents,
      CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey) AS INT) AS r_score,
      CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS INT) AS f_score,
      CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS INT) AS m_score
    FROM r
    ORDER BY o_custkey"""

  def rfm(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    // persist the customer-grain frame: the one count (for ntile's n) and
    // the three chained rank pipelines all start from the cache, not from
    // a re-aggregation of orders
    val r = graft.core.EngineCache.persisted(
      spark.sql(rfmBaseSql((from, to) => s"datediff($to, $from)")))
    // ONE stats pass serves n plus all three dimensions' bucket bounds
    val st = r.agg(
      count(lit(1)),
      min("recency_days").cast("double"), max("recency_days").cast("double"),
      min("frequency").cast("double"), max("frequency").cast("double"),
      min("monetary_cents").cast("double"), max("monetary_cents").cast("double")
    ).first()
    val n = st.getLong(0)
    if (n == 0) return r.selectExpr("o_custkey", "recency_days", "frequency",
      "monetary_cents", "CAST(1 AS INT) r_score", "CAST(1 AS INT) f_score",
      "CAST(1 AS INT) m_score")
    val s1 = DistributedRank.rankOnlyBounded(
        r, "rk", "recency_days", desc = false, st.getDouble(1), st.getDouble(2),
        col("recency_days"), col("o_custkey"))
      .withColumn("r_score", DistributedRank.ntileFromRank("rk", n, 5))
      .drop("rk")
    val s2 = DistributedRank.rankOnlyBounded(
        s1, "rk", "frequency", desc = true, st.getDouble(3), st.getDouble(4),
        col("frequency").desc, col("o_custkey"))
      .withColumn("f_score", DistributedRank.ntileFromRank("rk", n, 5))
      .drop("rk")
    DistributedRank.rankOnlyBounded(
        s2, "rk", "monetary_cents", desc = true, st.getDouble(5), st.getDouble(6),
        col("monetary_cents").desc, col("o_custkey"))
      .withColumn("m_score", DistributedRank.ntileFromRank("rk", n, 5))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"), col("m_score"))
      .orderBy("o_custkey")
  }

  // ---------------------------------------------------------------- q118
  /** User-journey path mining: the most frequent 3-event sequences
    * (trigrams of event_type per user in time order) — funnel discovery
    * as opposed to q70's funnel measurement. Two lead() calls in ONE
    * window pass build the trigram, a hash agg counts paths, and the
    * top-k is rank-on-count with a full lexicographic tiebreak so equal
    * counts cannot reorder across engines. */
  val PathTopK = 20
  def eventPathsSql: String = s"""
    WITH t AS (
      SELECT event_type AS e1,
        lead(event_type, 1) OVER w AS e2,
        lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (
      SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path, count(1) AS n
      FROM t WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY e1 || ' > ' || e2 || ' > ' || e3)
    SELECT path, n FROM paths
    ORDER BY n DESC, path LIMIT $PathTopK"""

  def eventPaths(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(eventPathsSql)
  }

  // ---------------------------------------------------------------- q120
  /** χ² test of independence between two categoricals over the FULL
    * r×c grid (marginals cross-joined, observed counts left-joined so
    * zero cells contribute correctly) — the significance companion to
    * q111's PMI. Everything is reductions of one joint histogram;
    * expected counts and per-cell contributions are computed on
    * identical values in both engines and bridged at 1e-9 before the
    * order-nondeterministic total. Output is per-cell with the cell's
    * contribution, so the χ² statistic is the checkable column sum. */
  def chiSquareSql(table: String): String = s"""
    WITH j AS (
      SELECT o_orderpriority AS r, o_orderstatus AS c, count(1) AS o
      FROM $table GROUP BY o_orderpriority, o_orderstatus),
    rt AS (SELECT r, CAST(sum(o) AS BIGINT) AS nr FROM j GROUP BY r),
    ct AS (SELECT c, CAST(sum(o) AS BIGINT) AS nc FROM j GROUP BY c),
    n AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM j),
    grid AS (
      SELECT rt.r, ct.c, coalesce(j.o, 0) AS o,
        CAST(rt.nr AS DOUBLE) * CAST(ct.nc AS DOUBLE) / n.n AS e
      FROM rt CROSS JOIN ct CROSS JOIN n
      LEFT JOIN j ON j.r = rt.r AND j.c = ct.c)
    SELECT r, c, CAST(o AS BIGINT) AS observed,
      ${droundSql("e", 6)} AS expected,
      ${droundSql("(CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e", 9)}
        AS chi2_contrib
    FROM grid
    ORDER BY r, c"""

  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(chiSquareSql("orders"))
  }

  // ---------------------------------------------------------------- q121
  /** Gini coefficient of customer revenue concentration — the "how
    * skewed is my corpus/revenue" scalar every mixture audit wants.
    * Computed from the rank formulation G = Σ(2i−n−1)·x₍ᵢ₎ / (n·Σx)
    * on EXACT integers: cents sums, a global rank with custkey
    * tiebreak, and a decimal numerator — the only fp is the final
    * division of identical integers. The ORACLE ranks with a global
    * `row_number()` window; the Spark plan must NOT (empty-partition
    * window = single-task sort) — [[gini]] gets the identical rank from
    * [[DistributedRank]]'s range-partitioned two-pass scheme, same
    * formula, same oracle. */
  def giniBaseSql(table: String): String = s"""
    SELECT o_custkey,
      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
    FROM $table GROUP BY o_custkey"""

  def giniSql(table: String): String = s"""
    WITH c AS (${giniBaseSql(table)}),
    rk AS (
      SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS i
      FROM c),
    nn AS (
      SELECT CAST(count(1) AS BIGINT) AS n,
        CAST(sum(CAST(x AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx
      FROM c),
    num AS (
      SELECT CAST(sum(CAST(2 * i - nn.n - 1 AS DECIMAL(19,0)) * x)
        AS DECIMAL(38,0)) AS g
      FROM rk CROSS JOIN nn)
    SELECT nn.n AS n_customers,
      CAST(nn.sx AS BIGINT) AS total_cents,
      ${droundSql("CAST(num.g AS DOUBLE) / " +
        "(CAST(nn.n AS DOUBLE) * CAST(nn.sx AS DOUBLE))", 9)} AS gini
    FROM num CROSS JOIN nn"""

  def gini(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    val c = graft.core.EngineCache.persisted(spark.sql(giniBaseSql("orders")))
    val st = c.agg(count(lit(1)),
      min("x").cast("double"), max("x").cast("double")).first()
    val n = st.getLong(0)
    val rk = DistributedRank.rankOnlyBounded(
      c, "i", "x", desc = false, st.getDouble(1), st.getDouble(2),
      col("x"), col("o_custkey"))
    rk.agg(
        sum((lit(2L) * col("i") - lit(n) - lit(1L)).cast(DecimalType(19, 0)) *
            col("x"))
          .cast(DecimalType(38, 0)).as("g"),
        sum(col("x").cast(DecimalType(19, 0)))
          .cast(DecimalType(38, 0)).as("sx"))
      .select(
        lit(n).as("n_customers"),
        col("sx").cast("long").as("total_cents"),
        dround(col("g").cast("double") /
          (lit(n).cast("double") * col("sx").cast("double")), 9).as("gini"))
  }

  // ---------------------------------------------------------------- q122
  /** Monthly seasonal index of revenue (month total ÷ mean month) — the
    * calendar-effects profile used to spot ingest gaps and demand
    * cycles. Integer cents throughout; one hash agg plus a 12-row
    * reduction. */
  def seasonalSql(table: String): String = s"""
    WITH m AS (
      SELECT CAST(month(o_orderdate) AS INT) AS month,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM $table GROUP BY month(o_orderdate)),
    t AS (SELECT CAST(sum(cents) AS BIGINT) AS total,
            CAST(count(1) AS BIGINT) AS nm FROM m)
    SELECT month, cents,
      ${droundSql("CAST(cents AS DOUBLE) / " +
        "(CAST(total AS DOUBLE) / CAST(nm AS DOUBLE))", 6)} AS seasonal_index
    FROM m CROSS JOIN t
    ORDER BY month"""

  def seasonal(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(seasonalSql("orders"))
  }

  // ------------------------------------------------------------ wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_scd2"          -> scd2 _,
    "q103_sparse_cosine" -> sparseCosine _,
    "q104_pagerank"      -> pageRank _,
    "q105_pq_encode"     -> pqEncode _,
    "q106_attribution"   -> attribution _,
    "q107_pq_adc_topk"   -> pqAdcSearch _,
    "q169_ann_recall"    -> annRecallAudit _,
    "q170_emb_pca"       -> embPca _,
    "q181_emb_pca2"      -> embPca2 _,
    "q172_emb_abtt"      -> embAbtt _,
    "q108_merge_upsert"  -> mergeUpsert _,
    "q109_star_flatten"  -> starFlatten _,
    "q110_data_quality"  -> dataQuality _,
    "q111_mutual_info"   -> mutualInfo _,
    "q112_twap"          -> twap _,
    "q113_assoc_rules"   -> assocRules _,
    "q114_skyline"       -> skyline _,
    "q115_triangles"     -> triangles _,
    "q116_ab_test"       -> abTest _,
    "q117_rfm"           -> rfm _,
    "q118_event_paths"   -> eventPaths _,
    "q119_ivfpq_search"  -> ivfPqSearch _,
    "q146_ivfpq_serve"   -> ivfPqServe _,
    "q151_ivfpq_append"  -> ivfPqAppend _,
    "q193_ann_rerank"    -> annRerank _,
    "q153_jl_distortion" -> jlDistortion _,
    "q154_emb_drift"     -> embDrift _,
    "q120_chi_square"    -> chiSquare _,
    "q121_gini"          -> gini _,
    "q122_seasonal"      -> seasonal _,
    "q149_hits"          -> hits _
  )

  val oracles: Map[String, String] = Map(
    "q102_scd2" -> scd2Sql("orders", "TIMESTAMP '9999-12-31 00:00:00'"),
    "q103_sparse_cosine" -> sparseCosineSql(
      s"SELECT doc_id, unnest(${wordsSql("text")}) AS term FROM documents"),
    "q104_pagerank" -> pageRankSql("lineitem", PrIters),
    "q105_pq_encode" -> pqOracleSql,
    "q106_attribution" -> attributionSql("epoch_ms(ts)"),
    "q107_pq_adc_topk" -> s"WITH $pqBaseOracle $pqAdcTail",
    "q169_ann_recall" -> annRecallAuditOracleSql,
    "q170_emb_pca" -> embPcaOracleSql,
    "q181_emb_pca2" -> embPca2OracleSql,
    "q172_emb_abtt" -> embAbttOracleSql,
    "q108_merge_upsert" -> mergeUpsertSql("customer"),
    "q109_star_flatten" -> starFlattenSql(centsRound),
    "q110_data_quality" -> dataQualitySql,
    "q111_mutual_info" -> mutualInfoSql("lineitem"),
    "q112_twap" -> twapSql("epoch_ms(ts)"),
    "q113_assoc_rules" -> assocRulesSql("lineitem"),
    "q114_skyline" -> skylineOracleSql,
    "q115_triangles" -> trianglesSql("lineitem"),
    "q116_ab_test" -> abTestSql(xhashSql("'ab:' || user_id::VARCHAR")),
    "q117_rfm" -> rfmSql((from, to) => s"datediff('day', $from, $to)"),
    "q118_event_paths" -> eventPathsSql,
    "q119_ivfpq_search" -> s"WITH $pqBaseOracle $pqIvfAdcTail",
    // q146 serves from the at-rest code index; the oracle recomputes the
    // whole q119 pipeline — hash equality proves the index is lossless
    "q146_ivfpq_serve" -> s"WITH $pqBaseOracle $pqIvfAdcTail",
    // q151 appends batch codes to the at-rest base index; the oracle is
    // again the full q119 recompute — append ∘ store ≡ rebuild
    "q151_ivfpq_append" -> s"WITH $pqBaseOracle $pqIvfAdcTail",
    // q193 retrieves from the at-rest codes and reranks from the
    // embedding table; the oracle replays both stages off a live encode
    "q193_ann_rerank" -> annRerankOracleSql,
    "q153_jl_distortion" -> jlDistortionSql,
    "q154_emb_drift" -> embDriftSql,
    "q120_chi_square" -> chiSquareSql("orders"),
    "q121_gini" -> giniSql("orders"),
    "q122_seasonal" -> seasonalSql("orders"),
    "q149_hits" -> hitsSql(HitsIters)
  )
}
