package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ArrayType(FloatType)`).
  *
  * Two tiers, as a large-scale pipeline needs both:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) probe
  *    set against the full corpus scan; per-probe heap via a row_number
  *    window. The 100 TB-side table is scanned once, never shuffled.
  *  - [[ivfTopK]]: IVF-style partition pruning — vectors are pre-assigned
  *    to coarse cells (here the fixture's `label`; in production, k-means
  *    cell ids computed offline); a probe only scans its own cell(s), i.e.
  *    the classic inverted-file trade of recall for a ~cells× scan cut.
  *    Cell assignment is a partition column at rest → Spark partition
  *    pruning eliminates the other cells' files entirely.
  *
  * Dot products run in double via a sequential `aggregate` fold (same
  * order as the oracle's list_sum) and are rounded to 6dp before ranking
  * so rank ties are impossible to split differently across engines
  * (vec_id breaks exact ties).
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double,
    * rounded to 6dp via the cross-engine half-up (Determinism.dround).
    * Uses the native codegen'd [[graft.functions.CosineSimilarity]] kernel
    * (identical arithmetic order to [[cosineExprComposable]] — asserted in
    * PlanSpec — so oracle hashes are unchanged). Callers must have run
    * [[graft.functions.GraftFunctions.register]] on the session. */
  def cosineExpr(a: String, b: String): String =
    s"floor(cosine_sim($a, $b) * 1e6 + 0.5) / 1e6"

  /** The built-ins-only form of [[cosineExpr]]'s kernel (zip_with +
    * aggregate lambdas) — kept as the reference implementation the native
    * expression is verified against. */
  def cosineExprComposable(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), " +
        s"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    def norm(x: String) =
      s"sqrt(aggregate(transform($x, p -> CAST(p AS DOUBLE) * CAST(p AS DOUBLE)), " +
        s"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    s"floor((${dot(a, b)} / (${norm(a)} * ${norm(b)})) * 1e6 + 0.5) / 1e6"
  }

  def cosineSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, len($x) + 1), i -> ($x)[i]::DOUBLE * ($y)[i]::DOUBLE))"
    def norm(x: String) =
      s"sqrt(list_sum(list_transform($x, p -> p::DOUBLE * p::DOUBLE)))"
    s"floor((${dot(a, b)} / (${norm(a)} * ${norm(b)})) * 1e6 + 0.5) / 1e6"
  }

  /** Exact brute-force cosine top-k for a probe subset.
    *
    * The probes broadcast against one corpus scan; ranking is a bounded
    * top-k `Aggregator` ([[graft.functions.VectorAggregates.TopKAgg]]),
    * NOT a row_number window: partial aggregation reduces each scan
    * partition to ≤ k candidates per query map-side, so the exchange
    * carries O(queries × partitions × k) rows — a window would shuffle
    * every probes×corpus scored row first. Same total order
    * (cos DESC, cand_id ASC), identical output. */
  def bruteForceTopK(vectors: DataFrame, probeFilter: Column, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val probes = vectors.filter(probeFilter)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = vectors.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    broadcast(probes)
      .join(corpus, col("query_id") =!= col("cand_id"))
      .withColumn("cos", expr(cosineExpr("qv", "cv")))
      .groupBy(col("query_id"))
      .agg(graft.functions.VectorAggregates
        .topKOf(k, col("cos"), col("cand_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("query_id"), (col("i") + 1).cast("int").as("rnk"),
        col("s.cand_id").as("cand_id"), col("s.cos").as("cos"))
  }

  def bruteForceTopKSql(table: String, probeWhere: String, k: Int): String = s"""
    WITH v AS (SELECT vec_id, embedding FROM $table),
    p AS (SELECT vec_id AS query_id, embedding AS qv FROM v WHERE $probeWhere),
    scored AS (
      SELECT query_id, vec_id AS cand_id, ${cosineSql("qv", "embedding")} AS cos
      FROM p JOIN v ON query_id <> vec_id),
    ranked AS (
      SELECT query_id, cand_id, cos,
        (row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id))::INT AS rnk
      FROM scored)
    SELECT query_id, rnk, cand_id, cos FROM ranked WHERE rnk <= $k
    ORDER BY query_id, rnk"""

  /** IVF-style ANN: search only the probe's own coarse cell. */
  def ivfTopK(vectors: DataFrame, cellCol: String, probeFilter: Column, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val probes = vectors.filter(probeFilter)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col(cellCol).as("qcell"))
    val corpus = vectors.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      col(cellCol).as("ccell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    broadcast(probes)
      .join(corpus, col("qcell") === col("ccell") && col("query_id") =!= col("cand_id"))
      .withColumn("cos", expr(cosineExpr("qv", "cv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("qcell").as("cell"), col("rnk"), col("cand_id"), col("cos"))
  }

  def ivfTopKSql(table: String, cellCol: String, probeWhere: String, k: Int): String = s"""
    WITH v AS (SELECT vec_id, embedding, $cellCol AS cell FROM $table),
    p AS (SELECT vec_id AS query_id, embedding AS qv, cell AS qcell FROM v WHERE $probeWhere),
    scored AS (
      SELECT query_id, qcell AS cell, vec_id AS cand_id,
        ${cosineSql("qv", "embedding")} AS cos
      FROM p JOIN v ON qcell = v.cell AND query_id <> vec_id),
    ranked AS (
      SELECT query_id, cell, cand_id, cos,
        (row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id))::INT AS rnk
      FROM scored)
    SELECT query_id, cell, rnk, cand_id, cos FROM ranked WHERE rnk <= $k
    ORDER BY query_id, rnk"""

  /** Near-duplicate pairs by embedding cosine within a blocking cell —
    * the embedding-space analog of LSH dedup. */
  def cosineNearDupPairs(vectors: DataFrame, cellCol: String, tau: Double): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val a = vectors.select(col("vec_id").as("id_a"), col("embedding").as("va"),
      col(cellCol).as("cell_a"))
    val b = vectors.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      col(cellCol).as("cell_b"))
    a.join(b, col("cell_a") === col("cell_b") && col("id_a") < col("id_b"))
      .withColumn("cos", expr(cosineExpr("va", "vb")))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  def cosineNearDupPairsSql(table: String, cellCol: String, tau: Double): String = s"""
    WITH v AS (SELECT vec_id, embedding, $cellCol AS cell FROM $table)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      ${cosineSql("a.embedding", "b.embedding")} AS cos
    FROM v a JOIN v b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE ${cosineSql("a.embedding", "b.embedding")} >= $tau
    ORDER BY id_a, id_b"""

  /** Real IVF cell assignment — the step the fixture's `label` column
    * stood in for: each vector goes to its nearest centroid by cosine
    * (one Lloyd assignment step; iterate for full k-means). Centroids are
    * the deterministic per-cell means of [[centroids]] re-assembled into
    * float arrays (float cast is exact IEEE round-to-nearest in both
    * engines), BROADCAST against one corpus scan — k centroids vs 100 TB
    * of vectors never shuffles the corpus. The argmax is the bounded
    * top-1 `Aggregator` (map-side partials), not a row_number window;
    * ties break toward the lower cell id. */
  def ivfAssign(vectors: DataFrame, cellCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val centArr = centroids(vectors, cellCol)
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, centroid))), " +
        "s -> CAST(s.centroid AS FLOAT))").as("cv"))
    vectors.select(col("vec_id"), col("embedding"))
      .join(broadcast(centArr))
      .withColumn("cos", expr(cosineExpr("embedding", "cv")))
      .groupBy(col("vec_id"))
      .agg(graft.functions.VectorAggregates
        .topKOf(1, col("cos"), col("cell").cast("long")).as("top"))
      .select(col("vec_id"), col("top")(0).getField("cand_id").as("cell"),
        col("top")(0).getField("cos").as("cos"))
  }

  def ivfAssignSql(table: String, cellCol: String): String = s"""
    WITH exploded AS (
      SELECT $cellCol AS cell,
        (unnest(range(1, len(embedding) + 1)) - 1)::INT AS dim,
        unnest(embedding) AS v
      FROM $table),
    cent AS (
      SELECT cell, dim, ${graft.core.Determinism.avgSql("v::DOUBLE", 8)} AS c
      FROM exploded GROUP BY cell, dim),
    centarr AS (
      SELECT cell, list_transform(list(c ORDER BY dim), x -> x::FLOAT) AS cv
      FROM cent GROUP BY cell),
    scored AS (
      SELECT vec_id, cell, ${cosineSql("embedding", "cv")} AS cos
      FROM $table, centarr),
    ranked AS (
      SELECT vec_id, cell, cos,
        row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell) AS rn
      FROM scored)
    SELECT vec_id, cell::BIGINT AS cell, cos FROM ranked WHERE rn = 1
    ORDER BY vec_id"""

  /** Per-cell centroids: posexplode the vectors, average per (cell, dim).
    * Output exploded (cell, dim, value) — the offline step that would feed
    * real IVF cell assignment. Exact decimal mean via Determinism.davg. */
  def centroids(vectors: DataFrame, cellCol: String): DataFrame =
    vectors
      .select(col(cellCol).as("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("cell"), col("dim"))
      .agg(graft.core.Determinism.davg(col("v").cast("double"), 8).as("centroid"))

  def centroidsSql(table: String, cellCol: String): String = s"""
    WITH exploded AS (
      SELECT $cellCol AS cell,
        (unnest(range(1, len(embedding) + 1)) - 1)::INT AS dim,
        unnest(embedding) AS v
      FROM $table)
    SELECT cell, dim, ${graft.core.Determinism.avgSql("v::DOUBLE", 8)} AS centroid
    FROM exploded
    GROUP BY 1, 2
    ORDER BY cell, dim"""
}
