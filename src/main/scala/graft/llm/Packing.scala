package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Input row for [[Packing.packGreedy]]: one document with its token count,
  * routed to a (lang, shard) packing group. */
case class PackInput(lang: String, shard: Int, doc_id: Long, n_tokens: Int)

/** One packed document: which pack it landed in within its (lang, shard)
  * group, its position inside the pack, and the pack's running fill. */
case class PackedDoc(lang: String, shard: Int, doc_id: Long, n_tokens: Int,
                     pack_id: Int, pack_pos: Int, pack_fill: Int)

/** Greedy sequence packing — the training-data step that bins documents
  * into fixed-capacity context windows (e.g. 2048/4096 tokens) so a
  * trainer wastes no padding. The reference archives raw records and has
  * no notion of tokens (kafka.clj:58 passes value bytes through); this is
  * part of the analytics layer built over that archive.
  *
  * Packing is inherently sequential — pack N's contents depend on every
  * prior document — so the scale lever is the GROUP, not the fold: docs
  * are routed to (lang, doc_id % shards) groups and each group packs
  * independently in one task via `flatMapSortedGroups` (sorted-group fold,
  * no driver involvement, no whole-corpus sort). At 100 TB you raise
  * `shards` until each group fits a task; determinism holds because group
  * membership and intra-group order depend only on (lang, doc_id).
  *
  * Rule: a document starts a new pack iff it does not fit
  * (`fill + n_tokens > capacity`) and the pack is non-empty — so an
  * oversize document occupies exactly one pack by itself rather than
  * cascading empties. The DuckDB oracle replays the same fold as a
  * recursive CTE over the per-group `row_number` order.
  */
object Packing {

  def packGreedy(docs: DataFrame, idCol: String, textCol: String,
                 langCol: String, capacity: Int, shards: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val prepared = docs.select(
        col(langCol).as("lang"),
        // sign-preserving % to mirror the oracle's `%` exactly (pmod would
        // silently route negative ids to a different group than DuckDB)
        (col(idCol) % shards).cast("int").as("shard"),
        col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokenCount(textCol).cast("int").as("n_tokens"))
      .as[PackInput]
    prepared
      .groupByKey(r => (r.lang, r.shard))
      .flatMapSortedGroups($"doc_id") { case ((lang, shard), it) =>
        var pack = 0
        var fill = 0
        var pos = 0
        it.map { r =>
          if (fill > 0 && fill + r.n_tokens > capacity) {
            pack += 1; fill = 0; pos = 0
          }
          fill += r.n_tokens
          pos += 1
          PackedDoc(lang, shard, r.doc_id, r.n_tokens, pack, pos, fill)
        }
      }
      .toDF()
  }

  /** DuckDB oracle: same greedy fold as a recursive CTE stepping through
    * the per-(lang, shard) `row_number` order. The recursion advances all
    * groups in lockstep, one document per step. */
  def packGreedySql(table: String, idCol: String, textCol: String,
                    langCol: String, capacity: Int, shards: Int,
                    orderBy: String): String = s"""
    WITH RECURSIVE d AS (
      SELECT $langCol AS lang, ($idCol % $shards)::INT AS shard,
        $idCol AS doc_id, ${TextFunctions.tokenCountSql(textCol)} AS n_tokens,
        row_number() OVER (PARTITION BY $langCol, $idCol % $shards
          ORDER BY $idCol) AS rn
      FROM $table),
    p(lang, shard, doc_id, n_tokens, rn, pack_id, pack_pos, pack_fill) AS (
      SELECT lang, shard, doc_id, n_tokens, rn, 0, 1, n_tokens
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.lang, d.shard, d.doc_id, d.n_tokens, d.rn,
        CASE WHEN p.pack_fill + d.n_tokens > $capacity
             THEN p.pack_id + 1 ELSE p.pack_id END,
        CASE WHEN p.pack_fill + d.n_tokens > $capacity
             THEN 1 ELSE p.pack_pos + 1 END,
        CASE WHEN p.pack_fill + d.n_tokens > $capacity
             THEN d.n_tokens ELSE p.pack_fill + d.n_tokens END
      FROM p JOIN d ON d.lang = p.lang AND d.shard = p.shard
                   AND d.rn = p.rn + 1)
    SELECT lang, shard, doc_id, n_tokens,
      pack_id::INT AS pack_id, pack_pos::INT AS pack_pos,
      pack_fill::INT AS pack_fill
    FROM p ORDER BY $orderBy"""
}
