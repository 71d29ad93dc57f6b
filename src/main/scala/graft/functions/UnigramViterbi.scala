package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The q257 unigram-LM Viterbi as ONE native kernel (SURVEY.md §7.3
  * tier (b)). The per-word DP is bounded (≤ maxWord positions ×
  * maxPiece lengths), so the first cut — forward/backward tables as
  * unrolled DataFrame expressions over a per-word cost map — was
  * correct but paid for its plan, not its data: ~26 chained Projects
  * of greatest/try_element_at trees per EM round cost Catalyst
  * seconds of analysis + janino compile per run (the fixture has 31
  * distinct words; ALL the time was plan-side). This expression
  * replaces the whole DP with one imperative pass per word, shrinking
  * the plan to `explode(unigram_viterbi(w))` while keeping the
  * arithmetic integer-identical to the DuckDB oracle's unrolled CTEs:
  *
  *  - cost(pos, l) = l6(piece) * costScale +
  *      pmod(md5i64(piece || '@' || pos), pertMod)  — [[HashKernels
  *      .md5i64]] IS `conv(substr(md5(s), 1, 15), 16, 10)`, the
  *      engine-pinned cross-engine hash, so tie-breaks match bit-wise;
  *  - f(k) / g(j) forward/backward best-prefix/suffix maxima over
  *    Long, null branches skipped exactly like the oracle's
  *    UNION-ALL-of-existing-branches + max;
  *  - a cell is on the optimal path iff f(pos) + cost + g(suffix)
  *    equals f(wl + 1), every qualifying cell emitted (both engines
  *    mark all co-optimal paths identically);
  *  - returns NULL (→ the [UNK] protocol) for words longer than
  *    maxWord or with no reachable segmentation.
  *
  * The piece→l6 table rides the expression as a constructor constant:
  * it is O(alphabet + topN) rows by construction (every single char +
  * the topN multi-char pieces), the same bounded-relation-collect
  * contract as wordpieceFrozenOf's vocab. */
object UnigramViterbiKernel {

  private def pmod(x: Long, m: Long): Long = ((x % m) + m) % m

  /** On-path cells of the Viterbi-best segmentation of `w`, or null
    * for the [UNK] protocol. One allocation-light pass per word. */
  def run(w: UTF8String, probs: java.util.HashMap[UTF8String, java.lang.Long],
          maxWord: Int, maxPiece: Int, costScale: Long,
          pertMod: Long): ArrayData = {
    val wl = w.numChars()
    if (wl > maxWord || wl == 0) return null
    val L = maxPiece
    // cost(pos, l) at index (pos - 1) * L + (l - 1); MinValue = absent
    val cost = new Array[Long](wl * L)
    val pieces = new Array[UTF8String](wl * L)
    java.util.Arrays.fill(cost, Long.MinValue)
    var pos = 1
    while (pos <= wl) {
      var l = 1
      val lMax = math.min(L, wl - pos + 1)
      while (l <= lMax) {
        val piece = w.substringSQL(pos, l)
        val l6 = probs.get(piece)
        if (l6 != null) {
          val tag = UTF8String.fromString(piece.toString + "@" + pos)
          cost((pos - 1) * L + (l - 1)) =
            l6.longValue() * costScale + pmod(HashKernels.md5i64(tag), pertMod)
          pieces((pos - 1) * L + (l - 1)) = piece
        }
        l += 1
      }
      pos += 1
    }
    // forward: f(k) = best cost covering chars [1, k - 1]
    val f = new Array[Long](wl + 2)
    val fr = new Array[Boolean](wl + 2)
    fr(1) = true
    var k = 2
    while (k <= wl + 1) {
      var best = Long.MinValue
      var reach = false
      var l = math.min(L, k - 1)
      while (l >= 1) {
        val c = cost((k - l - 1) * L + (l - 1))
        if (fr(k - l) && c != Long.MinValue) {
          val cand = f(k - l) + c
          if (!reach || cand > best) { best = cand; reach = true }
        }
        l -= 1
      }
      f(k) = best; fr(k) = reach
      k += 1
    }
    if (!fr(wl + 1)) return null
    val ts = f(wl + 1)
    // backward: g(j) = best cost covering the last j chars
    val g = new Array[Long](wl + 1)
    val gr = new Array[Boolean](wl + 1)
    gr(0) = true
    var j = 1
    while (j <= wl) {
      var best = Long.MinValue
      var reach = false
      var l = math.min(L, j)
      while (l >= 1) {
        val p = wl - j + 1 // piece covers [p, p + l - 1], tail j - l left
        val c = cost((p - 1) * L + (l - 1))
        if (gr(j - l) && c != Long.MinValue) {
          val cand = g(j - l) + c
          if (!reach || cand > best) { best = cand; reach = true }
        }
        l -= 1
      }
      g(j) = best; gr(j) = reach
      j += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    pos = 1
    while (pos <= wl) {
      var l = 1
      val lMax = math.min(L, wl - pos + 1)
      while (l <= lMax) {
        val c = cost((pos - 1) * L + (l - 1))
        val tail = wl - pos - l + 1
        if (c != Long.MinValue && fr(pos) && gr(tail) &&
            f(pos) + c + g(tail) == ts)
          out += InternalRow(pos, l, pieces((pos - 1) * L + (l - 1)))
        l += 1
      }
      pos += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `unigram_viterbi(word)` with a baked-in piece→l6 table: array of
  * (pos, l, piece) cells on the Viterbi-optimal segmentation path,
  * NULL for [UNK] words. See [[UnigramViterbiKernel]]. */
case class UnigramViterbi(child: Expression, probs: Map[String, Long],
                          maxWord: Int, maxPiece: Int,
                          costScale: Long, pertMod: Long)
    extends UnaryExpression {
  @transient private lazy val table = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](probs.size * 2)
    probs.foreach { case (p, l6) => m.put(UTF8String.fromString(p), l6) }
    m
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("l", IntegerType, nullable = false),
    StructField("piece", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "unigram_viterbi"
  override def nullSafeEval(a: Any): Any =
    UnigramViterbiKernel.run(a.asInstanceOf[UTF8String], table,
      maxWord, maxPiece, costScale, pertMod)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugProbs", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UnigramViterbiKernel.run(
        $c, $ref, $maxWord, $maxPiece, ${costScale}L, ${pertMod}L);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }
  override protected def withNewChildInternal(nc: Expression): UnigramViterbi =
    copy(child = nc)
}
