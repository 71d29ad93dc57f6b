package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the dedup hot path (SURVEY.md §7.3 tier (b)).
  *
  * The composable SQL forms (`transform(sh, s -> conv(substr(md5(s),…)))`,
  * k × `array_min(transform(hs, …))`) are correct but interpreted: Spark's
  * higher-order functions evaluate their lambda once per element outside
  * whole-stage codegen, and the k MinHash mixes re-walk the hash array k
  * times. At 100 TB the signature projection runs once per document — these
  * expressions fuse it into one digest pass + one k-way min pass per row,
  * all inside codegen.
  *
  * Bit-compatibility contract (asserted by DedupSpec): every kernel equals
  * its SQL form literally —
  *  - md5_i64(s)      == CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
  *                       (top 60 digest bits, unsigned)
  *  - minhash_sig i   == array_min(transform(hs, h -> (a_i*(h%P)+b_i) % P))
  *  - simhash16       == the 16 per-bit ±1-sum aggregates
  * so the DuckDB oracle (which keeps the SQL form) still matches bit-for-bit.
  */
object HashKernels {

  /** Mersenne prime 2^31-1: mix products stay < 2^62 (no int64 overflow). */
  val P = 2147483647L

  /** Affine mix constants for MinHash function i — fixed pseudo-random
    * multipliers, identical literals baked into the DuckDB oracle. */
  def mixConsts(i: Int): (Long, Long) = {
    val a = ((i * 2654435761L + 1000003L) % (P - 1)) + 1
    val b = (i * 40014L + 12345L) % P
    (a, b)
  }

  private val constCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]
  private def consts(k: Int): (Array[Long], Array[Long]) =
    constCache.computeIfAbsent(k, k => {
      val as = new Array[Long](k); val bs = new Array[Long](k)
      var i = 0
      while (i < k) { val (a, b) = mixConsts(i); as(i) = a; bs(i) = b; i += 1 }
      (as, bs)
    })

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(s) as unsigned int64: the top 60 digest
    * bits = first 8 bytes big-endian >>> 4. */
  def md5i64(s: UTF8String): Long = {
    val md = md5Local.get(); md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def md5i64Array(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = md5i64(arr.getUTF8String(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** md5i64 of (prefix || element), per element — equals
    * transform(arr, s -> md5_i64-of concat(prefix, s)) without the
    * interpreted per-element concat. */
  def md5i64ArrayPrefixed(arr: ArrayData, prefix: UTF8String): ArrayData = {
    if (prefix.numBytes() == 0) return md5i64Array(arr)
    val pb = prefix.getBytes
    val md = md5Local.get()
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(pb)
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = v >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }

  private val Space = UTF8String.fromString(" ")

  /** Distinct word n-gram shingles (space-joined) from a words array, in
    * first-occurrence order — equals array_distinct(transform(sequence(1,
    * size-n+1), i -> concat(w[i], ' ', …, w[i+n-1]))) with the empty-array
    * guard for short inputs. */
  def wordShingles(w: ArrayData, n: Int): ArrayData = {
    val m = w.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    val parts = new Array[UTF8String](2 * n - 1)
    var k = 1
    while (k < parts.length) { parts(k) = Space; k += 2 }
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { parts(2 * j) = w.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  /** Distinct character n-gram shingles in first-occurrence order —
    * equals array_distinct(transform(sequence(1, length-n+1),
    * i -> substr(s, i, n))) with the short-input guard. Character (not
    * byte) positions, matching substr(). One pass over the UTF-8 bytes
    * building a char→byte offset table — substringSQL per position would
    * re-scan from the start and make this O(L²) per document. */
  def charShingles(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // offsets(c) = byte offset of character c; offsets(numChars) = length
    val offsets = new Array[Int](bytes.length + 1)
    var nc = 0
    var off = 0
    while (off < bytes.length) {
      offsets(nc) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nc += 1
    }
    offsets(nc) = bytes.length
    val m = nc - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    var i = 0
    while (i < m) {
      seen.add(UTF8String.fromBytes(bytes, offsets(i), offsets(i + n) - offsets(i)))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  /** k MinHash minima over an int64 hash array, one pass over the array
    * (vs k interpreted array walks). Empty input yields Long.MaxValue
    * sentinels — callers filter empty shingle sets upstream, matching the
    * oracle's WHERE guard. */
  def minhashSig(hs: ArrayData, k: Int): ArrayData = {
    val (as, bs) = consts(k)
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hs.numElements()
    var j = 0
    while (j < n) {
      val hp = hs.getLong(j) % P
      var i = 0
      while (i < k) {
        val v = (as(i) * hp + bs(i)) % P
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** `bits`-wide SimHash over an int64 token-hash array: per bit, sum ±1
    * over all tokens (duplicates weighted), set the bit iff the sum is
    * positive. One array walk (vs `bits` interpreted aggregates). md5_i64
    * values carry 60 independent bits (15 hex chars), so bits ≤ 60. */
  def simhash(whs: ArrayData, bits: Int): Long = {
    val counts = new Array[Long](bits)
    val n = whs.numElements()
    var j = 0
    while (j < n) {
      val h = whs.getLong(j)
      var b = 0
      while (b < bits) { counts(b) += ((h >> b) & 1L) * 2L - 1L; b += 1 }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  def simhash16(whs: ArrayData): Long = simhash(whs, 16)

  /** Deterministic ±1 hyperplane components for SRP-LSH: sign(i, d) from
    * the parity of md5_i64("hp{i}:{d}") — a public, engine-independent
    * pseudo-random source, so the DuckDB oracle can carry the same table
    * as literals. Cached per (bits, dims). */
  private val srpCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]
  def srpSigns(bits: Int, dims: Int): Array[Array[Double]] =
    srpCache.computeIfAbsent((bits, dims), { case (b, dm) =>
      Array.tabulate(b, dm) { (i, d) =>
        if ((md5i64(UTF8String.fromString(s"hp$i:$d")) & 1L) == 1L) 1.0 else -1.0
      }
    })

  /** Signed-random-projection signature of a float vector: bit i is the
    * sign of the dot product with hyperplane i (±1 components from
    * [[srpSigns]]). P(bit agrees) = 1 − θ/π for angle θ, making Hamming
    * distance on SRP signatures an unbiased angle estimator — the
    * embedding-space analog of SimHash. Sums run in double over ascending
    * dims, matching the oracle's sequential list_sum exactly. */
  def srpSig(v: ArrayData, bits: Int): Long = {
    val dims = v.numElements()
    val signs = srpSigns(bits, dims)
    var sig = 0L
    var i = 0
    while (i < bits) {
      val row = signs(i)
      var acc = 0.0
      var d = 0
      while (d < dims) { acc += row(d) * v.getFloat(d); d += 1 }
      if (acc > 0) sig |= 1L << i
      i += 1
    }
    sig
  }
}

/** `md5_i64(array<string> [, prefix]) -> array<long>` — element-wise
  * cross-engine 60-bit hash of (prefix || element), codegen'd via a static
  * kernel call. The optional literal prefix implements seeded hash
  * families without a per-element concat. */
case class Md5I64Array(child: Expression, prefix: String = "")
    extends UnaryExpression {
  @transient private lazy val prefixU = UTF8String.fromString(prefix)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_i64"
  override def nullSafeEval(a: Any): Any =
    HashKernels.md5i64ArrayPrefixed(a.asInstanceOf[ArrayData], prefixU)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5Prefix", prefixU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.md5i64ArrayPrefixed($c, $ref)")
  }
  override protected def withNewChildInternal(nc: Expression): Md5I64Array =
    copy(child = nc)
}

/** `word_shingles(array<string>, n) -> array<string>` — distinct
  * space-joined word n-grams, fused (no interpreted transform/concat). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> and a positive literal n, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override def nullSafeEval(a: Any): Any =
    HashKernels.wordShingles(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.wordShingles($c, $n)")
  override protected def withNewChildInternal(nc: Expression): WordShingles =
    copy(child = nc)
}

/** `char_shingles(string, n) -> array<string>` — distinct character
  * n-grams, fused (no interpreted transform/substr). */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string and a positive literal n, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"
  override def nullSafeEval(a: Any): Any =
    HashKernels.charShingles(a.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.charShingles($c, $n)")
  override protected def withNewChildInternal(nc: Expression): CharShingles =
    copy(child = nc)
}

/** `minhash_sig(array<long>, k) -> array<long>` — the k MinHash minima in
  * one fused pass. k must be a literal (it parameterizes codegen). */
case class MinhashSig(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> and a positive literal k, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(a: Any): Any =
    HashKernels.minhashSig(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhashSig($c, $k)")
  override protected def withNewChildInternal(nc: Expression): MinhashSig =
    copy(child = nc)
}

/** `srp_sig(array<float>, bits) -> bigint` — signed-random-projection
  * signature (hyperplane LSH) in one fused pass; bits ≤ 60 so the oracle's
  * bit sum stays in int64. `bits` must be a literal. */
case class SrpSig(child: Expression, bits: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if bits > 0 && bits <= 60 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> and literal bits in 1..60, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_sig"
  override def nullSafeEval(a: Any): Any =
    HashKernels.srpSig(a.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.srpSig($c, $bits)")
  override protected def withNewChildInternal(nc: Expression): SrpSig =
    copy(child = nc)
}

/** `simhash(array<long>, bits) -> bigint` — `bits`-wide SimHash in one
  * pass (bits ≤ 60: md5_i64 hashes carry 60 independent bits). `bits`
  * must be a literal (it parameterizes codegen). */
case class Simhash(child: Expression, bits: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bits > 0 && bits <= 60 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> and literal bits in 1..60, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"
  override def nullSafeEval(a: Any): Any =
    HashKernels.simhash(a.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash($c, $bits)")
  override protected def withNewChildInternal(nc: Expression): Simhash =
    copy(child = nc)
}
