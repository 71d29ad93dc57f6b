package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr
import graft.core.Determinism.xhashSql

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, language-ID, quality signals, fingerprints.
  *
  * Every builder takes a SQL expression string (usually a column name) and
  * returns a Spark `Column` via `expr` — pure SQL-function composition, so
  * execution is codegen'd and columnar with no UDFs; a 100 TB `documents`
  * scan stays inside whole-stage codegen. Each builder has a `*Sql` twin
  * producing the equivalent DuckDB SQL (used by the oracle declarations);
  * the pairs are adjacent so equivalence is reviewable.
  *
  * The reference never parses payloads at all (value bytes pass straight to
  * the baldr writer, kafka.clj:58) — this module is the analytics layer the
  * archive exists to serve.
  */
object TextFunctions {

  /** Whitespace tokenization. Spark SQL literal '\\s+' == regex \s+. */
  def wordsExpr(text: String): String = s"split(trim($text), '\\\\s+')"
  def wordsSql(text: String): String = s"regexp_split_to_array(trim($text), '\\s+')"
  def words(text: String): Column = expr(wordsExpr(text))

  def tokenCount(text: String): Column = expr(s"size(${wordsExpr(text)})")
  def tokenCountSql(text: String): String = s"len(${wordsSql(text)})::INT"

  /** BPE-ish subword segmentation count: runs of letters, digits, or single
    * punctuation — the standard pre-tokenizer regex shape. */
  def bpeTokenCount(text: String): Column =
    expr(s"size(regexp_extract_all($text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0))")
  def bpeTokenCountSql(text: String): String =
    s"len(regexp_extract_all($text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::INT"

  /** Word n-gram shingles (distinct) from an already-materialized words
    * ARRAY column `w` — pass a bare column name here. Inlining the split()
    * expression instead re-runs the regex split once per element_at inside
    * the interpreted lambda (~3n× per doc): materialize words first.
    * Spark arrays and DuckDB lists are both 1-indexed (element_at / l[i]). */
  def wordShinglesFromArrayExpr(w: String, n: Int): String = {
    val parts = (0 until n).map(j =>
      if (j == 0) s"element_at($w, i)" else s"element_at($w, i + $j)")
      .mkString(", ' ', ")
    // Guarded: sequence(1, 0) in Spark is a DESCENDING [1,0], not empty,
    // and ANSI element_at would then throw — short inputs get array().
    s"CASE WHEN size($w) >= $n THEN " +
      s"array_distinct(transform(sequence(1, size($w) - ${n - 1}), " +
      s"i -> concat($parts))) " +
      s"ELSE array_repeat('', 0) END"
  }

  /** Word n-gram shingles (distinct), the MinHash input unit. Prefer
    * [[wordShinglesFromArrayExpr]] over a pre-projected words column in
    * hot paths. */
  def wordShinglesExpr(text: String, n: Int = 3): String =
    wordShinglesFromArrayExpr(wordsExpr(text), n)
  def wordShingles(text: String, n: Int = 3): Column = expr(wordShinglesExpr(text, n))
  def wordShinglesSql(text: String, n: Int = 3): String = {
    val w = wordsSql(text)
    val parts = (0 until n).map(j =>
      if (j == 0) s"($w)[i]" else s"($w)[i + $j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, len($w) - ${n - 2}), i -> $parts))"
  }

  /** Character n-gram shingles (distinct). */
  def charShinglesExpr(text: String, n: Int = 4): String =
    s"CASE WHEN length($text) >= $n THEN " +
      s"array_distinct(transform(sequence(1, length($text) - ${n - 1}), " +
      s"i -> substr($text, i, $n))) ELSE array_repeat('', 0) END"
  def charShingles(text: String, n: Int = 4): Column = expr(charShinglesExpr(text, n))
  def charShinglesSql(text: String, n: Int = 4): String =
    s"list_distinct(list_transform(range(1, length($text) - ${n - 2}), i -> substr($text, i, $n)))"

  /** Punctuation count = chars removed by stripping punctuation. */
  def punctCount(text: String): Column =
    expr(s"length($text) - length(regexp_replace($text, '[\\\\p{Punct}]', ''))")
  def punctCountSql(text: String): String =
    s"(length($text) - length(regexp_replace($text, '[[:punct:]]', '', 'g')))::INT"

  /** Count of tokens found in a lexicon, duplicates counted (ratio
    * numerator — array_intersect's dedup would undercount). */
  def lexiconHits(text: String, lexicon: Seq[String]): Column = {
    val lex = lexicon.map(s => s"'$s'").mkString(", ")
    expr(s"size(filter(${wordsExpr(text)}, w -> w IN ($lex)))")
  }
  def lexiconHitsExpr(text: String, lexicon: Seq[String]): String = {
    val lex = lexicon.map(s => s"'$s'").mkString(", ")
    s"size(filter(${wordsExpr(text)}, w -> w IN ($lex)))"
  }
  def lexiconHitsSql(text: String, lexicon: Seq[String]): String = {
    val lex = lexicon.map(s => s"'$s'").mkString(", ")
    s"len(list_filter(${wordsSql(text)}, w -> w IN ($lex)))::INT"
  }

  /** Stopword lexicon shared by quality scoring and language ID. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Marker lexicons for the language-ID heuristic. On real corpora these
    * would be char-trigram profiles; markers keep the operator shape
    * (score per language → argmax) while staying SQL-portable. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "fast", "small"),
    "de" -> Seq("der", "und", "von", "merge", "window"),
    "es" -> Seq("el", "de", "la", "scan", "join"),
    "fr" -> Seq("le", "et", "la", "sort", "order"),
    "zh" -> Seq("spark", "hash", "group", "row", "value"))

  /** Language-ID: score each marker lexicon, take the first maximal
    * language in LangMarkers order (strictly-greater replaces ⇒ ties keep
    * the earlier entry — the same left fold in both engines). */
  def langId(text: String): Column = {
    val folded = LangMarkers.tail.foldLeft(
      (s"'${LangMarkers.head._1}'", lexiconHitsExpr(text, LangMarkers.head._2))) {
      case ((bestLang, bestScore), (lang, lex)) =>
        val s = lexiconHitsExpr(text, lex)
        (s"(CASE WHEN $s > $bestScore THEN '$lang' ELSE $bestLang END)",
          s"greatest($s, $bestScore)")
    }._1
    expr(folded)
  }
  def langIdSql(text: String): String =
    LangMarkers.tail.foldLeft(
      (s"'${LangMarkers.head._1}'", lexiconHitsSql(text, LangMarkers.head._2))) {
      case ((bestLang, bestScore), (lang, lex)) =>
        val s = lexiconHitsSql(text, lex)
        (s"(CASE WHEN $s > $bestScore THEN '$lang' ELSE $bestLang END)",
          s"greatest($s, $bestScore)")
    }._1

  /** Content fingerprint: cross-engine 60-bit hash of the exact text. */
  def contentFingerprint(text: String): Column =
    expr(graft.core.Determinism.xhashExpr(text))
  def contentFingerprintSql(text: String): String = xhashSql(text)

  /** Bag fingerprint: hash of the sorted distinct token set — clusters
    * reordered/duplicated-word variants (the fixture's planted near-dups). */
  def bagFingerprint(text: String): Column =
    expr(graft.core.Determinism.xhashExpr(
      s"array_join(array_sort(array_distinct(${wordsExpr(text)})), ' ')"))
  def bagFingerprintSql(text: String): String =
    xhashSql(s"array_to_string(list_sort(list_distinct(${wordsSql(text)})), ' ')")
}
