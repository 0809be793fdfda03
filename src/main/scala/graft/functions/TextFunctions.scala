package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines.
  *
  * Everything here is built from `org.apache.spark.sql.functions._`
  * (codegen'd, no UDFs) so the expressions stay inside whole-stage
  * codegen and are exactly reproducible by an external SQL oracle.
  */
object TextFunctions {

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), " +")).cast("long")

  /** BPE-ish token count: letter runs, single digits, punctuation marks —
    * the shape of a byte-pair pre-tokenizer's coarse split.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]")).cast("long")

  val StopwordsEn = "the|a|of|and|to|in|is"
  val StopwordsDe = "der|die|das|und|ist"
  val StopwordsFr = "le|la|les|et|est"
  val StopwordsEs = "el|los|las|y|es"

  private def hits(text: Column, words: String): Column =
    regexp_count(text, lit(s"\\b($words)\\b"))

  /** Deterministic n-gram/stopword language-ID heuristic. CJK characters
    * short-circuit to `zh`; otherwise the highest stopword-hit count wins
    * with a fixed en>de>fr>es tiebreak.
    */
  def langId(text: Column): Column = {
    val zh = regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]"))
    val en = hits(text, StopwordsEn)
    val de = hits(text, StopwordsDe)
    val fr = hits(text, StopwordsFr)
    val es = hits(text, StopwordsEs)
    when(zh > 0, "zh")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Alphabetic / punctuation character counts. */
  def alphaCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]")).cast("long")
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^a-zA-Z0-9\\s]")).cast("long")
  def stopwordCount(text: Column): Column =
    hits(text, StopwordsEn).cast("long")

  /** Polynomial rolling hash over the document's characters:
    * `h = fold(h*31 + codepoint mod 1e9+7)` — the native `graft_rollhash`
    * expression (callers must have run `GraftFunctions.register` /
    * the `graft.GraftExtensions` injector). Semantics identical to the
    * interpreted HOF `aggregate(regexp_extract_all(text, '.'), 0L,
    * (acc, c) -> (acc*31 + ascii(c)) % 1000000007)`.
    */
  def rollingHash(text: Column): Column =
    call_function("graft_rollhash", text)

  /** Canonical md5 fingerprint of whitespace-normalized lowercase text. */
  def md5Fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))
}
