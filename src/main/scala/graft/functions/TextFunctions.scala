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

  /** One-pass `[alpha, punct, stop_en, stop_de, stop_fr, stop_es, zh]`
    * counts via the native `graft_text_stats` kernel (callers must
    * have run `GraftFunctions.register` / the `graft.GraftExtensions`
    * injector) — every signal below indexes this ONE call, and
    * whole-stage codegen's subexpression elimination evaluates the
    * kernel once per row even when several signals appear in the same
    * projection. Regex-parity is fuzz-spec'd against the `*Re`
    * formulations kept below.
    */
  def textStats(text: Column): Column = call_function("graft_text_stats", text)

  /** Deterministic n-gram/stopword language-ID heuristic. CJK characters
    * short-circuit to `zh`; otherwise the highest stopword-hit count wins
    * with a fixed en>de>fr>es tiebreak. One kernel pass instead of five
    * regexp scans; [[langIdRe]] is the interpreted reference.
    */
  def langId(text: Column): Column = {
    val st = textStats(text)
    val en = st.getItem(2); val de = st.getItem(3)
    val fr = st.getItem(4); val es = st.getItem(5)
    when(st.getItem(6) > 0, "zh")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Regexp reference formulation of [[langId]] (spec cross-check). */
  private[graft] def langIdRe(text: Column): Column = {
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

  /** Alphabetic / punctuation / stopword counts — kernel-backed, with
    * the regexp reference formulations kept for the parity fuzz.
    */
  def alphaCount(text: Column): Column = textStats(text).getItem(0)
  def punctCount(text: Column): Column = textStats(text).getItem(1)
  def stopwordCount(text: Column): Column = textStats(text).getItem(2)
  private[graft] def alphaCountRe(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]")).cast("long")
  private[graft] def punctCountRe(text: Column): Column =
    regexp_count(text, lit("[^a-zA-Z0-9\\s]")).cast("long")
  private[graft] def stopwordCountRe(text: Column): Column =
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
