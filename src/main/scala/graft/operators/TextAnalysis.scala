package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Text analysis for training-data pipelines over `documents`:
  * quality scoring, token counting (whitespace + BPE-ish regex),
  * stopword-profile language ID, and document fingerprinting.
  *
  * Every metric is a pure column expression (whole-stage codegen, no
  * UDFs) so the same pipeline runs unchanged over 100 TB of text: one
  * scan, map-side expressions, one small aggregate at the end where the
  * query calls for it.
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "in",
    "on", "to", "is", "are", "was", "for", "with", "by", "at", "from")

  /** Per-document stats + a quality score:
    * quality = 0.4*stopword_ratio + 0.3*min(1, n_tokens/50) +
    *           0.3*(1 - punct_ratio). */
  def textStats(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = size(split(col("text"), " "))
    val stopHits = size(filter(split(col("text"), " "),
      t => t.isin(stopwords: _*)))
    val punct = length(col("text")) -
      length(regexp_replace(col("text"), "[\\.,;:!\\?]", ""))
    docs.select(
      col("doc_id"),
      toks.as("n_tokens"),
      round(stopHits.cast("double") / toks, 4).as("stop_ratio"),
      round(punct.cast("double") / length(col("text")), 4).as("punct_ratio"),
      round(
        lit(0.4) * (stopHits.cast("double") / toks) +
          lit(0.3) * least(lit(1.0), toks.cast("double") / 50) +
          lit(0.3) * (lit(1.0) - punct.cast("double") / length(col("text"))),
        4).as("quality"))
      .orderBy("doc_id")
  }

  /** Token counting, whitespace vs BPE-ish regex (word pieces +
    * punctuation as separate tokens), aggregated corpus-wide. */
  def tokenCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        size(split(col("text"), " ")).as("ws"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))
          .as("bpe"))
      .agg(
        sum("ws").as("ws_tokens"),
        sum("bpe").as("bpe_tokens"),
        round(avg("bpe"), 4).as("avg_bpe_per_doc"))

  /** Stopword-profile language ID (n-gram-free heuristic): score each
    * language by marker-word hits, predict the argmax (en beats de beats
    * fr on ties via the fixed comparison order). */
  def langId(s: SparkSession, d: String): DataFrame = {
    val markers = Map(
      "en" -> Seq("the", "and", "of", "is", "with"),
      "de" -> Seq("der", "die", "und", "ist", "mit"),
      "fr" -> Seq("le", "la", "et", "est", "avec"))
    def score(lang: String) =
      size(filter(split(col("text"), " "), t => t.isin(markers(lang): _*)))
    Tables.documents(s, d)
      .withColumn("s_en", score("en"))
      .withColumn("s_de", score("de"))
      .withColumn("s_fr", score("fr"))
      .withColumn("pred",
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_de") >= col("s_fr"), "de")
          .otherwise("fr"))
      .groupBy("pred", "lang")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("pred", "lang")
  }

  /** Content-defined fingerprint: md5 of the sorted distinct word set —
    * order-insensitive near-exact dedup key (the rolling/poly-hash
    * variants live in Dedup.simhash/minhashLsh). */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " ")))))
          .as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
      .agg(
        count(lit(1)).as("n_fingerprints"),
        sum(when(col("n_docs") > 1, col("n_docs") - 1).otherwise(0))
          .as("n_shadowed"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> (textStats _),
    "text_token_counts" -> (tokenCounts _),
    "text_lang_id" -> (langId _),
    "text_fingerprint" -> (fingerprint _))

  val oracles: Map[String, String] = Map(
    "text_stats" ->
      """WITH t AS (
           SELECT doc_id, text, len(string_split(text, ' ')) AS toks,
             len(list_filter(string_split(text, ' '),
               x -> list_contains(['the','a','an','and','or','of','in','on',
                 'to','is','are','was','for','with','by','at','from'], x)))
               AS stop_hits,
             length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g'))
               AS punct
           FROM documents)
         SELECT doc_id, toks AS n_tokens,
           round(CAST(stop_hits AS DOUBLE) / toks, 4) AS stop_ratio,
           round(CAST(punct AS DOUBLE) / length(text), 4) AS punct_ratio,
           round(0.4 * (CAST(stop_hits AS DOUBLE) / toks)
             + 0.3 * least(1.0, CAST(toks AS DOUBLE) / 50)
             + 0.3 * (1.0 - CAST(punct AS DOUBLE) / length(text)), 4) AS quality
         FROM t ORDER BY doc_id""",
    "text_token_counts" ->
      """SELECT sum(len(string_split(text, ' '))) AS ws_tokens,
           sum(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]'))) AS bpe_tokens,
           round(avg(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]'))), 4)
             AS avg_bpe_per_doc
         FROM documents""",
    "text_lang_id" ->
      """WITH sc AS (
           SELECT lang,
             len(list_filter(string_split(text, ' '),
               x -> list_contains(['the','and','of','is','with'], x))) AS s_en,
             len(list_filter(string_split(text, ' '),
               x -> list_contains(['der','die','und','ist','mit'], x))) AS s_de,
             len(list_filter(string_split(text, ' '),
               x -> list_contains(['le','la','et','est','avec'], x))) AS s_fr
           FROM documents)
         SELECT CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                     WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred,
                lang, count(*) AS cnt
         FROM sc GROUP BY 1, 2 ORDER BY pred, lang""",
    "text_fingerprint" ->
      """WITH fp AS (
           SELECT md5(array_to_string(list_sort(list_distinct(
                    string_split(text, ' '))), ' ')) AS fp,
                  count(*) AS n_docs, min(doc_id) AS keep_id
           FROM documents GROUP BY 1)
         SELECT count(*) AS n_fingerprints,
           sum(CASE WHEN n_docs > 1 THEN n_docs - 1 ELSE 0 END) AS n_shadowed
         FROM fp""")
}
