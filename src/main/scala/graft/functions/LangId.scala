package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Language identification by marker-token profiles (public stopword
  * fragments — the n-gram/stopword heuristic of langid.py and CLD at
  * its smallest useful size): per-language marker hit counts over the
  * whitespace token array, argmax by `(score, lang)` struct order, so
  * ties break to the lexicographically-last language — exactly the
  * q33 registry query's semantics, whose oracle mirrors the same tie
  * order in a CASE chain.
  *
  * ONE definition shared by the q33 query (TrainingData.scala) and the
  * ingest front-ends ([[graft.sources.Crawl]] — crawl JSONL records
  * that declare no `lang`, and every WARC response record): the
  * analysis operator and the at-ingest assignment can never drift.
  * Everything is codegen'd column math (size/filter/array_contains/
  * array_max) — no UDF — so the same expression streams.
  */
object LangId {

  /** Marker-token profiles per language (public stopword fragments). */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "fr" -> Seq("le", "la", "et", "de", "un"),
    "es" -> Seq("el", "la", "y", "de", "un"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  /** Marker hit count of one profile over a token array. */
  def hits(tok: Column, markers: Seq[String]): Column = {
    val m = array(markers.map(lit): _*)
    size(filter(tok, t => array_contains(m, t))).cast("long")
  }

  /** The winning `(score, lang)` struct — max by hit count, ties to
    * the lexicographically-last language (struct comparison order).
    */
  def best(tok: Column): Column =
    array_max(array(profiles.map { case (lang, markers) =>
      struct(hits(tok, markers).as("score"), lit(lang).as("lang"))
    }: _*))

  /** The at-ingest prediction over a token array: the argmax language,
    * or `'und'` when NO profile matched — a doc with zero marker hits
    * carries no evidence, and labeling it by tie order would poison
    * every per-language stratum downstream (q62 sampling, q143 CCNet
    * buckets). Null-safe: a null token array predicts null.
    */
  def predictTokens(tok: Column): Column = {
    val b = best(tok)
    when(b.getField("score") > 0, b.getField("lang"))
      .otherwise(when(tok.isNotNull, lit("und")))
  }

  /** [[predictTokens]] over raw text, tokenized exactly as the corpus
    * operators tokenize (`split` on single spaces).
    */
  def predict(text: Column): Column = predictTokens(split(text, " "))
}
