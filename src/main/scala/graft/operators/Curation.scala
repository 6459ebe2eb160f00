package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus curation operators over `documents`: the selection /
  * splitting / cleaning steps a large-scale LLM data pipeline runs after
  * dedup and quality scoring (public recipes: C4, Gopher, RefinedWeb).
  * All five are deterministic — content-hash driven, never RNG — so every
  * one is DuckDB-oracled, and re-running a 100 TB pipeline reproduces the
  * same corpus bit-for-bit (the property that makes training runs
  * comparable).
  */
object Curation {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  val all: Seq[Q] = Seq(

    Q("q59_train_split",
      "Deterministic train/val/test split by content hash: the first md5 " +
        "hex digit buckets docs 12/2/2 of 16 (75/12.5/12.5%). Hash-driven " +
        "splits survive corpus re-ingestion and re-partitioning (a random() " +
        "split does neither) and need no shuffle at all — pure codegen'd " +
        "column math on the scan.",
      """SELECT doc_id, lang,
        |  CASE WHEN substr(md5(text), 1, 1) <= 'b' THEN 'train'
        |       WHEN substr(md5(text), 1, 1) <= 'd' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin) { (s, d) =>
      val h = substring(md5(col("text")), 1, 1)
      docs(s, d).select(
        col("doc_id"), col("lang"),
        when(h <= "b", "train").when(h <= "d", "val").otherwise("test").as("split"))
    },

    Q("q60_repetition",
      "Gopher-style repetition signal: the share of a doc taken by its " +
        "single most frequent token. High top-token share marks " +
        "boilerplate/spam for removal. Two aggregates, both keyed on " +
        "doc_id or (doc_id, term) — embarrassingly parallel at any scale.",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2)
        |SELECT doc_id, max(c) AS top_tok,
        |  CAST(sum(c) AS BIGINT) AS n_tok,
        |  round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_share
        |FROM tf GROUP BY doc_id""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(max("c").as("top_tok"),
             sum("c").cast("long").as("n_tok"),
             round(max("c").cast("double") / sum("c"), 4).as("top_share"))
    },

    Q("q61_pii_scrub",
      "PII redaction: regex-scrub email addresses, reporting the redaction " +
        "count per doc. The synthetic corpus carries no PII, so the query " +
        "PLANTS two deterministic addresses per doc (from the content " +
        "hash) and proves the scrubber removes exactly those — the same " +
        "single-pass codegen'd projection a real corpus would run.",
      """SELECT doc_id,
        |  regexp_replace(
        |    substr(text, 1, 20) || ' contact ' || substr(md5(text), 1, 8) ||
        |      '@example.com or ' || substr(md5(text), 9, 8) || '@test.org tail',
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g')
        |    AS scrubbed,
        |  CAST(len(regexp_extract_all(
        |    substr(text, 1, 20) || ' contact ' || substr(md5(text), 1, 8) ||
        |      '@example.com or ' || substr(md5(text), 9, 8) || '@test.org tail',
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT)
        |    AS n_redactions
        |FROM documents""".stripMargin) { (s, d) =>
      val pat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val planted = concat(
        substring(col("text"), 1, 20), lit(" contact "),
        substring(md5(col("text")), 1, 8), lit("@example.com or "),
        substring(md5(col("text")), 9, 8), lit("@test.org tail"))
      docs(s, d).select(
        col("doc_id"),
        regexp_replace(planted, pat, "<EMAIL>").as("scrubbed"),
        size(regexp_extract_all(planted, lit(pat), lit(0))).cast("long")
          .as("n_redactions"))
    },

    Q("q62_stratified_sample",
      "Deterministic stratified sampling: k docs per language, chosen by " +
        "content-hash order (uniform over the stratum, reproducible across " +
        "runs/partitionings). One shuffle on the stratum key; rank " +
        "truncation, not a full sort.",
      """SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
        |FROM (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang
        |                           ORDER BY md5(text), doc_id) AS rk
        |      FROM documents)
        |WHERE rk <= 20""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("lang").orderBy(md5(col("text")), col("doc_id"))
      docs(s, d)
        .select(col("doc_id"), col("lang"), row_number().over(w).as("rk"))
        .filter(col("rk") <= 20)
        .select(col("doc_id"), col("lang"), col("rk").cast("long").as("rk"))
    },

    Q("q63_source_caps",
      "Source-mix audit: per-source doc counts vs the mean, flagging " +
        "over-represented sources (>1.5x mean) for down-sampling. One " +
        "aggregate + a 1-row broadcast scalar (q28 pattern).",
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |     a AS (SELECT avg(n) AS mean_n FROM c)
        |SELECT source, n, round(n / mean_n, 4) AS ratio,
        |  CAST(n > 1.5 * mean_n AS BIGINT) AS over_cap
        |FROM c CROSS JOIN a""".stripMargin) { (s, d) =>
      val c = docs(s, d).groupBy("source").agg(count(lit(1)).as("n"))
      val a = c.agg(avg("n").as("mean_n"))
      c.crossJoin(broadcast(a))
        .select(col("source"), col("n"),
                round(col("n") / col("mean_n"), 4).as("ratio"),
                (col("n") > lit(1.5) * col("mean_n")).cast("long").as("over_cap"))
    }
  )
}
