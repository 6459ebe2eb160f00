package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Large-scale training-data pipeline operators over `documents` /
  * `embeddings` (dedup, similarity search, text analysis, multimodal
  * plumbing) — the 100 TB-scale extension surface (BASELINE.json north star).
  */
object TrainingData {

  val all: Seq[Q] = Seq(

    Q("q30_dedup_exact",
      "Exact dedup: hash-groupBy on content digest; keeps the smallest " +
        "doc_id per group. md5 is identical across engines so the oracle " +
        "hash-matches. At scale this is one shuffle on the digest.",
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
    },

    Q("q31_token_count",
      "Token counting: whitespace tokenization + per-doc counts.",
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  n_chars
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        col("n_chars"))
    }
  )
}
