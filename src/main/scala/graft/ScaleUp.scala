package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: deterministic FACTOR-x scale-up of a corpus dir's
  * `documents` and `embeddings` tables, for scaling audits beyond the
  * largest driver-generated SF (correctness always runs on driver data;
  * this exists only to measure wall-time growth). Replicas stay
  * realistic for the heavy-tail workloads: every 13th token of a text
  * replica gets a replica-suffixed form (fresh vocab and fresh n-grams
  * per replica — novelty does not collapse, Zipf/Heaps fits see new
  * types), and embedding replicas get small deterministic per-coordinate
  * perturbations (near-dup structure across replicas, the SemDeDup
  * shape). doc_id/vec_id ranges stay disjoint via per-replica offsets.
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.agg(max("doc_id")).head().getLong(0) + 1
    val docOut = (0 until factor).map { k =>
      if (k == 0) docs
      else {
        val mutated = array_join(
          transform(split(col("text"), " "), (t, i) =>
            when(pmod(i, lit(13)) === 0, concat(t, lit(s"~$k")))
              .otherwise(t)), " ")
        docs.select((col("doc_id") + lit(k * nDocs)).as("doc_id"),
                    mutated.as("text"), col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .select("doc_id", "text", "lang", "source", "n_chars")
      }
    }.reduce(_ unionByName _)
    docOut.repartition(factor * 4).write.mode("overwrite")
      .parquet(s"$dst/documents.parquet")

    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val nVecs = embs.agg(max("vec_id")).head().getLong(0) + 1
    val embOut = (0 until factor).map { k =>
      if (k == 0) embs
      else
        embs.select(
          (col("vec_id") + lit(k * nVecs)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x + (pmod(xxhash64(col("vec_id"), lit(k), i), lit(1000))
                   .cast("float") / lit(1e5f) - lit(0.005f))).as("embedding"),
          col("label"))
    }.reduce(_ unionByName _)
    embOut.repartition(factor).write.mode("overwrite")
      .parquet(s"$dst/embeddings.parquet")

    println(s"SCALED docs=${docOut.count()} vecs=${embOut.count()} -> $dst")
    spark.stop()
  }
}
