package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Crawl-native document input: a directory of (optionally gzipped)
  * JSONL files — the format crawl dumps actually land in — read into
  * the exact doc frame the ingest paths consume
  * ([[graft.operators.Curation.ingestStream]] /
  * `startCorpusMaintenance`: ts, doc_id, source, text, lang), with the
  * S2 corrupt-record discipline (cpms/Streaming.scala `parseEvents`):
  * lines are read as raw text and parsed with `from_json`, so a
  * malformed line, a non-JSON line, or a record missing its required
  * fields surfaces as a `corrupt = true` row that downstream counts
  * and skips — never an aborted read, never a silently dropped line.
  * Reference analogue: the PERMISSIVE skip-and-count policy of the
  * event consumer (stream_processor.py:42-43), applied to the crawl
  * feed.
  *
  * Batch ([[readCrawl]]) and streaming ([[readCrawlStream]], the file
  * stream source — new files under the directory become micro-batches)
  * forms share ONE parser, so stream==batch equality is structural.
  *
  * Scale notes for a real dump:
  *   - `.jsonl.gz` is NOT splittable: parallelism = file count, one
  *     task per file. Crawl dumps ship as many ~100 MB–1 GB members,
  *     which is exactly the right shape; a single multi-TB gz member
  *     would serialize, and should be re-chunked upstream.
  *   - the text source never materializes a line twice: the JSON parse
  *     is a codegen'd projection over the scan, and unparsed `value`
  *     bytes are dropped at the first select unless the caller keeps
  *     them (quarantine pipelines keep `value` on corrupt rows for
  *     repair — [[crawlCorrupt]] does).
  */
object Crawl {

  /** The crawl record contract. `doc_id` and `text` are required
    * (their absence marks the row corrupt); `source`/`lang`/`ts`/`url`
    * default (crawl feeds are heterogeneous — a missing lang is "und",
    * a missing ts is the ingest clock, exactly the ingestion-enrichment
    * convention of cpms/Streaming.scala:42-44). `ts` accepts ISO-8601
    * or epoch seconds.
    */
  val crawlV1: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("url", StringType),
    StructField("source", StringType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("ts", StringType)))

  /** One parser for both forms: raw `value` lines -> typed doc frame +
    * `corrupt` flag. Pure per-row projections — streams unchanged.
    */
  private[sources] def parseCrawl(raw: DataFrame): DataFrame =
    raw
      .withColumn("e", from_json(col("value"), crawlV1))
      .withColumn("corrupt",
        col("e").isNull || col("e.doc_id").isNull || col("e.text").isNull)
      .select(
        col("value"), col("corrupt"),
        col("e.doc_id").as("doc_id"),
        col("e.url").as("url"),
        coalesce(col("e.source"), lit("crawl")).as("source"),
        col("e.text").as("text"),
        coalesce(col("e.lang"), lit("und")).as("lang"),
        coalesce(
          try_to_timestamp(col("e.ts")),
          to_timestamp(from_unixtime(expr("try_cast(e.ts AS DOUBLE)"))),
          current_timestamp()).as("ts"))

  /** Batch read of a crawl directory (`*.jsonl` / `*.jsonl.gz`; the gz
    * codec resolves per file from its extension).
    */
  def readCrawl(s: SparkSession, path: String): DataFrame =
    parseCrawl(s.read.textFile(path).toDF("value"))

  /** Streaming read: the file stream source tails `path` — each newly
    * landed dump file becomes (part of) a micro-batch, checkpointed
    * exactly-once by file name. `maxFilesPerTrigger` bounds a batch
    * when a backfill drops thousands of members at once.
    */
  def readCrawlStream(s: SparkSession, path: String,
                      maxFilesPerTrigger: Int = 0): DataFrame = {
    val r0 = s.readStream.format("text")
    val r = if (maxFilesPerTrigger > 0)
              r0.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
            else r0
    parseCrawl(r.load(path))
  }

  /** The clean feed for [[graft.operators.Curation.ingestStream]]:
    * exactly its input contract, corrupt rows dropped.
    */
  def crawlDocs(parsed: DataFrame): DataFrame =
    parsed.filter(!col("corrupt"))
      .select("ts", "doc_id", "source", "text", "lang")

  /** The quarantine side: corrupt raw lines, `value` kept verbatim for
    * the repair pass (the `has_oov` routing pattern — count, land,
    * never silently drop).
    */
  def crawlCorrupt(parsed: DataFrame): DataFrame =
    parsed.filter(col("corrupt")).select("value")

  /** The EXPORT half of the crawl loop: land a doc frame back as
    * (optionally gzipped) JSONL in the [[crawlV1]] field order — the
    * interchange format for handing a filtered/curated corpus to an
    * external consumer, or re-feeding it through another deployment's
    * [[readCrawl]]. Contract fields present on the frame serialize in
    * schema order (extra columns append after, so gate provenance can
    * ride along); timestamps serialize ISO-8601 at millisecond
    * precision, which the reader's `try_to_timestamp` round-trips. `to_json` omits null fields and
    * the reader re-applies its defaults, so
    * readCrawl(writeCrawl(docs)) == docs on the contract columns —
    * CrawlSourceSpec's round-trip pin. One codegen'd projection over
    * the frame; file count (= task count) is the caller's partitioning,
    * so a 100 TB export shards exactly as the upstream plan parallels.
    */
  def writeCrawl(docFrame: DataFrame, path: String,
                 gzip: Boolean = true): Unit = {
    val present = docFrame.columns
    val ordered = crawlV1.fieldNames.filter(present.contains) ++
      present.filterNot(crawlV1.fieldNames.contains)
    val out = docFrame
      .select(to_json(struct(ordered.map(col).toIndexedSeq: _*)).as("value"))
      .write.mode("overwrite")
    (if (gzip) out.option("compression", "gzip") else out).text(path)
  }
}
