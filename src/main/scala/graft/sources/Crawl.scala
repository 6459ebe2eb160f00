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

  // ------------------------------------------------------------------
  // WARC front-end — the Common-Crawl-native format (ISO 28500): one
  // gzip member per record, `WARC/1.0` header block + Content-Length
  // bytes of block (an HTTP response for `response` records). Second
  // reader on the SAME typed-frame contract as [[parseCrawl]]: the
  // output carries (value, corrupt, doc_id, url, source, text, lang,
  // ts), so [[crawlDocs]]/[[crawlCorrupt]] and every downstream ingest
  // path work unchanged.
  //
  // Scale notes:
  //   - a .warc.gz is NOT splittable (and record boundaries are not
  //     line boundaries), so the unit of parallelism is the FILE —
  //     Common Crawl ships ~1 GB members, which is the right shape;
  //     `binaryFile` hands each file's bytes to one task and the
  //     member parse is a pure per-row flatMap, batch or stream.
  //   - damaged input is COUNTED, never dropped and never fatal: a
  //     truncated gzip member, a non-WARC header, a missing/overrun
  //     Content-Length each emit a `corrupt = true` row carrying the
  //     raw head of the unparseable region for the repair pass (the
  //     parseCrawl discipline). Record types other than `response`
  //     (warcinfo, request, metadata) are skipped BY DESIGN — they are
  //     protocol envelope, not documents.
  //   - doc_id: WARC has no document id, so it derives as a stable
  //     63-bit content hash of (url, ts, text) — deterministic on any
  //     engine, re-read-stable, disjoint inputs collide with
  //     probability ~n^2/2^63.
  // ------------------------------------------------------------------

  /** `binaryFile`'s fixed schema, spelled out because a STREAMING file
    * source requires an explicit schema.
    */
  private val binaryFileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Pure JVM member parser: one file's bytes -> (value, corrupt, url,
    * ts, text) rows. Handles multi-member gzip (one member per record,
    * the Common-Crawl layout — java's GZIPInputStream reads
    * concatenated members transparently) and plain uncompressed .warc.
    * Decompression is STREAMED: a ~1 GB Common-Crawl member file
    * inflates to several GB, past the JVM's 2 GB array limit — only
    * the compressed file bytes (the binaryFile row) and one record's
    * block are ever held at once. Damage is never fatal: a truncated
    * gzip member, a non-WARC header, a missing/negative/overrunning
    * Content-Length each emit one corrupt row carrying the record's
    * header head (<= 2 KB) and stop the scan (WARC has no in-band
    * resync marker worth trusting past damage). Valid rows leave
    * `value` null rather than duplicating the record in flight.
    */
  private[sources] def parseWarcMembers(raw: Array[Byte])
      : Seq[(String, Boolean, String, String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Boolean, String, String, String)]
    val base = new java.io.ByteArrayInputStream(raw)
    val in = new java.io.BufferedInputStream(
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
          (raw(1) & 0xff) == 0x8b)
        new java.util.zip.GZIPInputStream(base, 65536)
      else base, 65536)
    // one header line (headers are short; block bytes read in bulk
    // below); null at EOF, trailing \r stripped
    def readLine(): String = {
      var c = in.read()
      if (c < 0) return null
      val sb = new java.lang.StringBuilder
      while (c >= 0 && c != '\n') { sb.append(c.toChar); c = in.read() }
      if (sb.length > 0 && sb.charAt(sb.length - 1) == '\r')
        sb.setLength(sb.length - 1)
      sb.toString
    }
    try {
      var done = false
      while (!done) {
        var line = readLine()
        while (line != null && line.isEmpty) line = readLine()
        if (line == null) done = true
        else {
          val head = new java.lang.StringBuilder(line).append('\n')
          val versionOk = line.startsWith("WARC/")
          val headers = scala.collection.mutable.Map.empty[String, String]
          var blank = false
          var l = if (versionOk) readLine() else null
          while (versionOk && !blank && l != null) {
            if (head.length < 2048) head.append(l).append('\n')
            if (l.isEmpty) blank = true
            else {
              val c = l.indexOf(':')
              if (c > 0)
                headers(l.substring(0, c).trim.toLowerCase) =
                  l.substring(c + 1).trim
              l = readLine()
            }
          }
          // Content-Length must parse, be non-negative, and fit an
          // array — a negative or absurd declared length is damage,
          // not an index-out-of-bounds crash
          val cl = headers.get("content-length")
            .flatMap(v => scala.util.Try(v.toLong).toOption)
            .filter(c => c >= 0 && c <= Int.MaxValue - 8)
          lazy val corruptHead =
            head.substring(0, math.min(head.length, 2048))
          if (!versionOk || !blank || cl.isEmpty) {
            out += ((corruptHead, true, null, null, null))
            done = true
          } else {
            val block = in.readNBytes(cl.get.toInt)
            if (block.length < cl.get) {
              out += ((corruptHead, true, null, null, null))
              done = true
            } else if (headers.get("warc-type").contains("response")) {
              val bs = new String(block, "UTF-8")
              val sep = bs.indexOf("\r\n\r\n")
              val body =
                if (bs.startsWith("HTTP/") && sep >= 0)
                  bs.substring(sep + 4)
                else bs
              out += ((null, false,
                       headers.getOrElse("warc-target-uri", null),
                       headers.getOrElse("warc-date", null), body))
            }
          }
        }
      }
    } catch {
      // a truncated trailing gzip member EOFs mid-inflate: everything
      // parsed before it stands, the damage is one counted row
      case _: java.io.IOException =>
        out += (("<gzip member truncated>", true, null, null, null))
    }
    out.toSeq
  }

  /** One WARC parser for both forms: binaryFile rows -> the
    * [[parseCrawl]]-shaped typed frame. The flatMap is stateless
    * per-row work, so the same code streams.
    */
  private def parseWarcFiles(files: DataFrame): DataFrame = {
    val session = files.sparkSession
    import session.implicits._
    files.select(col("content")).as[Array[Byte]]
      .flatMap(parseWarcMembers(_))
      .toDF("value", "corrupt", "url", "wts", "text")
      .select(
        col("value"), col("corrupt"),
        when(!col("corrupt"),
          pmod(xxhash64(coalesce(col("url"), lit("")),
                        coalesce(col("wts"), lit("")), col("text")),
               lit(Long.MaxValue)).cast("long")).as("doc_id"),
        col("url"),
        lit("warc").as("source"),
        col("text"),
        lit("und").as("lang"),
        coalesce(try_to_timestamp(col("wts")), current_timestamp())
          .as("ts"))
  }

  /** Batch read of a WARC directory (`*.warc` / `*.warc.gz`). */
  def readWarc(s: SparkSession, path: String): DataFrame =
    parseWarcFiles(s.read.format("binaryFile").load(path))

  /** Streaming read: newly landed WARC files become micro-batches,
    * checkpointed exactly-once by file name (the [[readCrawlStream]]
    * contract; `maxFilesPerTrigger` bounds a backfill batch).
    */
  def readWarcStream(s: SparkSession, path: String,
                     maxFilesPerTrigger: Int = 0): DataFrame = {
    val r0 = s.readStream.format("binaryFile").schema(binaryFileSchema)
    val r = if (maxFilesPerTrigger > 0)
              r0.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
            else r0
    parseWarcFiles(r.load(path))
  }
}
