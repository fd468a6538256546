package graft.sources.warc

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 "warc" format — splittable reads of the web-crawl
  * container (ISO 28500; what Common Crawl ships), completing the engine's
  * crawl→text→curation story: `spark.read.format("warc").load(path)` feeds
  * `response` payloads straight into the html_extract kernel and the
  * curation cascade behind it.
  *
  * Design mirrors the fastx connector ([[graft.sources.fastx.FastxDataSource]]):
  *  - fixed 9-column schema (record headers + (record_file, record_offset) — the CDX seed for random access — + binary payload), column
  *    pruning pushed into the reader;
  *  - record-level STRING filter pushdown (`record_type = 'response'` is
  *    the universal first filter on a crawl scan — pushed, rows for
  *    request/metadata records are never materialized) plus a partial
  *    per-partition limit;
  *  - SPLITTABLE plain files: byte ranges resync on a VALIDATED
  *    `WARC/1.x` version line ([[WarcParser.records]] — the FASTQ-resync
  *    discipline), then frame exactly by Content-Length walks;
  *  - SPLITTABLE per-record-gzipped files (`.warc.gz`, the layout Common
  *    Crawl actually ships — every record its own RFC 1952 member) with
  *    `option("recordGzipSplit", "true")`: byte ranges resync on a
  *    VALIDATED gzip member boundary ([[GzipMembers]] — magic + full
  *    header parse + `WARC/1.` decompressed-prefix check), exact member
  *    ownership. Without the option, compressed files read whole (one
  *    partition per file; Hadoop's gzip codec streams concatenated
  *    members as one stream — see [[GzipMembers]] for why splitting is
  *    never inferred from the extension).
  *
  * At 100 TB: splits default to 128 MB byte ranges per task over
  * arbitrarily large files, scan statistics report real byte sizes to
  * AQE/broadcast planning, and the scan is a streaming single pass —
  * nothing driver-side but the file listing. */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def supportsExternalMetadata(): Boolean = true

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    val multi = Option(options.get("paths")).toSeq.flatMap { json =>
      json.stripPrefix("[").stripSuffix("]").split(",").toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    }
    val all = single ++ multi
    require(all.nonEmpty, "warc: no path specified")
    all
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new WarcTable(paths(opts), schema)
  }
}

object WarcDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("record_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = false),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    // (record_file, record_offset) — the CDX seed: the source file and
    // the byte offset of the record's version line (plain files) or of
    // its gzip member (record-gzip files), which is what makes a crawl
    // record randomly addressable without rescanning the container
    StructField("record_file", StringType, nullable = false),
    StructField("record_offset", LongType, nullable = false),
    // WARC-Refers-To — the revisit back-pointer: non-null on `revisit`
    // records (the container-level dedup convention real crawls ship)
    StructField("refers_to", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = false)))
}

class WarcTable(paths: Seq[String], tableSchema: StructType)
  extends Table with SupportsRead {
  override def name(): String = s"warc(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(paths, tableSchema, options)
}

/** Record-level predicate evaluation for the pushed string filters — same
  * best-effort contract as [[graft.sources.fastx.FastxFilters]]: claimed
  * filters are evaluated in the reader to skip row materialization early
  * AND re-applied by Spark post-scan. */
object WarcFilters {
  import org.apache.spark.sql.sources._

  private val StringCols = Set("record_type", "record_id", "target_uri",
    "warc_date", "content_type", "refers_to")

  def evaluable(f: Filter): Boolean = f match {
    case EqualTo(a, _: String)  => StringCols(a)
    case StringStartsWith(a, _) => StringCols(a)
    case StringEndsWith(a, _)   => StringCols(a)
    case StringContains(a, _)   => StringCols(a)
    case IsNotNull(a)           => StringCols(a)
    case IsNull(a)              => StringCols(a)
    case And(l, r)              => evaluable(l) && evaluable(r)
    case Or(l, r)               => evaluable(l) && evaluable(r)
    case Not(c)                 => evaluable(c)
    case _                      => false
  }

  private def field(rec: WarcRecord, attr: String): String = attr match {
    case "record_type"  => rec.recordType
    case "record_id"    => rec.recordId
    case "target_uri"   => rec.targetUri
    case "warc_date"    => rec.warcDate
    case "content_type" => rec.contentType
    case "refers_to"    => rec.refersTo
    case _              => null
  }

  def eval(f: Filter, rec: WarcRecord): Boolean = f match {
    case EqualTo(a, v: String)  => field(rec, a) == v
    case StringStartsWith(a, p) => { val s = field(rec, a); s != null && s.startsWith(p) }
    case StringEndsWith(a, p)   => { val s = field(rec, a); s != null && s.endsWith(p) }
    case StringContains(a, p)   => { val s = field(rec, a); s != null && s.contains(p) }
    case IsNotNull(a)           => field(rec, a) != null
    case IsNull(a)              => field(rec, a) == null
    case And(l, r)              => eval(l, rec) && eval(r, rec)
    case Or(l, r)               => eval(l, rec) || eval(r, rec)
    case Not(c)                 => !eval(c, rec)
    case _                      => true
  }

  def predicate(filters: Seq[Filter]): WarcRecord => Boolean =
    if (filters.isEmpty) _ => true
    else rec => filters.forall(eval(_, rec))
}

class WarcScanBuilder(paths: Seq[String], full: StructType,
                      options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {
  import org.apache.spark.sql.sources.Filter

  private var required: StructType = full
  private var limit: Int = -1
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val names = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => names.contains(f.name)))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(WarcFilters.evaluable)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(n: Int): Boolean = {
    limit = n
    false
  }

  override def build(): Scan = {
    val maxSplit = Option(options.get("maxSplitBytes")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    val gzMembers = Option(options.get("recordGzipSplit")).exists(_.toBoolean)
    val zstMembers = Option(options.get("recordZstdSplit")).exists(_.toBoolean)
    new WarcScan(paths, full, required, maxSplit, limit, pushed.toSeq,
      gzMembers, zstMembers)
  }
}

final case class WarcInputPartition(file: String, start: Long, length: Long,
                                    limit: Int,
                                    filters: Seq[org.apache.spark.sql.sources.Filter],
                                    gzMembers: Boolean = false,
                                    zstMembers: Boolean = false)
  extends InputPartition

class WarcScan(paths: Seq[String], full: StructType, required: StructType,
               maxSplitBytes: Long, limit: Int,
               filters: Seq[org.apache.spark.sql.sources.Filter],
               recordGzipSplit: Boolean = false,
               recordZstdSplit: Boolean = false)
  extends Scan with Batch with SupportsReportStatistics {
  import graft.sources.fastx.FastxDataSource.{isCompressed, resolveFiles}

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"warc ${paths.mkString(",")} cols=${required.fieldNames.mkString(",")}" +
      (if (limit >= 0) s" limit=$limit" else "") +
      (if (filters.nonEmpty) s" PushedFilters: [${filters.mkString(", ")}]" else "")

  override def estimateStatistics(): Statistics = new Statistics {
    private val totalBytes = {
      val conf = new Configuration()
      resolveFiles(paths, conf).map(_.getLen).sum
    }
    override def sizeInBytes(): java.util.OptionalLong = {
      val frac = math.max(1, required.size).toDouble / math.max(1, full.size)
      java.util.OptionalLong.of(math.max(1L, (totalBytes * frac).toLong))
    }
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val files = resolveFiles(paths, conf).filter(_.getLen > 0)
    files.flatMap { st =>
      val p = st.getPath
      // per-record-gzipped files (the Common Crawl layout) split on gzip
      // MEMBER boundaries — the explicit `recordGzipSplit` option, never
      // inferred from the extension: a monolithic single-member gzip
      // would decompress its whole "member" (= the whole corpus) in
      // split 0. Without the option, any compressed file reads whole
      // (Hadoop's codec streams concatenated members transparently).
      val gzSplit = recordGzipSplit && p.getName.toLowerCase.endsWith(".gz")
      val zstSplit = recordZstdSplit && p.getName.toLowerCase.endsWith(".zst")
      val splittable =
        (gzSplit || zstSplit || !isCompressed(p, conf)) && st.getLen > maxSplitBytes
      if (splittable)
        (0L until st.getLen by maxSplitBytes).map { off =>
          WarcInputPartition(p.toString, off,
            math.min(maxSplitBytes, st.getLen - off), limit, filters, gzSplit,
            zstSplit)
        }
      else
        Seq(WarcInputPartition(p.toString, 0L, st.getLen, limit, filters,
          gzSplit, zstSplit))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcMicroBatchStream(paths, required.fieldNames, maxSplitBytes,
      filters, recordGzipSplit, recordZstdSplit)
}

/** Streaming crawl ingest — `spark.readStream.format("warc")`: each
  * micro-batch processes the WARC files that LANDED since the last batch.
  * The offset is the lexicographically-largest processed file name, so
  * state is O(1) in the checkpoint regardless of corpus size; the
  * contract is MONOTONE file naming (new files sort after processed
  * ones — the crawler-segment convention: date/segment-prefixed names),
  * documented rather than a growing seen-file set. A batch's files go
  * through the SAME split planning as the batch source (byte-range or
  * gzip-member splits, pushed filters, pruned columns), so a single
  * giant landed file still fans out across the cluster within its
  * micro-batch. Implements SupportsTriggerAvailableNow: the target
  * listing is pinned at prepare time, so Trigger.AvailableNow drains
  * exactly the files present at start and terminates. */
class WarcMicroBatchStream(paths: Seq[String], columns: Array[String],
                           maxSplitBytes: Long,
                           filters: Seq[org.apache.spark.sql.sources.Filter],
                           recordGzipSplit: Boolean,
                           recordZstdSplit: Boolean = false)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset
  import graft.sources.fastx.FastxDataSource.{isCompressed, resolveFiles}

  /** O(1) offset: the lexicographically-largest processed file name PLUS
    * the number of files named ≤ it at commit time. The count is what
    * makes out-of-order landings DETECTABLE with constant state (r15):
    * a late file named ≤ `lastFile` — landed mid-run OR while the stream
    * was down — changes the ≤-count, so the next admission check fails
    * loudly instead of skipping the file forever. (A simultaneous
    * deletion could mask one late arrival; deletions of processed input
    * violate the same immutable-landing contract.) */
  private case class WarcOffset(lastFile: String, nFiles: Long) extends Offset {
    override def json(): String = {
      val quoted = com.fasterxml.jackson.databind.node.JsonNodeFactory
        .instance.textNode(lastFile).toString
      s"""{"lastFile":$quoted,"nFiles":$nFiles}"""
    }
  }

  private var availableNowTarget: Option[String] = None

  private def listNames(): Seq[(String, org.apache.hadoop.fs.FileStatus)] = {
    val conf = new Configuration()
    resolveFiles(paths, conf).filter(_.getLen > 0)
      .map(st => st.getPath.getName -> st)
      .sortBy(_._1)
  }

  private def offsetFor(names: Seq[(String, org.apache.hadoop.fs.FileStatus)])
      : WarcOffset =
    WarcOffset(names.lastOption.map(_._1).getOrElse(""), names.size.toLong)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(listNames().lastOption.map(_._1).getOrElse(""))

  override def initialOffset(): Offset = WarcOffset("", 0L)

  override def latestOffset(): Offset = availableNowTarget match {
    case Some(t) =>
      // pinned target: count only what is ≤ the pinned name, so files
      // landing after prepare (monotone, > t) don't skew the count
      WarcOffset(t, listNames().count(_._1 <= t).toLong)
    case None => offsetFor(listNames())
  }

  /** The loud out-of-order check (r15), runnable from BOTH admission
    * control and planning: when the late file is the only new arrival,
    * the latest offset never advances past the checkpoint and
    * planInputPartitions is never called — the silent skip would happen
    * before planning, so admission control must see it too. A violated
    * count can't name the late files (the offset is O(1) by design), but
    * it fails the stream with the ≤-offset listing for triage. */
  private def detectOutOfOrder(from: WarcOffset,
      names: Seq[(String, org.apache.hadoop.fs.FileStatus)]): Unit = {
    if (from.nFiles < 0L) return // legacy checkpoint without a count
    val atOrBefore = names.collect { case (n, _) if n <= from.lastFile => n }
    if (atOrBefore.size > from.nFiles)
      throw new IllegalStateException(
        s"warc streaming: ${atOrBefore.size - from.nFiles} file(s) landed OUT " +
          s"OF ORDER — named ≤ the checkpointed offset '${from.lastFile}', " +
          s"which covered ${from.nFiles} file(s) when committed — and would " +
          s"be silently skipped forever. Files now at-or-before the offset: " +
          s"${atOrBefore.takeRight(5).mkString(", ")}${if (atOrBefore.size > 5) ", …" else ""}. " +
          "The warc streaming offset contract is MONOTONE file naming (new " +
          "files must sort after processed ones); rename the late files past " +
          "the offset or restart from a fresh checkpoint.")
  }

  // SupportsTriggerAvailableNow extends SupportsAdmissionControl; this
  // source applies no read limits — a micro-batch takes everything new
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    detectOutOfOrder(start.asInstanceOf[WarcOffset], listNames())
    latestOffset()
  }

  override def deserializeOffset(json: String): Offset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    // legacy (pre-r15) checkpoints carry no nFiles → -1 disables the
    // count check until the next commit writes the full offset
    val n = if (node.has("nFiles")) node.get("nFiles").asLong() else -1L
    WarcOffset(node.get("lastFile").asText(), n)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[WarcOffset].lastFile
    val to = end.asInstanceOf[WarcOffset].lastFile
    val conf = new Configuration()
    val names = listNames()
    detectOutOfOrder(start.asInstanceOf[WarcOffset], names)
    names
      .filter { case (n, _) => n > from && n <= to }
      .flatMap { case (_, st) =>
        val p = st.getPath
        val gzSplit = recordGzipSplit && p.getName.toLowerCase.endsWith(".gz")
        val zstSplit = recordZstdSplit && p.getName.toLowerCase.endsWith(".zst")
        val splittable =
          (gzSplit || zstSplit || !isCompressed(p, conf)) && st.getLen > maxSplitBytes
        if (splittable)
          (0L until st.getLen by maxSplitBytes).map { off =>
            WarcInputPartition(p.toString, off,
              math.min(maxSplitBytes, st.getLen - off), -1, filters, gzSplit,
              zstSplit)
          }
        else
          Seq(WarcInputPartition(p.toString, 0L, st.getLen, -1, filters,
            gzSplit, zstSplit))
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(columns)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class WarcReaderFactory(columns: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(partition.asInstanceOf[WarcInputPartition], columns)
}

/** Per-partition streaming reader: seeks for splits, resyncs on a
  * validated version line, walks Content-Length frames, emits only the
  * pruned columns. */
class WarcPartitionReader(part: WarcInputPartition, columns: Array[String])
  extends PartitionReader[InternalRow] {
  import graft.sources.fastx.FastxDataSource.{decompressed, isCompressed}

  private val conf = new Configuration()
  private val path = new Path(part.file)
  private val fs = path.getFileSystem(conf)
  private val compressed = isCompressed(path, conf)
  private val rawStream = fs.open(path)
  private val fileName = UTF8String.fromString(path.getName)

  private val records: Iterator[WarcRecord] = {
    if (part.gzMembers) {
      // per-record-gzip member walk: exact member ownership [start, end),
      // resync = magic scan + header parse + WARC/1. prefix validation
      val fileLen = fs.getFileStatus(path).getLen
      val raw = new GzipMembers.RawReader(rawStream, fileLen)
      GzipMembers.records(raw, part.start, part.start + part.length,
        resync = part.start > 0)
    } else if (part.zstMembers) {
      // frame-per-record zstd walk: magic scan + frame-size walk +
      // WARC/1. prefix validation; frame checksum verified on decompress
      val fileLen = fs.getFileStatus(path).getLen
      val raw = new GzipMembers.RawReader(rawStream, fileLen)
      ZstdMembers.records(raw, part.start, part.start + part.length,
        resync = part.start > 0)
    } else if (compressed) {
      WarcParser.records(
        new PosByteReader(decompressed(path, rawStream, conf)))
    } else if (part.start == 0) {
      // first split: a true record start; ownership bound only
      WarcParser.records(new PosByteReader(rawStream),
        ownedEnd = part.length)
    } else {
      // split seek: discard the partial first line (Hadoop convention —
      // a record starting exactly at `start` belongs to the previous
      // split), then resync on a validated version line
      rawStream.seek(part.start)
      val reader = new PosByteReader(rawStream, part.start)
      reader.readLine()
      WarcParser.records(reader, ownedEnd = part.start + part.length,
        resync = true)
    }
  }

  private val pred: WarcRecord => Boolean = WarcFilters.predicate(part.filters)
  private var current: WarcRecord = _
  private var emitted = 0

  override def next(): Boolean = {
    if (part.limit >= 0 && emitted >= part.limit) false
    else {
      var found = false
      while (!found && records.hasNext) {
        val r = records.next()
        if (pred(r)) { current = r; found = true }
      }
      if (found) emitted += 1
      found
    }
  }

  override def get(): InternalRow = {
    val values: Array[Any] = columns.map {
      case "record_type"    => UTF8String.fromString(current.recordType)
      case "record_id"      => UTF8String.fromString(current.recordId)
      case "target_uri"     => if (current.targetUri == null) null
                               else UTF8String.fromString(current.targetUri)
      case "warc_date"      => UTF8String.fromString(current.warcDate)
      case "content_type"   => if (current.contentType == null) null
                               else UTF8String.fromString(current.contentType)
      case "content_length" => current.contentLength
      case "record_file"    => fileName
      case "record_offset"  => current.offset
      case "refers_to"      => if (current.refersTo == null) null
                               else UTF8String.fromString(current.refersTo)
      case "payload"        => current.payload
    }
    InternalRow.fromSeq(values.toSeq)
  }

  override def close(): Unit = rawStream.close()
}
