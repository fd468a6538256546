package graft.sources.fastx

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 "fastx" format — the Spark-native equivalent of the
  * reference's Polars IO plugin (`register_io_source`,
  * `fastx_parsers.py:129`), designed for cluster scale:
  *
  *  - schema by content sniff at planning time (FASTA → 2 cols, FASTQ → 3;
  *    `fastx_parsers.py:87-93`), fixing the reference's FASTA row-shape bug
  *    (SURVEY §0.1.2) by giving FASTA a quality-free schema;
  *  - column pruning pushed into the reader
  *    (`SupportsPushDownRequiredColumns` — the Catalyst negotiation that
  *    replaces the plugin's `with_columns` arg, `fastx_parsers.py:96`);
  *  - SPLITTABLE plain FASTA *and* FASTQ reads: files are carved into
  *    byte ranges (Hadoop text-split ownership convention), so one 1 TB
  *    file fans out across a whole cluster instead of one task. FASTA
  *    resyncs on `\n>`; FASTQ resyncs via the strict-4-line invariant +
  *    `+`-separator lookahead (a bare `@` sniff is ambiguous because
  *    quality lines may start with `@` — SURVEY §7.3.1). Multi-line FASTQ
  *    (rare; needletail-tolerated) must disable splitting with
  *    `option("fastqSplit", "false")` — a multi-line record under
  *    splitting fails fast in the strict parser, never corrupts silently.
  *    Compressed files read as one partition per file;
  *  - transparent decompression via the Hadoop codec factory (gzip/bzip2/…)
  *    matching needletail's behavior.
  *
  * Usage: `spark.read.format("fastx").load(path)` (glob/dir/file paths).
  */
class FastxDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "fastx"

  override def supportsExternalMetadata(): Boolean = true

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    val multi = Option(options.get("paths")).toSeq.flatMap { json =>
      // Spark encodes multiple load() paths as a JSON string array
      json.stripPrefix("[").stripSuffix("]").split(",").toSeq
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    }
    val all = single ++ multi
    require(all.nonEmpty, "fastx: no path specified")
    all
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = new Configuration()
    val files = FastxDataSource.resolveFiles(paths(options), conf)
    require(files.nonEmpty, s"fastx: no input files under ${paths(options).mkString(",")}")
    // sniff the first NON-EMPTY file (a zero-byte part file carries no format)
    val fmt = files.find(_.getLen > 0)
      .map(f => FastxDataSource.sniffFile(f.getPath, conf)).getOrElse("fasta")
    FastxDataSource.schemaFor(fmt)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new FastxTable(paths(opts), schema)
  }
}

object FastxDataSource {
  val FastaSchema: StructType = StructType(Seq(
    StructField("header", StringType, nullable = false),
    StructField("sequence", StringType, nullable = false)))
  val FastqSchema: StructType = StructType(Seq(
    StructField("header", StringType, nullable = false),
    StructField("sequence", StringType, nullable = false),
    StructField("quality", StringType, nullable = false)))

  def schemaFor(fmt: String): StructType =
    if (fmt == "fastq") FastqSchema else FastaSchema

  def resolveFiles(paths: Seq[String], conf: Configuration): Seq[FileStatus] =
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      matched.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }
    }.filter { st =>
      // Hadoop convention: skip hidden/metadata files (_SUCCESS, .crc) so a
      // Spark-written directory of records scans cleanly
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }.sortBy(_.getPath.toString)

  /** Wrap `raw` in the right decompressor for `path`, or return it as-is.
    * Hadoop's codec factory covers gz/bz2/deflate; zstd and xz (which
    * needletail also decompresses transparently) go through
    * commons-compress since the Hadoop zstd codec needs native hadoop. */
  def decompressed(path: Path, raw: java.io.InputStream, conf: Configuration): java.io.InputStream = {
    val name = path.getName.toLowerCase
    // zstd/xz go through commons-compress FIRST: Hadoop's factory claims
    // .zst but its ZStandardCodec needs native libhadoop (absent here)
    if (name.endsWith(".zst") || name.endsWith(".zstd"))
      new org.apache.commons.compress.compressors.zstandard.ZstdCompressorInputStream(raw)
    else if (name.endsWith(".xz"))
      new org.apache.commons.compress.compressors.xz.XZCompressorInputStream(raw)
    else {
      val codec = new CompressionCodecFactory(conf).getCodec(path)
      if (codec != null) codec.createInputStream(raw) else raw
    }
  }

  /** True when `path` will be decompressed (hence non-splittable). */
  def isCompressed(path: Path, conf: Configuration): Boolean = {
    val name = path.getName.toLowerCase
    new CompressionCodecFactory(conf).getCodec(path) != null ||
      name.endsWith(".zst") || name.endsWith(".zstd") || name.endsWith(".xz")
  }

  /** Sniff format from the first decompressed byte of a file. */
  def sniffFile(path: Path, conf: Configuration): String = {
    val fs = path.getFileSystem(conf)
    val in = decompressed(path, fs.open(path), conf)
    try FastxParser.sniffFormat(in.read())
    finally in.close()
  }
}

class FastxTable(paths: Seq[String], tableSchema: StructType)
  extends Table with SupportsRead {
  override def name(): String = s"fastx(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FastxScanBuilder(paths, tableSchema, options)
}

/** Record-level predicate evaluation for pushed filters — the DSv2 twin of
  * the plugin's `predicate` arg (`fastx_parsers.py:97,125-126`). Only
  * string predicates over the three record columns are claimed; everything
  * else stays a post-scan filter. Evaluated rows that fail are skipped
  * BEFORE they count toward the pushed limit — fixing the reference's
  * pre-predicate limit decrement (SURVEY §0.1.5). */
object FastxFilters {
  import org.apache.spark.sql.sources._

  /** Can `f` be fully evaluated against a FastxRecord? */
  def evaluable(f: Filter): Boolean = f match {
    case EqualTo(_, _: String)      => true
    case StringStartsWith(_, _)     => true
    case StringEndsWith(_, _)       => true
    case StringContains(_, _)       => true
    case IsNotNull(_) | IsNull(_)   => true
    case And(l, r)                  => evaluable(l) && evaluable(r)
    case Or(l, r)                   => evaluable(l) && evaluable(r)
    case Not(c)                     => evaluable(c)
    case _                          => false
  }

  private def field(rec: FastxRecord, attr: String): String = attr match {
    case "header"   => rec.header
    case "sequence" => rec.sequence
    case "quality"  => rec.quality
    case _          => null
  }

  def eval(f: Filter, rec: FastxRecord): Boolean = f match {
    case EqualTo(a, v: String)  => field(rec, a) == v
    case StringStartsWith(a, p) => { val s = field(rec, a); s != null && s.startsWith(p) }
    case StringEndsWith(a, p)   => { val s = field(rec, a); s != null && s.endsWith(p) }
    case StringContains(a, p)   => { val s = field(rec, a); s != null && s.contains(p) }
    case IsNotNull(a)           => field(rec, a) != null
    case IsNull(a)              => field(rec, a) == null
    case And(l, r)              => eval(l, rec) && eval(r, rec)
    case Or(l, r)               => eval(l, rec) || eval(r, rec)
    case Not(c)                 => !eval(c, rec)
    case _                      => true // unclaimed filters never reach the reader
  }

  def predicate(filters: Seq[Filter]): FastxRecord => Boolean =
    if (filters.isEmpty) _ => true
    else rec => filters.forall(eval(_, rec))
}

/** ScanBuilder with column pruning — the DSv2 twin of the plugin's
  * `with_columns` pushdown (`fastx_parsers.py:96,123-124`) — plus filter
  * and limit pushdown. Simple string predicates are evaluated inside the
  * reader (skipping row materialization early, like the plugin's per-batch
  * `df.filter`) but are ALSO returned as post-scan filters so Spark
  * re-applies them — best-effort semantics, always safe. Unlike the
  * reference (which decrements its limit by the PRE-predicate batch size,
  * SURVEY §0.1.5), the per-partition limit cap counts only rows that pass
  * the pushed predicate, and Spark still applies the global limit. */
class FastxScanBuilder(paths: Seq[String], full: StructType,
                       options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {
  import org.apache.spark.sql.sources.Filter

  private var required: StructType = full
  private var limit: Int = -1
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve source column order; Spark may request any subset
    val names = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => names.contains(f.name)))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(FastxFilters.evaluable)
    filters // everything re-applied post-scan (best-effort contract)
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(n: Int): Boolean = {
    limit = n
    false // partial: each partition honors it, Spark still applies the global limit
  }

  override def build(): Scan = {
    val maxSplit = Option(options.get("maxSplitBytes")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    val fastqSplit = Option(options.get("fastqSplit")).forall(_.toBoolean)
    new FastxScan(paths, full, required, maxSplit, limit, pushed.toSeq, fastqSplit)
  }
}

final case class FastxInputPartition(file: String, start: Long, length: Long,
                                     format: String, limit: Int,
                                     filters: Seq[org.apache.spark.sql.sources.Filter])
  extends InputPartition

class FastxScan(paths: Seq[String], full: StructType, required: StructType,
                maxSplitBytes: Long, limit: Int = -1,
                filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty,
                fastqSplit: Boolean = true)
  extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"fastx ${paths.mkString(",")} cols=${required.fieldNames.mkString(",")}" +
      (if (limit >= 0) s" limit=$limit" else "") +
      (if (filters.nonEmpty) s" PushedFilters: [${filters.mkString(", ")}]" else "")

  /** Size statistics from the file lengths (scaled by the pruned-column
    * fraction) so Catalyst's broadcast-threshold and AQE decisions see a
    * real size instead of the unknown-stats default. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val totalBytes = {
      val conf = new Configuration()
      FastxDataSource.resolveFiles(paths, conf).map(_.getLen).sum
    }
    override def sizeInBytes(): java.util.OptionalLong = {
      val frac = math.max(1, required.size).toDouble / math.max(1, full.size)
      java.util.OptionalLong.of(math.max(1L, (totalBytes * frac).toLong))
    }
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    // skip zero-length files (no records, nothing to sniff)
    val files = FastxDataSource.resolveFiles(paths, conf).filter(_.getLen > 0)
    val expected = if (full.size == 3) "fastq" else "fasta"
    files.flatMap { st =>
      val p = st.getPath
      val compressed = FastxDataSource.isCompressed(p, conf)
      val fmt = FastxDataSource.sniffFile(p, conf)
      // fail fast on a mixed-format load: the schema was inferred from one
      // file, so silently parsing a different format would corrupt rows
      require(fmt == expected,
        s"fastx: $p is $fmt but the load was planned as $expected " +
          "(mixed FASTA/FASTQ directories are not supported — load them separately)")
      val splittable = !compressed && st.getLen > maxSplitBytes &&
        (fmt == "fasta" || (fmt == "fastq" && fastqSplit))
      if (splittable) {
        // splittable: byte ranges; the reader resyncs (\n> for FASTA,
        // 4-line invariant + '+' lookahead for FASTQ)
        (0L until st.getLen by maxSplitBytes).map { off =>
          FastxInputPartition(p.toString, off, math.min(maxSplitBytes, st.getLen - off), fmt, limit, filters)
        }
      } else {
        Seq(FastxInputPartition(p.toString, 0L, st.getLen, fmt, limit, filters))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FastxReaderFactory(required.fieldNames)
}

class FastxReaderFactory(columns: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FastxPartitionReader(partition.asInstanceOf[FastxInputPartition], columns)
}

/** Per-partition streaming reader: opens the file (seeking for FASTA
  * splits), parses records, emits only the pruned columns. Row-at-a-time
  * iterator — Spark batches into columnar memory internally, mirroring the
  * reference's 512-row batch pull (`fastx_parsers.py:101-127`) without a
  * user-visible knob. */
class FastxPartitionReader(part: FastxInputPartition, columns: Array[String])
  extends PartitionReader[InternalRow] {

  private val conf = new Configuration()
  private val path = new Path(part.file)
  private val fs = path.getFileSystem(conf)
  private val compressed = FastxDataSource.isCompressed(path, conf)
  private val rawStream = fs.open(path)

  private val records: Iterator[FastxRecord] = {
    val wholeFile = part.start == 0 &&
      (compressed || part.length >= fs.getFileStatus(path).getLen)
    if (part.format == "fastq" && wholeFile) {
      // whole-file stream: multi-line-tolerant parser (needletail parity)
      val in = FastxDataSource.decompressed(path, rawStream, conf)
      FastxParser.fastqRecords(new PosLineReader(in))
    } else if (part.format == "fastq") {
      // FASTQ byte range [start, start+length) of a multi-split file:
      // strict-4-line split parser. start > 0 seeks, discards the partial
      // first line, and resyncs on the 4-line invariant; the first split
      // starts at a true record start and only needs the ownership bound.
      rawStream.seek(part.start)
      val reader = new PosLineReader(rawStream, part.start)
      if (part.start > 0) reader.readLine()
      FastxParser.fastqRecordsSplit(reader, part.start + part.length,
        resync = part.start > 0)
    } else if (compressed) {
      FastxParser.fastaRecords(
        new PosLineReader(FastxDataSource.decompressed(path, rawStream, conf)))
    } else {
      // splittable FASTA range [start, start+length): Hadoop convention —
      // seek, discard the partial first line when start > 0, own records
      // whose '>' starts at offset <= end (end = full file length for a
      // single-partition file, which owns every record).
      rawStream.seek(part.start)
      val reader = new PosLineReader(rawStream, part.start)
      if (part.start > 0) reader.readLine()
      FastxParser.fastaRecords(reader, part.start + part.length)
    }
  }

  private val pred: FastxRecord => Boolean = FastxFilters.predicate(part.filters)
  private var current: FastxRecord = _
  private var emitted = 0

  override def next(): Boolean = {
    // pushed predicate first; only PASSING rows count toward the pushed
    // limit (the reference decrements pre-predicate, SURVEY §0.1.5)
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
    val values = columns.map {
      case "header"   => UTF8String.fromString(current.header)
      case "sequence" => UTF8String.fromString(current.sequence)
      case "quality"  => if (current.quality == null) null else UTF8String.fromString(current.quality)
    }
    InternalRow.fromSeq(values.toSeq)
  }

  override def close(): Unit = rawStream.close()
}
