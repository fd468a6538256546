package graft.sources.warc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDX indexing + random-access record fetch — the third leg of the crawl
  * story (round-15 verdict item 1): ingest (the warc source) → index (this
  * file) → serve (point lookups that seek straight to one record). Every
  * public-crawl consumer resolves URLs through a CDX index instead of
  * rescanning containers; the warc schema's `(record_file, record_offset)`
  * columns (the r14 "CDX seed") exist exactly for this.
  *
  * Artifact layout, Spark-first:
  *  - [[cdxRecords]] derives the index rows from a warc scan (`response`
  *    records only — the filter pushes into the reader): SURT sort key,
  *    capture date, address triplet, payload digest.
  *  - [[writeCdxj]] writes the interop artifact: CDXJ-style text lines
  *    (`surt date {json}`) GLOBALLY sorted across shards by range
  *    partitioning + within-shard sort — the layout CDX servers binary-
  *    search; shard k's keys all precede shard k+1's.
  *  - [[writeCdxParquet]] writes the engine-serving twin: the same rows
  *    sorted by key into parquet, so a key-equality lookup scans with the
  *    filter PUSHED and row groups pruned by min/max zone maps — a point
  *    lookup touches O(1) row groups of the index, never the corpus.
  *  - [[fetchRecords]] seeks each looked-up address and materializes
  *    EXACTLY ONE record: for record-gzip containers it inflates the one
  *    member at the offset ([[GzipMembers.inflateMember]], no resync —
  *    the index is authoritative); for plain containers it seeks to the
  *    version line and Content-Length-walks one record. The candidate set
  *    is the bounded output of an index lookup, fetched distributed (one
  *    task per partition of the hit list), so serving parallelizes across
  *    executors while each fetch reads only its record's bytes.
  *
  * At 100 TB: the index build is one pushed-down container scan plus one
  * range shuffle of (key, address) rows — tiny next to payload bytes; the
  * artifact is ~0.1% of corpus size; lookups never touch containers except
  * for the exact member/record byte ranges they return. */
object CdxIndex {

  /** SURT-style sort key (Sort-friendly URI Reordering Transform — the key
    * convention CDX files use): host labels reversed and comma-joined, the
    * non-default port kept after the reversed host, `)` separator, then
    * the canonical path+query. Built on the canonicalized URL
    * ([[graft.plans.UrlExpressions.urlCanon]]) so URL aliases land on one
    * key. Pure string ops — engine-portable, replayed verbatim by the
    * q_cdx_fetch oracle. (IPv6 bracket authorities keep their bracket form
    * unreversed — label reversal is a DNS-name concept.) */
  def surtKey(uri: Column): Column = {
    val canon = graft.plans.UrlExpressions.urlCanon(uri)
    val rest = substring_index(canon, "://", -1)
    val hostport = substring_index(rest, "/", 1) // canon paths always start '/'
    val bracket = hostport.startsWith("[")
    val host = when(bracket, hostport).otherwise(substring_index(hostport, ":", 1))
    val port = when(bracket, lit("")).otherwise(
      when(instr(hostport, ":") > 0,
        concat(lit(":"), substring_index(hostport, ":", -1))).otherwise(lit("")))
    val revHost = when(bracket, host)
      .otherwise(array_join(reverse(split(host, "\\.")), ","))
    val pathq = rest.substr(length(hostport) + 1, length(canon))
    concat(revHost, port, lit(")"), pathq)
  }

  /** Index rows from a warc scan: one row per `response` record. The
    * record_type filter and 6-column prune push into the warc reader —
    * payload bytes are read (for the digest) but request/metadata records
    * never materialize rows. */
  def cdxRecords(warc: DataFrame): DataFrame =
    warc.filter(col("record_type") === "response")
      .select(
        surtKey(col("target_uri")).as("surt"),
        col("warc_date"),
        col("target_uri"),
        col("record_file"),
        col("record_offset"),
        col("content_length"),
        md5(col("payload")).as("payload_digest"))

  private val CdxJsonSchema = StructType(Seq(
    StructField("url", StringType), StructField("filename", StringType),
    StructField("offset", LongType), StructField("length", LongType),
    StructField("digest", StringType)))

  /** The interop artifact: CDXJ-style lines `surt date {json}`, globally
    * sorted — `repartitionByRange` gives shards disjoint ascending key
    * ranges and `sortWithinPartitions` orders each shard, so concatenating
    * shards in file order yields one sorted index (what CDX consumers
    * binary-search). */
  def writeCdxj(cdx: DataFrame, path: String, numShards: Int = 4): Unit =
    cdx.repartitionByRange(numShards, col("surt"), col("record_offset"))
      .sortWithinPartitions(col("surt"), col("record_offset"))
      .select(concat_ws(" ", col("surt"), col("warc_date"),
        to_json(struct(col("target_uri").as("url"),
          col("record_file").as("filename"),
          col("record_offset").as("offset"),
          col("content_length").as("length"),
          col("payload_digest").as("digest")))).as("value"))
      .write.mode("overwrite").text(path)

  /** Parse the CDXJ artifact back to columns (keys first, JSON body via
    * from_json). SURT keys and dates are space-free by construction. */
  def readCdxj(spark: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), " ", 3)
    spark.read.text(path)
      .select(parts.getItem(0).as("surt"), parts.getItem(1).as("warc_date"),
        from_json(parts.getItem(2), CdxJsonSchema).as("j"))
      .select(col("surt"), col("warc_date"), col("j.url").as("target_uri"),
        col("j.filename").as("record_file"), col("j.offset").as("record_offset"),
        col("j.length").as("content_length"), col("j.digest").as("payload_digest"))
  }

  /** The engine-serving twin: the same index rows key-sorted into parquet.
    * A `surt = '…'` lookup scans this with the filter pushed to the
    * parquet reader and row groups pruned by min/max statistics — the
    * sorted layout is what makes the zone maps selective. */
  def writeCdxParquet(cdx: DataFrame, path: String, numShards: Int = 4): Unit =
    cdx.repartitionByRange(numShards, col("surt"), col("record_offset"))
      .sortWithinPartitions(col("surt"), col("record_offset"))
      .write.mode("overwrite").parquet(path)

  private val FetchedSchema = StructType(Seq(
    StructField("probe_id", LongType, nullable = false),
    StructField("record_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType)))

  /** Random-access fetch: `addrs` rows (probe_id, record_file,
    * record_offset) — the BOUNDED hit list of an index lookup — each seek
    * one container record. `dir` is the container directory (record_file
    * is a bare file name, as the warc schema exposes it); `gzMembers`
    * selects the per-record-gzip walk. Distributed: each partition of the
    * hit list opens its files, seeks, and materializes only its records'
    * bytes — never a container scan. Fails loudly on a bad address (the
    * index is authoritative; a miss means index/container drift). */
  def fetchRecords(addrs: DataFrame, dir: String, gzMembers: Boolean): DataFrame = {
    val spark = addrs.sparkSession
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rdd = addrs
      .select(col("probe_id").cast("long"), col("record_file"),
        col("record_offset").cast("long"))
      .rdd.mapPartitions { rows =>
        // one open stream per distinct file within the partition — hit
        // lists arrive sorted by (file, offset) from the index, so this
        // is at most a handful of opens per task
        var curFile: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        var fileLen = 0L
        def open(name: String): Unit = {
          if (name != curFile) {
            if (in != null) in.close()
            val p = new org.apache.hadoop.fs.Path(dir, name)
            val fs = p.getFileSystem(serConf.value)
            in = fs.open(p)
            fileLen = fs.getFileStatus(p).getLen
            curFile = name
          }
        }
        val out = rows.map { r =>
          val (pid, name, off) = (r.getLong(0), r.getString(1), r.getLong(2))
          open(name)
          val rec =
            if (gzMembers) {
              val m = GzipMembers.inflateMember(
                new GzipMembers.RawReader(in, fileLen), off)
              if (m == null) throw new IllegalStateException(
                s"cdx fetch: no valid gzip member at $name:$off (index/container drift)")
              val it = WarcParser.records(
                new PosByteReader(new java.io.ByteArrayInputStream(m._1)))
              if (!it.hasNext) throw new IllegalStateException(
                s"cdx fetch: empty member at $name:$off")
              it.next()
            } else {
              in.seek(off)
              val it = WarcParser.records(new PosByteReader(in, off))
              if (!it.hasNext) throw new IllegalStateException(
                s"cdx fetch: no record at $name:$off (index/container drift)")
              it.next()
            }
          org.apache.spark.sql.Row(pid, rec.recordType, rec.recordId,
            rec.targetUri, rec.contentLength, rec.payload)
        }
        // close the tail stream once the iterator drains
        new Iterator[org.apache.spark.sql.Row] {
          override def hasNext: Boolean = {
            val h = out.hasNext
            if (!h && in != null) { in.close(); in = null }
            h
          }
          override def next(): org.apache.spark.sql.Row = out.next()
        }
      }
    spark.createDataFrame(rdd, FetchedSchema)
  }
}
