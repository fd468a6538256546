package graft.sources.warc

import java.io.InputStream

/** A parsed WARC record (ISO 28500 — the container format of every public
  * web crawl, e.g. Common Crawl). `payload` is the raw content block
  * (binary-exact: for `response` records it is the full HTTP message,
  * headers + body). `offset` is the absolute byte offset of the record's
  * version line — the split-ownership key.
  *
  * This is extension territory per the round-13 verdict (the reference
  * engine reads FASTX only, `fastx_parsers.py:70-129`); the splittable
  * read discipline mirrors the FASTQ resync at
  * `graft.sources.fastx.FastxParser` (record-marker + invariant walk). */
final case class WarcRecord(recordType: String, recordId: String,
                            targetUri: String, warcDate: String,
                            contentType: String, contentLength: Long,
                            payload: Array[Byte], offset: Long,
                            refersTo: String = null)

/** Byte reader tracking absolute offsets, with BOTH line reads (WARC
  * headers are ASCII `name: value` lines, CRLF-terminated) and exact raw
  * reads (content blocks are binary and must be walked by Content-Length,
  * never by line scanning). Lines decode as ISO-8859-1 so every byte maps
  * to exactly one char — a resync scan crossing binary payload bytes can
  * never throw on malformed UTF-8. */
final class PosByteReader(in: InputStream, baseOffset: Long = 0L) {
  private var pos: Long = baseOffset
  private val buf = new Array[Byte](64 * 1024)
  private var bufLen = 0
  private var bufPos = 0
  private var eof = false

  def position: Long = pos

  private def fill(): Boolean = {
    if (eof) return false
    bufLen = in.read(buf)
    bufPos = 0
    if (bufLen <= 0) { eof = true; false } else true
  }

  /** Next line without its terminator (LF or CRLF), or null at EOF. */
  def readLine(): String = {
    val sb = new java.lang.StringBuilder(96)
    var sawAny = false
    var done = false
    while (!done) {
      if (bufPos >= bufLen && !fill()) done = true
      else {
        sawAny = true
        var i = bufPos
        var nl = -1
        while (i < bufLen && nl < 0) {
          if (buf(i) == '\n') nl = i else i += 1
        }
        if (nl >= 0) {
          sb.append(new String(buf, bufPos, nl - bufPos, "ISO-8859-1"))
          pos += (nl - bufPos + 1)
          bufPos = nl + 1
          done = true
        } else {
          sb.append(new String(buf, bufPos, bufLen - bufPos, "ISO-8859-1"))
          pos += (bufLen - bufPos)
          bufPos = bufLen
        }
      }
    }
    if (!sawAny) null
    else {
      val s = sb.toString
      if (s.nonEmpty && s.charAt(s.length - 1) == '\r') s.substring(0, s.length - 1) else s
    }
  }

  /** Exactly `n` raw bytes, or null if the stream ends first. */
  def readFully(n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var got = 0
    while (got < n) {
      if (bufPos >= bufLen && !fill()) return null
      val take = math.min(n - got, bufLen - bufPos)
      System.arraycopy(buf, bufPos, out, got, take)
      bufPos += take
      pos += take
      got += take
    }
    out
  }
}

/** Streaming WARC record parsing over a [[PosByteReader]].
  *
  * Record grammar (ISO 28500): a `WARC/1.x` version line, `name: value`
  * header lines, one empty line, `Content-Length` bytes of content block,
  * then CRLF CRLF. Parsing WALKS Content-Length — the content block is
  * binary and may contain anything, including text that looks like WARC
  * headers — so from a true record start the parse can never lose
  * framing (the same role the strict 4-line invariant plays for FASTQ).
  *
  * Split resync (the `fastqRecordsSplit` discipline): a split seeking
  * into the middle of a file discards the partial first line, then scans
  * line-by-line for a `WARC/1.x` version line and VALIDATES the candidate
  * by parsing its full header block (well-formed `name: value` lines, a
  * digits-only Content-Length, a blank terminator within
  * [[WarcParser.MaxHeaderLines]]); a failed candidate resumes the scan at
  * the line after the false version line. The one resync per split is the
  * only scan that can cross payload bytes; the documented invariant is
  * that payloads do not embed a full valid WARC header block at a line
  * start (true of HTTP captures; a crawl OF warc files would need
  * record-gzipped inputs, which read whole-file here like every
  * compressed container).
  *
  * Ownership matches the fastx sources: a split [start, end) owns records
  * whose version line starts at offset p <= end, with the caller having
  * discarded the partial first line when start > 0 (so a record starting
  * exactly at `start` belongs to the PREVIOUS split, which reads its last
  * owned record to completion past its end). */
object WarcParser {

  /** Header-block validation bound: real WARC records carry well under 32
    * named headers; a candidate that has not terminated by then is payload
    * bytes, not a record. */
  val MaxHeaderLines = 64

  private def isVersionLine(l: String): Boolean =
    l == "WARC/1.0" || l == "WARC/1.1"

  /** Parse the header block after a version line: (headers, ok). Header
    * names are case-insensitive per spec — keys are lowercased. */
  private def readHeaders(reader: PosByteReader): Option[Map[String, String]] = {
    val m = Map.newBuilder[String, String]
    var n = 0
    while (n < MaxHeaderLines) {
      val l = reader.readLine()
      if (l == null) return None // EOF mid-headers
      if (l.isEmpty) return Some(m.result())
      val c = l.indexOf(':')
      if (c <= 0) return None // malformed header line
      m += (l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
      n += 1
    }
    None // unterminated header block: payload bytes, not a record
  }

  private def contentLengthOf(h: Map[String, String]): Option[Long] =
    h.get("content-length").filter(v => v.nonEmpty && v.forall(_.isDigit))
      .map(_.toLong)

  /** Parse one record whose version line has just been consumed at
    * `offset`. Strict from a true start: throws on malformed framing. */
  private def parseAfterVersion(reader: PosByteReader, offset: Long): WarcRecord = {
    val h = readHeaders(reader).getOrElse(throw new IllegalArgumentException(
      s"Malformed WARC: bad header block at offset $offset"))
    parsePayload(reader, offset, h)
  }

  /** Content-Length walk + record terminator, from a reader positioned at
    * the content block. */
  private def parsePayload(reader: PosByteReader, offset: Long,
                           h: Map[String, String]): WarcRecord = {
    val len = contentLengthOf(h).getOrElse(throw new IllegalArgumentException(
      s"Malformed WARC: missing/invalid Content-Length at offset $offset"))
    require(len <= Int.MaxValue.toLong,
      s"WARC record at offset $offset exceeds the 2 GiB single-record bound")
    val payload = reader.readFully(len.toInt)
    if (payload == null) throw new IllegalArgumentException(
      s"Malformed WARC: truncated content block at offset $offset")
    // the two record-terminating CRLFs
    val t1 = reader.readLine(); val t2 = reader.readLine()
    if (t1 == null || t1.nonEmpty || t2 == null || t2.nonEmpty)
      throw new IllegalArgumentException(
        s"Malformed WARC: missing record terminator after offset $offset")
    WarcRecord(
      h.getOrElse("warc-type", ""),
      h.getOrElse("warc-record-id", ""),
      h.getOrElse("warc-target-uri", null),
      h.getOrElse("warc-date", ""),
      h.getOrElse("content-type", null),
      len, payload, offset,
      // WARC-Refers-To: the revisit back-pointer (item 8) — the id of the
      // capture whose payload this record deduplicates against
      h.getOrElse("warc-refers-to", null))
  }

  /** Records of the byte range [reader.position, ownedEnd] (version-line
    * offsets), resyncing first when `resync`.
    *
    * The resync is a LINE-LOOKAHEAD scan (the `fastqRecordsSplit` queue
    * discipline): a `WARC/1.x` candidate is validated by PEEKING its
    * whole header block — well-formed `name: value` lines, a digits-only
    * Content-Length, a blank terminator within [[MaxHeaderLines]] —
    * without consuming anything, so a failed candidate rescans from the
    * very next line (a true record start inside a false candidate's
    * lookahead window is never skipped). Only a fully validated candidate
    * drains the queue, leaving the byte reader positioned exactly at the
    * content block for the Content-Length walk. */
  def records(reader: PosByteReader, ownedEnd: Long = Long.MaxValue,
              resync: Boolean = false): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private val lookahead = scala.collection.mutable.Queue.empty[(String, Long)]

      private def readRaw(): (String, Long) = {
        val p = reader.position
        val l = reader.readLine()
        if (l == null) null else (l, p)
      }
      private def peek(i: Int): (String, Long) = {
        while (lookahead.length <= i) {
          val r = readRaw()
          if (r == null) return null
          lookahead.enqueue(r)
        }
        lookahead(i)
      }
      private def take(): (String, Long) =
        if (lookahead.nonEmpty) lookahead.dequeue() else readRaw()

      /** Peek-validate a header block starting at lookahead index 1 (the
        * line after the version line). Returns the index of the blank
        * terminator line, or -1 if the block is not a valid record head. */
      private def validateHead: Int = {
        var i = 1
        var sawLength = false
        while (i <= MaxHeaderLines) {
          val l = peek(i)
          if (l == null) return -1
          if (l._1.isEmpty) return if (sawLength) i else -1
          val c = l._1.indexOf(':')
          if (c <= 0) return -1
          if (l._1.substring(0, c).trim.equalsIgnoreCase("content-length")) {
            val v = l._1.substring(c + 1).trim
            if (v.isEmpty || !v.forall(_.isDigit)) return -1
            sawLength = true
          }
          i += 1
        }
        -1
      }

      /** From a trusted position: expect EOF or a version line (framing
        * from a true start is exact — anything else is malformed). */
      private def fetch(): WarcRecord = {
        var h = take()
        if (h == null || h._2 > ownedEnd) return null
        if (!isVersionLine(h._1)) throw new IllegalArgumentException(
          s"Malformed WARC: expected version line at offset ${h._2}, got: ${h._1}")
        // the lookahead is empty here (resync drains it before parsing),
        // so the byte reader is positioned right after the version line
        parseAfterVersion(reader, h._2)
      }

      private def resyncFetch(): WarcRecord = {
        var found = false
        while (!found) {
          val head = peek(0)
          if (head == null || head._2 > ownedEnd) return null
          if (isVersionLine(head._1) && validateHead > 0) found = true
          else take() // not a record start: rescan from the next line
        }
        val start = lookahead.head._2
        // drain version + headers + blank so the byte reader sits at the
        // content block, then run the strict parse on the drained strings
        take() // version line
        val hdrs = Map.newBuilder[String, String]
        var l = take()
        while (l._1.nonEmpty) {
          val c = l._1.indexOf(':')
          hdrs += (l._1.substring(0, c).trim.toLowerCase -> l._1.substring(c + 1).trim)
          l = take()
        }
        parsePayload(reader, start, hdrs.result())
      }

      private var nextRec: WarcRecord = if (resync) resyncFetch() else fetch()

      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; nextRec = fetch(); r
      }
    }
}
