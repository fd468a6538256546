package graft.sources.fastx

import java.io.InputStream

/** A parsed FASTX record. `quality` is null for FASTA.
  *
  * Record semantics mirror needletail 0.7.0 (the reference's parser backend,
  * reference `pyproject.toml:8`, consumed at `fastx_parsers.py:113-114`):
  * `header` is the full line after the `>`/`@` marker including any
  * description after the first space; `sequence` concatenates all sequence
  * lines (multi-line FASTA); `quality` is the Phred string (FASTQ only).
  */
final case class FastxRecord(header: String, sequence: String, quality: String)

/** Byte-offset-tracking line reader: the building block for splittable
  * reads. Returns lines without their terminator; handles LF and CRLF
  * (trailing `\r` stripped — in FASTX, `\r` only occurs as part of CRLF).
  * `position` is the absolute byte offset of the next unread byte
  * (`baseOffset` + bytes consumed), advancing past terminators.
  */
final class PosLineReader(in: InputStream, baseOffset: Long = 0L) {
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

  /** Next line (terminator stripped), or null at EOF. */
  def readLine(): String = {
    val sb = new java.lang.StringBuilder(128)
    var sawAny = false
    var done = false
    while (!done) {
      if (bufPos >= bufLen && !fill()) {
        done = true
      } else {
        sawAny = true
        var i = bufPos
        var nl = -1
        while (i < bufLen && nl < 0) {
          if (buf(i) == '\n') nl = i else i += 1
        }
        if (nl >= 0) {
          sb.append(new String(buf, bufPos, nl - bufPos, "UTF-8"))
          pos += (nl - bufPos + 1)
          bufPos = nl + 1
          done = true
        } else {
          sb.append(new String(buf, bufPos, bufLen - bufPos, "UTF-8"))
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
}

/** Streaming FASTA/FASTQ record parsing over a [[PosLineReader]].
  *
  * FASTA: a record starts at a `>` line; sequence lines are concatenated
  * until the next `>` or EOF. FASTQ: strict 4-line records (`@`header,
  * sequence, `+`separator, quality) — quality lines may begin with `@`,
  * which is why FASTQ is parsed positionally, never by sniffing `@`
  * (SURVEY §7.3.1 ambiguity).
  *
  * Split ownership (FASTA): Hadoop text-split convention. A split
  * [start, end) owns every record whose `>` line starts at offset p with
  * p <= end, where the caller has already discarded the (possibly partial)
  * first line when start > 0 — so the line starting exactly at `end` is
  * read by this split and discarded by the next. The last owned record is
  * always read to completion past `end`.
  */
object FastxParser {

  /** Sniff format from the first byte marker, as needletail does from the
    * first record (`fastx_parsers.py:87-88`). */
  def sniffFormat(firstByte: Int): String = firstByte match {
    case '>' => "fasta"
    case '@' => "fastq"
    case -1  => "fasta" // empty file: degenerate, yields no records
    case b   => throw new IllegalArgumentException(
      s"Not a FASTX file: first byte '${b.toChar}' is neither '>' nor '@'")
  }

  /** FASTA records whose header line starts at offset <= ownedEnd.
    * The reader may be positioned mid-record (after a split seek + partial
    * line discard): lines before the first owned `>` are skipped. */
  def fastaRecords(reader: PosLineReader, ownedEnd: Long = Long.MaxValue): Iterator[FastxRecord] =
    new Iterator[FastxRecord] {
      private var pendingHeader: String = null
      locate()

      private def locate(): Unit = {
        var before = reader.position
        var line = reader.readLine()
        while (line != null && !line.startsWith(">")) {
          before = reader.position
          line = reader.readLine()
        }
        if (line != null && before <= ownedEnd) pendingHeader = line.substring(1)
      }

      override def hasNext: Boolean = pendingHeader != null

      override def next(): FastxRecord = {
        val header = pendingHeader
        pendingHeader = null
        val seq = new java.lang.StringBuilder(256)
        var done = false
        while (!done) {
          val before = reader.position
          val line = reader.readLine()
          if (line == null) done = true
          else if (line.startsWith(">")) {
            if (before <= ownedEnd) pendingHeader = line.substring(1)
            done = true
          } else seq.append(line)
        }
        FastxRecord(header, seq.toString, null)
      }
    }

  /** FASTQ records from the stream start (non-splittable). Multi-line
    * tolerant, matching needletail: sequence lines accumulate until the
    * `+` separator; quality lines accumulate until the quality length
    * reaches the sequence length (which is why a quality line starting
    * with `@` can never be misread as a header — SURVEY §7.3.1). */
  def fastqRecords(reader: PosLineReader): Iterator[FastxRecord] =
    new Iterator[FastxRecord] {
      private var nextRec: FastxRecord = fetch()

      private def fetch(): FastxRecord = {
        var h = reader.readLine()
        while (h != null && h.isEmpty) h = reader.readLine() // tolerate blank separator lines
        if (h == null) return null
        if (!h.startsWith("@"))
          throw new IllegalArgumentException(s"Malformed FASTQ: expected '@' header, got: $h")
        val seq = new java.lang.StringBuilder(256)
        var line = reader.readLine()
        while (line != null && !line.startsWith("+")) {
          seq.append(line)
          line = reader.readLine()
        }
        if (line == null)
          throw new IllegalArgumentException(s"Malformed FASTQ: missing '+' separator in '$h'")
        val qual = new java.lang.StringBuilder(seq.length)
        while (qual.length < seq.length) {
          val q = reader.readLine()
          if (q == null)
            throw new IllegalArgumentException(s"Malformed FASTQ: truncated quality in '$h'")
          qual.append(q)
        }
        if (qual.length > seq.length)
          throw new IllegalArgumentException(
            s"Malformed FASTQ: quality longer than sequence in '$h'")
        FastxRecord(h.substring(1), seq.toString, qual.toString)
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): FastxRecord = {
        val r = nextRec; nextRec = fetch(); r
      }
    }

  /** FASTQ records for a byte-range split [start, end) of a STRICT 4-line
    * FASTQ file (one sequence line, one quality line per record — the
    * universal layout of real sequencing output; needletail's multi-line
    * tolerance is kept on the whole-file path).
    *
    * Resync (SURVEY §7.3.1): a split cannot sniff `@` alone because
    * quality lines may start with `@`. A line L at a line boundary is a
    * record start iff L starts with `@`, the line two ahead starts with
    * `+` (the separator — sequence lines are base alphabet, never `+`),
    * and the lines one and three ahead (sequence, quality) have equal
    * length. A quality line that starts with `@` fails the separator
    * check (two lines ahead is the NEXT record's sequence), so the
    * candidate scan lands on the true header in at most 4 lines.
    *
    * Ownership matches [[fastaRecords]]: this split owns records whose
    * `@` header line starts at offset p <= ownedEnd; the caller has
    * already discarded the (possibly partial) first line when seeking to
    * start > 0, so a header starting exactly at `start` is consumed by
    * the discard here and owned by the PREVIOUS split (p <= its end).
    * The last owned record is read to completion past `end`. */
  def fastqRecordsSplit(reader: PosLineReader, ownedEnd: Long,
                        resync: Boolean): Iterator[FastxRecord] =
    new Iterator[FastxRecord] {
      // lookahead queue of (line, absolute start offset of the line)
      private val lookahead = scala.collection.mutable.Queue.empty[(String, Long)]

      private def readRaw(): (String, Long) = {
        val p = reader.position
        val l = reader.readLine()
        if (l == null) null else (l, p)
      }
      /** i-th unconsumed line, or null past EOF. */
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

      /** Is the head of the stream a 4-line record start? */
      private def headIsRecordStart: Boolean = {
        val h = peek(0)
        if (h == null || !h._1.startsWith("@")) return false
        val sep = peek(2)
        if (sep == null || !sep._1.startsWith("+")) return false
        val s = peek(1); val q = peek(3)
        // truncated final record: let the parser raise its malformed error
        q == null || s._1.length == q._1.length
      }

      if (resync) {
        // drop mid-record lines until the head is a true record start;
        // trailing non-record lines (all owned by an earlier split) drain
        // to EOF and the iterator is simply empty
        while (peek(0) != null && !headIsRecordStart) take()
      }

      private var nextRec: FastxRecord = fetch()

      // the split path assumes strict 4-line records; a multi-line FASTQ
      // fails fast here (never silently corrupts), and the remedy is the
      // whole-file reader — say so in the error instead of making callers
      // discover the opt-out in the docs
      private def hint: String =
        " (multi-line FASTQ? set option fastqSplit=false to use the non-split reader)"

      private def fetch(): FastxRecord = {
        var h = take()
        while (h != null && h._1.isEmpty) h = take()
        if (h == null || h._2 > ownedEnd) return null // next split's record
        if (!h._1.startsWith("@"))
          throw new IllegalArgumentException(
            s"Malformed FASTQ: expected '@' header, got: ${h._1}$hint")
        val seq = take()
        val sep = take()
        if (seq == null || sep == null || !sep._1.startsWith("+"))
          throw new IllegalArgumentException(
            s"Malformed FASTQ: missing '+' separator in '${h._1}'$hint")
        val qual = take()
        if (qual == null)
          throw new IllegalArgumentException(
            s"Malformed FASTQ: truncated quality in '${h._1}'$hint")
        if (qual._1.length != seq._1.length)
          throw new IllegalArgumentException(
            s"Malformed FASTQ: quality/sequence length mismatch in '${h._1}'$hint")
        FastxRecord(h._1.substring(1), seq._1, qual._1)
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): FastxRecord = {
        val r = nextRec; nextRec = fetch(); r
      }
    }
}
