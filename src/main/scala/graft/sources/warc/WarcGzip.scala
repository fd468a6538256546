package graft.sources.warc

import java.util.zip.{DataFormatException, Inflater}

import org.apache.hadoop.fs.FSDataInputStream

/** Splittable reads of PER-RECORD-GZIPPED WARC — the layout public crawls
  * actually ship (each Common Crawl `.warc.gz` record is its own gzip
  * MEMBER, members concatenated), which is what makes a compressed crawl
  * file splittable at all: a member boundary is a safe entry point, and
  * RFC 1952 lets members be concatenated freely.
  *
  * A split [start, end) owns the members whose first header byte lies in
  * [start, end) — member starts are EXACT here (unlike text resync, the
  * walker knows each member's compressed length from the inflater), so
  * ownership needs no discard convention: `start` inclusive, `end`
  * exclusive, every member owned by exactly one split.
  *
  * Resync: scan raw bytes from `start` for the gzip magic `1f 8b 08`,
  * parse the full RFC 1952 header (FEXTRA/FNAME/FCOMMENT/FHCRC all
  * handled — real crawl writers set FNAME), and VALIDATE by inflating
  * the first 8 decompressed bytes, which must be `WARC/1.` + digit; a
  * false magic inside compressed data fails the prefix check (or the
  * header parse, or the inflate) and the scan resumes at the next byte.
  * From a validated member the walk is exact: decompressed length-walked
  * records, next member at `headerLen + deflateBytes + 8` (CRC32+ISIZE
  * trailer).
  *
  * One member decompresses at a time (a member is one record in crawl
  * data — bounded by the record bound, never the file). A MONOLITHIC
  * single-member gzip (a whole .warc piped through `gzip`) is NOT this
  * layout: its one "member" is the entire corpus, so split 0 would
  * materialize everything — that is why `recordGzipSplit` is an explicit
  * reader option rather than inferred from the extension, and the
  * default path reads any compressed file whole-file via the streaming
  * codec. */
object GzipMembers {

  /** Buffered random-position byte view over a seekable stream. */
  final class RawReader(in: FSDataInputStream, val fileLen: Long) {
    private val buf = new Array[Byte](256 * 1024)
    private var bufStart = 0L
    private var bufLen = 0

    private def ensure(pos: Long): Unit = {
      if (pos < bufStart || pos >= bufStart + bufLen) {
        in.seek(pos)
        bufStart = pos
        bufLen = 0
        val want = math.min(buf.length.toLong, fileLen - pos).toInt
        while (bufLen < want) {
          val n = in.read(buf, bufLen, want - bufLen)
          if (n < 0) return
          bufLen += n
        }
      }
    }

    /** Byte at `pos` (0-255), or -1 past EOF. */
    def byteAt(pos: Long): Int = {
      if (pos >= fileLen) return -1
      ensure(pos)
      buf((pos - bufStart).toInt) & 0xff
    }

    /** Up to `len` bytes from `pos`; returns bytes read (0 at EOF). */
    def read(pos: Long, out: Array[Byte], len: Int): Int = {
      if (pos >= fileLen) return 0
      ensure(pos)
      val n = math.min(len.toLong, (bufStart + bufLen) - pos).toInt
      System.arraycopy(buf, (pos - bufStart).toInt, out, 0, n)
      n
    }
  }

  /** Parse an RFC 1952 member header at `pos`; returns the offset of the
    * deflate stream, or -1 if not a well-formed gzip header. */
  def headerEnd(raw: RawReader, pos: Long): Long = {
    if (raw.byteAt(pos) != 0x1f || raw.byteAt(pos + 1) != 0x8b ||
      raw.byteAt(pos + 2) != 0x08) return -1
    val flg = raw.byteAt(pos + 3)
    if (flg < 0 || (flg & 0xe0) != 0) return -1 // reserved bits must be 0
    var p = pos + 10 // fixed header
    if ((flg & 0x04) != 0) { // FEXTRA: little-endian length
      val lo = raw.byteAt(p); val hi = raw.byteAt(p + 1)
      if (lo < 0 || hi < 0) return -1
      p += 2 + (lo | (hi << 8))
    }
    if ((flg & 0x08) != 0) { // FNAME: zero-terminated
      while (raw.byteAt(p) > 0) p += 1
      if (raw.byteAt(p) < 0) return -1
      p += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT
      while (raw.byteAt(p) > 0) p += 1
      if (raw.byteAt(p) < 0) return -1
      p += 1
    }
    if ((flg & 0x02) != 0) p += 2 // FHCRC
    if (p >= raw.fileLen) -1 else p
  }

  /** One inflated member at `pos`: (decompressed bytes, compressed member
    * length), or null when `pos` is not a valid member whose content
    * starts with `WARC/1.` (the resync validation). */
  def inflateMember(raw: RawReader, pos: Long): (Array[Byte], Long) = {
    val dStart = headerEnd(raw, pos)
    if (dStart < 0) return null
    val inf = new Inflater(true)
    val inBuf = new Array[Byte](64 * 1024)
    val outBuf = new Array[Byte](64 * 1024)
    val out = new java.io.ByteArrayOutputStream(128 * 1024)
    var fed = 0L
    var feedPos = dStart
    var validated = false
    try {
      while (!inf.finished()) {
        if (inf.needsInput()) {
          val n = raw.read(feedPos, inBuf, inBuf.length)
          if (n <= 0) return null // truncated member
          inf.setInput(inBuf, 0, n)
          feedPos += n
          fed += n
        }
        val n = try inf.inflate(outBuf)
        catch { case _: DataFormatException => return null }
        if (n > 0) {
          out.write(outBuf, 0, n)
          if (!validated && out.size >= 8) {
            val head = out.toByteArray
            val ok = head(0) == 'W' && head(1) == 'A' && head(2) == 'R' &&
              head(3) == 'C' && head(4) == '/' && head(5) == '1' &&
              head(6) == '.' && head(7) >= '0' && head(7) <= '9'
            if (!ok) return null
            validated = true
          }
        } else if (n == 0 && inf.needsDictionary()) return null
      }
      if (!validated && out.size > 0) return null // tiny non-WARC member
      if (out.size == 0) return null              // empty member: not a record
      val deflateLen = fed - inf.getRemaining
      val compressed = (dStart - pos) + deflateLen + 8
      if (pos + compressed > raw.fileLen) return null // trailer truncated
      // RFC 1952 trailer verification (little-endian CRC32 + ISIZE):
      // a bit-flipped member must fail loudly here, not ship corrupt
      // payload bytes downstream
      val data = out.toByteArray
      // byte-wise read: a bulk read can return SHORT when the 8 bytes
      // straddle the reader's buffer window (bit us at the 100× fixture —
      // files larger than one 256 KB window)
      val trailer = new Array[Byte](8)
      var k = 0
      while (k < 8) {
        val b = raw.byteAt(pos + compressed - 8 + k)
        if (b < 0) return null
        trailer(k) = b.toByte
        k += 1
      }
      def le32(o: Int): Long =
        (trailer(o) & 0xffL) | ((trailer(o + 1) & 0xffL) << 8) |
          ((trailer(o + 2) & 0xffL) << 16) | ((trailer(o + 3) & 0xffL) << 24)
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      if (le32(0) != crc.getValue || le32(4) != (data.length & 0xffffffffL))
        return null
      (data, compressed)
    } finally inf.end()
  }

  /** WARC records of every member whose start offset lies in
    * [scanFrom, ownedEndExclusive); `resync` scans for the first
    * validated member, otherwise `scanFrom` must BE a member start. */
  def records(raw: RawReader, scanFrom: Long, ownedEndExclusive: Long,
              resync: Boolean): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var pos = scanFrom
      private var memberRecs: Iterator[WarcRecord] = Iterator.empty

      private def advance(): Unit = {
        while (!memberRecs.hasNext && pos < ownedEndExclusive && pos < raw.fileLen) {
          val m = inflateMember(raw, pos)
          if (m == null) {
            if (resync) pos += 1
            else throw new IllegalArgumentException(
              s"Malformed record-gzipped WARC: expected a gzip member at offset $pos")
          } else {
            val start = pos
            pos += m._2
            memberRecs = WarcParser.records(
              new PosByteReader(new java.io.ByteArrayInputStream(m._1)))
              .map(r => r.copy(offset = start))
          }
        }
      }

      override def hasNext: Boolean = { advance(); memberRecs.hasNext }
      override def next(): WarcRecord = { advance(); memberRecs.next() }
    }
}
