package graft.sources.warc

import com.github.luben.zstd.Zstd

/** Splittable reads of FRAME-PER-RECORD zstd WARC (`.warc.zst`) — the
  * zstd twin of [[GzipMembers]] (round-15 verdict item 4; zstd-jni ships
  * in the Spark classpath). Each record is ONE complete zstd frame with
  * the content size recorded in the frame header and a frame checksum
  * appended ([[graft.WarcIO.writeWarc]]'s zstd path); frames concatenate
  * freely per RFC 8878, so a frame boundary is a safe split entry point.
  *
  * Ownership is identical to the gzip walk: a split [start, end) owns the
  * frames whose first magic byte lies in [start, end); frame starts are
  * EXACT (the walker learns each frame's compressed length from
  * `ZSTD_findFrameCompressedSize`), so every frame is owned by exactly one
  * split.
  *
  * Resync: scan raw bytes from `start` for the zstd magic
  * `28 B5 2F FD` (little-endian 0xFD2FB528), validate by walking the
  * frame's block headers (`findFrameCompressedSize` — fails on garbage),
  * reading the header's content size (our writer always records it; an
  * unknown size is not our frame), decompressing, and checking the
  * `WARC/1.` + digit prefix; zstd's own frame checksum is verified during
  * decompression, so a bit-flipped frame fails loudly rather than
  * shipping corrupt payloads. A false magic inside compressed data fails
  * one of those gates and the scan resumes at the next byte.
  *
  * One frame decompresses at a time (a frame is one record — bounded by
  * the record bound, never the file). A monolithic single-frame zstd file
  * is NOT this layout (same reasoning as gzip: its one "frame" is the
  * whole corpus), which is why `recordZstdSplit` is an explicit reader
  * option rather than inferred from the extension. */
object ZstdMembers {

  /** Initial window read per frame walk; doubles until the frame fits.
    * Record frames are one document — virtually always under 256 KB. */
  private val InitialWindow = 256 * 1024

  private def readWindow(raw: GzipMembers.RawReader, pos: Long,
                         len: Int): Array[Byte] = {
    val want = math.min(len.toLong, raw.fileLen - pos).toInt
    val out = new Array[Byte](want)
    var got = 0
    while (got < want) {
      // RawReader.read serves from its 256 KB buffer window — loop to
      // assemble larger frames
      val tmp = new Array[Byte](want - got)
      val n = raw.read(pos + got, tmp, want - got)
      if (n <= 0) return java.util.Arrays.copyOf(out, got)
      System.arraycopy(tmp, 0, out, got, n)
      got += n
    }
    out
  }

  /** One decompressed frame at `pos`: (decompressed bytes, compressed
    * frame length), or null when `pos` is not a valid frame whose content
    * starts with `WARC/1.` (the resync validation). */
  def inflateFrame(raw: GzipMembers.RawReader, pos: Long): (Array[Byte], Long) = {
    if (raw.byteAt(pos) != 0x28 || raw.byteAt(pos + 1) != 0xb5 ||
      raw.byteAt(pos + 2) != 0x2f || raw.byteAt(pos + 3) != 0xfd) return null
    var window = InitialWindow
    while (true) {
      val win = readWindow(raw, pos, window)
      // zstd-jni THROWS on walk errors instead of returning a code:
      // srcSize_wrong = the frame extends past the window (grow, retry);
      // anything else = not a valid frame (false magic → reject)
      val frameLen =
        try Zstd.findFrameCompressedSize(win)
        catch {
          case e: com.github.luben.zstd.ZstdException
            if e.getErrorCode == Zstd.errSrcSizeWrong() => -1L
          case _: com.github.luben.zstd.ZstdException => return null
        }
      if (frameLen < 0) {
        // frame extends past the window: grow and retry; at the file
        // tail the window cannot grow — truncated frame, reject
        if (win.length.toLong >= raw.fileLen - pos) return null
        window *= 2
      } else {
        if (frameLen < 4 || frameLen > win.length) return null
        val frame =
          if (frameLen == win.length) win
          else java.util.Arrays.copyOf(win, frameLen.toInt)
        val contentSize =
          try Zstd.getFrameContentSize(frame, 0, frame.length, false)
          catch { case _: com.github.luben.zstd.ZstdException => return null }
        // our writer always records the content size; unknown/empty is
        // not a record frame (empty members are rejected like gzip's)
        if (Zstd.isError(contentSize) || contentSize <= 0 ||
          contentSize > Int.MaxValue) return null
        val data = new Array[Byte](contentSize.toInt)
        val n =
          try Zstd.decompress(data, frame)
          catch { case _: com.github.luben.zstd.ZstdException => return null }
        if (n != contentSize) return null
        if (data.length < 8) return null
        val ok = data(0) == 'W' && data(1) == 'A' && data(2) == 'R' &&
          data(3) == 'C' && data(4) == '/' && data(5) == '1' &&
          data(6) == '.' && data(7) >= '0' && data(7) <= '9'
        if (!ok) return null
        return (data, frameLen)
      }
    }
    null // unreachable
  }

  /** WARC records of every frame whose start offset lies in
    * [scanFrom, ownedEndExclusive); `resync` scans for the first
    * validated frame, otherwise `scanFrom` must BE a frame start. */
  def records(raw: GzipMembers.RawReader, scanFrom: Long, ownedEndExclusive: Long,
              resync: Boolean): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var pos = scanFrom
      private var memberRecs: Iterator[WarcRecord] = Iterator.empty

      private def advance(): Unit = {
        while (!memberRecs.hasNext && pos < ownedEndExclusive && pos < raw.fileLen) {
          val m = inflateFrame(raw, pos)
          if (m == null) {
            if (resync) pos += 1
            else throw new IllegalArgumentException(
              s"Malformed frame-zstd WARC: expected a zstd frame at offset $pos")
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
