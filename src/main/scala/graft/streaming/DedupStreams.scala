package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-duplicate detection (the last deferred
  * SURVEY §7.5 item): documents arrive on a stream; each new document is
  * reported against every previously-seen document sharing an LSH band
  * bucket — the streaming twin of
  * [[graft.operators.Dedup.minhashLshPairs]], with the identical
  * md5-hex-window hash family so batch and stream agree candidate-for-
  * candidate (pinned in StreamingSpec).
  *
  * Shape: the signature is computed ROW-LOCALLY in `flatMap` (no shuffle —
  * mirrors the batch plan's map-side signature aggregation), then one
  * keyed state per (band, band_key) bucket holds the member ids. State is
  * O(buckets × maxPerBucket); the cap bounds both memory AND emission
  * fan-out for degenerate buckets (the streaming analog of the batch
  * hot-shingle DF cap). Candidates are per-band; `.dropDuplicates(d1,d2)`
  * downstream if band multiplicity is unwanted.
  */
object DedupStreams {

  case class Doc(doc_id: Long, text: String)
  case class Candidate(d1: Long, d2: Long, band: Int)

  /** Row-local MinHash signature — bit-identical to the batch family
    * (j-th hash = j-th 4-hex-digit window of md5("a:"+sh) for j<8, of
    * md5("b:"+sh) for j≥8; string min over distinct word n-shingles).
    * Returns one (band, bandKey) per band; empty when the text has no
    * complete shingle (matching the batch behavior, where such docs never
    * enter the banding join). */
  def signature(text: String, n: Int = 3, bands: Int = 4,
                rowsPerBand: Int = 4): Seq[(Int, String)] = {
    val total = bands * rowsPerBand
    require(total <= 16, "hash family provides 16 independent 16-bit hashes")
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length < n) return Seq.empty
    val shingles = toks.sliding(n).map(_.mkString(" ")).toSet
    val md = MessageDigest.getInstance("MD5")
    // manual hex encode: the obvious per-byte format-string version costs
    // 32 boxed format calls per digest — at ~2 md5/shingle × ~10^2
    // shingles/doc it dominated the signature stage
    val hexChars = "0123456789abcdef".toCharArray
    def md5hex(s: String): String = {
      md.reset()
      val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
      val out = new Array[Char](32)
      var i = 0
      while (i < 16) {
        out(2 * i) = hexChars((d(i) >>> 4) & 0xf)
        out(2 * i + 1) = hexChars(d(i) & 0xf)
        i += 1
      }
      new String(out)
    }
    val mins = Array.fill[String](total)(null)
    shingles.foreach { sh =>
      val m1 = md5hex("a:" + sh)
      val m2 = md5hex("b:" + sh)
      var j = 0
      while (j < total) {
        val src = if (j < 8) m1 else m2
        val w = src.substring((j % 8) * 4, (j % 8) * 4 + 4)
        if (mins(j) == null || w < mins(j)) mins(j) = w
        j += 1
      }
    }
    (0 until bands).map { b =>
      b -> (0 until rowsPerBand).map(r => mins(b * rowsPerBand + r)).mkString
    }
  }

  case class ChunkVerdict(doc_id: Long, pos: Long, kept: Boolean)

  /** Streaming twin of [[graft.operators.Dedup.chunkDedup]]: per-chunk
    * first-occurrence verdicts over a document stream. Chunking is
    * row-local in `flatMap` (identical fixed word boundaries to the batch
    * operator); one Boolean state per distinct chunk records whether it
    * was ever claimed. Within a micro-batch the minimal (doc_id, pos)
    * claims the chunk — so when the stream delivers docs in id order the
    * verdicts match the batch operator's global first-occurrence exactly
    * (pinned in StreamingSpec). State is O(distinct chunks); bound it in
    * production with a TTL timeout or an upstream time window. */
  def chunkVerdictStream(docs: Dataset[Doc], chunkWords: Int = 10): Dataset[ChunkVerdict] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap { d =>
        val w = d.text.split(" ", -1)
        val n = math.max(1L, math.ceil(w.length / chunkWords.toDouble).toLong)
        (0L until n).map { i =>
          val from = (i * chunkWords).toInt
          (d.doc_id, i, w.slice(from, from + chunkWords).mkString(" "))
        }
      }
      .groupByKey(_._3)
      .flatMapGroupsWithState[Boolean, ChunkVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Boolean]) =>
          val claimed = state.getOption.getOrElse(false)
          // deterministic intra-batch winner: minimal (doc_id, pos)
          val sorted = rows.map(r => (r._1, r._2)).toSeq.sorted
          val out = sorted.zipWithIndex.map { case ((id, pos), idx) =>
            ChunkVerdict(id, pos, kept = !claimed && idx == 0)
          }
          state.update(true)
          out.iterator
      }
  }

  /** Streaming candidate pairs: every new doc × every earlier member of
    * its band buckets (ids normalized d1 < d2). Works on batch Datasets
    * too (same code path — Spark plans FlatMapGroupsWithState for both). */
  def candidateStream(docs: Dataset[Doc], n: Int = 3, bands: Int = 4,
                      rowsPerBand: Int = 4, maxPerBucket: Int = 64): Dataset[Candidate] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap(d => signature(d.text, n, bands, rowsPerBand)
        .map { case (b, k) => (b, k, d.doc_id) })
      .groupByKey { case (b, k, _) => (b, k) }
      .flatMapGroupsWithState[List[Long], Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state: GroupState[List[Long]]) =>
          var members = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[Candidate]
          // deterministic intra-batch order: process by ascending id
          rows.map(_._3).toSeq.distinct.sorted.foreach { id =>
            if (!members.contains(id)) {
              members.foreach { m =>
                out += Candidate(math.min(m, id), math.max(m, id), band)
              }
              if (members.lengthCompare(maxPerBucket) < 0)
                members = id :: members
            }
          }
          state.update(members)
          out.result().iterator
      }
  }
}
