package graft

import org.apache.spark.sql.functions._

/** WordPiece trainer + greedy-encoder pins (round 15).
  *
  * The driver fixture exercises the full train→encode loop under the
  * oracle; these tests pin the semantics that make WordPiece WordPiece —
  * the likelihood merge objective (NOT the BPE raw-count objective), the
  * `##` continuation marking, greedy longest-match-first, and the
  * wholesale-[UNK] collapse — on crafted corpora where every number is
  * hand arithmetic.
  */
class WordPieceSpec extends SparkSpec {
  import graft.queries.TextQueries.wordpieceTrainModel
  import graft.plans.WordPieceExpressions.wordpieceEncode
  import testImplicits._

  private lazy val testImplicits = spark.implicits

  test("trainer: likelihood argmax differs from the raw-count argmax") {
    // 'ab' ×10, 'cd' ×9. Pair counts: (a,##b)=10 > (c,##d)=9 — BPE would
    // merge (a,##b). WordPiece scores count/(f_l·f_r):
    //   score(a,##b) = 10·2^20 div (10·10) = 104857
    //   score(c,##d) =  9·2^20 div (9·9)   = 116508  ← wins
    val docs = Seq(("ab " * 10 + "cd " * 9).trim).toDF("text")
    val (vocab, merges) = wordpieceTrainModel(docs, "text",
      topWords = 16, maxWordLen = 8, nMerges = 1)
    assert(merges == Seq((1, "c", "##d", 116508L)))
    assert(vocab.contains("cd") && !vocab.contains("ab"))
    assert(vocab.toSet == Set("a", "##b", "c", "##d", "cd"))
  }

  test("trainer: continuation merges stay ##-marked; ties break (lhs, rhs)") {
    // 'xab' ×5 → symbols x, ##a, ##b. Both pairs score 5·2^20/25 = 209715;
    // the (lhs, rhs) tie-break picks ("##a","##b") ('#' < 'x'), producing
    // the ##-marked merged piece "##ab". Round 2 merges (x, ##ab) → "xab".
    val docs = Seq(("xab " * 5).trim).toDF("text")
    val (vocab, merges) = wordpieceTrainModel(docs, "text",
      topWords = 16, maxWordLen = 8, nMerges = 2)
    assert(merges == Seq(
      (1, "##a", "##b", 209715L),
      (2, "x", "##ab", 209715L)))
    assert(vocab.contains("##ab") && vocab.contains("xab"))
  }

  private def enc(vocab: Seq[String], words: String*): Seq[Seq[String]] =
    words.toDF("w").select(wordpieceEncode(col("w"), vocab).as("p"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq

  test("encoder kernel: greedy longest-match-first with ## continuation") {
    val v = Seq("u", "un", "##n", "##a", "##able", "##b", "##l", "##e")
    assert(enc(v, "unable") == Seq(Seq("un", "##able")))
    // position 0 uses the word-initial form, later positions the ## form
    val v2 = Seq("n", "u", "##n", "##u")
    assert(enc(v2, "nun") == Seq(Seq("n", "##u", "##n")))
  }

  test("encoder kernel: unsegmentable word collapses WHOLESALE to [UNK]") {
    val v = Seq("a", "##b")
    // stuck at position 0: 'b' has no word-initial form
    assert(enc(v, "ba") == Seq(Seq("[UNK]")))
    // stuck mid-word: already-emitted pieces are discarded, not kept
    assert(enc(v, "abz") == Seq(Seq("[UNK]")))
    assert(enc(v, "ab") == Seq(Seq("a", "##b")))
  }

  private def encOff(vocab: Seq[String], words: String*): Seq[Seq[(String, Int, Int)]] = {
    import graft.plans.WordPieceExpressions.wordpieceOffsets
    words.toDF("w").select(wordpieceOffsets(col("w"), vocab).as("p"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq).toSeq
  }

  test("offsets kernel: spans tile the word; UNK maps to the whole-word span (r15)") {
    val v = Seq("u", "un", "##n", "##a", "##able", "##b", "##l", "##e")
    assert(encOff(v, "unable") == Seq(Seq(("un", 0, 2), ("##able", 2, 6))))
    val v2 = Seq("a", "##b")
    assert(encOff(v2, "abz") == Seq(Seq(("[UNK]", 0, 3))))
    // offsets agree with the offset-free encoder on the real trained model
    val docs = Tables.t(spark, TestSpark.Sf0001, "documents")
    val vocab = wordpieceTrainModel(docs, "text", 192, 16, 12)._1
    val rows = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= 16)
      .select(col("w"),
        graft.plans.WordPieceExpressions.wordpieceEncode(col("w"), vocab).as("p"),
        graft.plans.WordPieceExpressions.wordpieceOffsets(col("w"), vocab).as("o"))
      .collect()
    try {
      rows.foreach { r =>
        val w = r.getString(0)
        val pieces = r.getSeq[String](1)
        val offs = r.getSeq[org.apache.spark.sql.Row](2)
          .map(x => (x.getString(0), x.getInt(1), x.getInt(2)))
        assert(offs.map(_._1) == pieces, s"offset pieces must equal encode for '$w'")
        // spans tile [0, len) exactly, in order
        var pos = 0
        offs.foreach { case (p, a, b) =>
          assert(a == pos && b > a, s"span gap in '$w': $offs")
          if (p != "[UNK]")
            assert((if (pos == 0) w.substring(a, b) else "##" + w.substring(a, b)) == p,
              s"span text mismatch in '$w': $offs")
          pos = b
        }
        assert(pos == w.length, s"spans must cover '$w' exactly: $offs")
      }
    } finally CacheScope.release()
  }

  test("trained model reconstructs the real corpus stream; [UNK] only when unsegmentable") {
    val docs = Tables.t(spark, TestSpark.Sf0001, "documents")
    val (vocab, merges) = wordpieceTrainModel(docs, "text",
      topWords = 192, maxWordLen = 16, nMerges = 12)
    assert(merges.size == 12)
    // determinism
    assert(wordpieceTrainModel(docs, "text", 192, 16, 12)._1 == vocab)
    val words = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= 16)
    val out = words
      .select(col("w"), wordpieceEncode(col("w"), vocab).as("p"))
      .select(col("w"), col("p"),
        concat_ws("", transform(col("p"),
          x => regexp_replace(x, "^##", ""))).as("joined"))
      .collect()
    try {
      assert(out.nonEmpty)
      out.foreach { r =>
        val w = r.getString(0)
        val pieces = r.getSeq[String](1)
        if (pieces == Seq("[UNK]")) {
          // wholesale-UNK must be GENUINE: greedy can only get stuck on a
          // character with no usable vocab form at that position class
          assert(w.exists(c => !vocab.contains(c.toString)) ||
                 w.drop(1).exists(c => !vocab.contains("##" + c)),
            s"'$w' was UNK'd but every char is coverable")
        } else {
          assert(r.getString(2) == w, s"pieces must concatenate back to '$w'")
          assert(pieces.tail.forall(_.startsWith("##")),
            s"continuations of '$w' must be ##-marked")
          assert(!pieces.head.startsWith("##"),
            s"word-initial piece of '$w' must be plain")
        }
      }
    } finally CacheScope.release()
  }
}
