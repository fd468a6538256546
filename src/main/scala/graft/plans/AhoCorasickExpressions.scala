package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern scanner — the C4-style blocklist gate
  * (Raffel et al. 2020 dropped any page containing a term from a fixed
  * badword list; gazetteer tagging in curation pipelines is the same
  * operation). The 100 TB point of the automaton: ONE O(text) pass
  * counts EVERY dictionary term simultaneously — a 10k-term list costs
  * the same scan as a 10-term list, where the naive plan (one
  * `contains`/regex pass per term) multiplies the corpus scan by |dict|.
  *
  * Match contract (pinned by the oracle's per-term `\b(term)\b` RE2
  * replay, so the two engines can never drift):
  *  - matches count at WORD BOUNDARIES: the char before the start and
  *    after the end must not be a word char `[a-z0-9_]` (RE2's `\b`
  *    class on lowered ASCII text — the streams feeding this are
  *    lowered);
  *  - every dictionary term firing on a span counts, including terms
  *    that are suffixes of other terms mid-match (the output-link
  *    chain: "slow scan" also fires "scan" and "slow");
  *  - the dictionary contract requires terms WITHOUT self-borders (no
  *    proper prefix = proper suffix), so same-term occurrences can
  *    never overlap and the automaton's count-all equals RE2's
  *    non-overlapping scan. [[AhoCorasick]] REJECTS bordered terms at
  *    build time rather than silently drifting from the oracle.
  */
final class AhoCorasick(val terms: Array[String]) extends Serializable {
  require(terms.sorted.sameElements(terms) && terms.distinct.length == terms.length,
    "dictionary must be sorted and distinct (output array alignment)")
  terms.foreach { t =>
    require(t.nonEmpty && t.forall(c => c < 128 && c != '\n'),
      s"ASCII term contract violated: '$t'")
    (1 until t.length).foreach { b =>
      require(!(t.substring(0, b) == t.substring(t.length - b)),
        s"term '$t' has a self-border of length $b — same-term overlap " +
          "would diverge from the oracle's non-overlapping regex scan")
    }
  }

  // dense ASCII trie: goto(node)(char) = next node or -1
  private val gotoT = scala.collection.mutable.ArrayBuffer(Array.fill(128)(-1))
  private val outTerm = scala.collection.mutable.ArrayBuffer(-1) // term idx ending here
  private val depth = scala.collection.mutable.ArrayBuffer(0)
  terms.zipWithIndex.foreach { case (t, ti) =>
    var n = 0
    t.foreach { c =>
      if (gotoT(n)(c) < 0) {
        gotoT(n)(c) = gotoT.length
        gotoT += Array.fill(128)(-1)
        outTerm += -1
        depth += depth(n) + 1
      }
      n = gotoT(n)(c)
    }
    outTerm(n) = ti
  }
  private val nNodes = gotoT.length
  val fail: Array[Int] = Array.fill(nNodes)(0)
  /** nearest proper-suffix node that ends a term (output link), or -1 */
  val outLink: Array[Int] = Array.fill(nNodes)(-1)
  locally {
    val q = scala.collection.mutable.Queue.empty[Int]
    (0 until 128).foreach { c =>
      val v = gotoT(0)(c)
      if (v < 0) gotoT(0)(c) = 0 else { fail(v) = 0; q += v }
    }
    while (q.nonEmpty) {
      val u = q.dequeue()
      outLink(u) = if (outTerm(fail(u)) >= 0) fail(u) else outLink(fail(u))
      (0 until 128).foreach { c =>
        val v = gotoT(u)(c)
        if (v < 0) gotoT(u)(c) = gotoT(fail(u))(c)
        else { fail(v) = gotoT(fail(u))(c); q += v }
      }
    }
  }
  // flattened for the scan loop
  private val flatGoto: Array[Int] = {
    val a = new Array[Int](nNodes * 128)
    var n = 0
    while (n < nNodes) {
      System.arraycopy(gotoT(n), 0, a, n * 128, 128)
      n += 1
    }
    a
  }
  private val depthA = depth.toArray
  private val outTermA = outTerm.toArray

  @inline private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == '_'

  /** One pass over `text`; returns per-term boundary-match counts
    * aligned with the sorted `terms`. Bytes ≥128 reset to root and act
    * as non-word boundary chars (the feeding streams are ASCII). */
  def countAll(text: UTF8String): Array[Long] = {
    val bytes = text.getBytes
    val n = bytes.length
    val counts = new Array[Long](terms.length)
    var node = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      node = if (b >= 0) flatGoto(node * 128 + b) else 0
      // collect every term ending at i (this node + its output chain)
      var m = if (outTermA(node) >= 0) node else outLink(node)
      while (m >= 0) {
        val ti = outTermA(m)
        val start = i + 1 - depthA(m)
        val okL = start == 0 || !isWord(bytes(start - 1))
        val okR = i + 1 == n || !isWord(bytes(i + 1))
        if (okL && okR) counts(ti) += 1L
        m = outLink(m)
      }
      i += 1
    }
    counts
  }
}

object AhoCorasickOps {
  def countAll(text: UTF8String, ac: AhoCorasick): ArrayData =
    new GenericArrayData(ac.countAll(text))
}

/** `badword_counts(text)` → ARRAY<BIGINT> per-term match counts aligned
  * with the sorted dictionary; the automaton is a codegen reference
  * object (bounded model state riding the plan — the
  * UnigramEncodeExpr / centroid-matrix discipline). Seq field for
  * structural equality. */
case class BadwordCountsExpr(child: Expression, terms: Seq[String])
  extends UnaryExpression {
  @transient private lazy val ac = new AhoCorasick(terms.toArray)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    AhoCorasickOps.countAll(input.asInstanceOf[UTF8String], ac)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("badwordAutomaton", ac, "graft.plans.AhoCorasick")
    defineCodeGen(ctx, ev, c => s"graft.plans.AhoCorasickOps.countAll($c, $acRef)")
  }
  override def prettyName: String = "badword_counts"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AhoCorasickExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def badwordCounts(loweredText: Column, terms: Seq[String]): Column =
    column(BadwordCountsExpr(expression(loweredText), terms))
}
