package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native URL-canonicalization kernel — the one-pass scanner behind
  * [[graft.operators.Sampling.urlCanonColumns]] (the pinned Column
  * reference). The Column form runs ~14 string expressions per row
  * (substring_index chains, a split + filter + array_sort HOF stack —
  * CodegenFallback-interpreted); this kernel does one structural scan +
  * one bounded param sort per row.
  *
  * Semantics (identical to the reference, pinned by UrlKernelSpec on
  * crafted hazards + generated corpora):
  *  - no `://` → input unchanged;
  *  - scheme and host lowercased (ASCII A-Z only — IDNs are punycoded in
  *    real crawl data; the Column form's Unicode `lower` agrees on all
  *    ASCII input, which the spec corpus and every fixture use);
  *  - authority = rest up to the first `/`, `?` or `#`; default ports
  *    http:80/https:443 dropped, any other explicit port kept;
  *  - IPv6 bracket authorities (`[::1]:8080`) split host/port at the
  *    closing `]` (RFC 3986 §3.2.2), never at a colon INSIDE the
  *    brackets; a bracket authority with no `]:` (no port, or malformed
  *    trailing junk) is treated as all-host and round-trips lowercased;
  *  - fragment (from the first `#` after the authority) stripped;
  *  - path: `"" → "/"`, ONE trailing slash stripped from non-root paths;
  *  - query: params split on `&`, empties dropped, tracking params
  *    dropped by name ([[graft.operators.Sampling.TrackingParams]] +
  *    the `utm_` prefix; the name is everything before the first `=`),
  *    survivors sorted by UTF-8 byte order (both engines' binary string
  *    collation), duplicates kept; no survivors → no `?`.
  */
object UrlCanon {

  private val Tracking: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.operators.Sampling.TrackingParams.foreach(s.add)
    s
  }

  @inline private def lowerAscii(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  private def dropParam(p: String): Boolean = {
    val eq = p.indexOf('=')
    val name = if (eq < 0) p else p.substring(0, eq)
    name.startsWith("utm_") || Tracking.contains(name)
  }

  def compute(s: UTF8String): UTF8String = {
    val u = s.toString
    val sep = u.indexOf("://")
    if (sep < 0) return s
    val out = new java.lang.StringBuilder(u.length)
    var i = 0
    while (i < sep) { out.append(lowerAscii(u.charAt(i))); i += 1 }
    val scheme = out.toString
    out.append("://")
    // authority: up to the first '/', '?' or '#'
    val aStart = sep + 3
    var aEnd = aStart
    while (aEnd < u.length && { val c = u.charAt(aEnd)
      c != '/' && c != '?' && c != '#' }) aEnd += 1
    val hostEnd = {
      val h0 =
        if (aEnd > aStart && u.charAt(aStart) == '[') {
          // IPv6 bracket authority: the port separator is the colon AFTER
          // the closing ']', never one inside the brackets
          val close = u.indexOf(']', aStart)
          if (close >= 0 && close < aEnd) close + 1 else aEnd
        } else {
          val colon = u.indexOf(':', aStart)
          if (colon >= 0 && colon < aEnd) colon else aEnd
        }
      // what follows the host must BE a ':' to count as a port (a bracket
      // authority with trailing junk after ']' is all-host, pass-through)
      if (h0 < aEnd && u.charAt(h0) != ':') aEnd else h0
    }
    i = aStart
    while (i < hostEnd) { out.append(lowerAscii(u.charAt(i))); i += 1 }
    if (hostEnd < aEnd) { // explicit port
      val port = u.substring(hostEnd + 1, aEnd)
      val isDefault = (scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443")
      if (!isDefault) { out.append(':'); out.append(port) }
    }
    // tail: fragment stripped at the first '#'
    var tEnd = u.indexOf('#', aEnd)
    if (tEnd < 0) tEnd = u.length
    val qMark = {
      val q = u.indexOf('?', aEnd)
      if (q >= 0 && q < tEnd) q else -1
    }
    val pathEnd = if (qMark >= 0) qMark else tEnd
    // path: "" → "/", one trailing slash stripped from non-root
    if (pathEnd == aEnd) out.append('/')
    else if (pathEnd - aEnd > 1 && u.charAt(pathEnd - 1) == '/')
      out.append(u, aEnd, pathEnd - 1)
    else out.append(u, aEnd, pathEnd)
    if (qMark >= 0) {
      // params: split on '&', drop empties + trackers, byte-order sort
      val kept = new java.util.ArrayList[String](8)
      var p = qMark + 1
      while (p <= tEnd) {
        var e = u.indexOf('&', p)
        if (e < 0 || e > tEnd) e = tEnd
        if (e > p) {
          val param = u.substring(p, e)
          if (!dropParam(param)) kept.add(param)
        }
        p = e + 1
      }
      if (!kept.isEmpty) {
        kept.sort((a: String, b: String) =>
          UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
        out.append('?')
        var k = 0
        while (k < kept.size()) {
          if (k > 0) out.append('&')
          out.append(kept.get(k))
          k += 1
        }
      }
    }
    UTF8String.fromString(out.toString)
  }
}

/** `url_canon(url)` — [[UrlCanon]] as a codegen'd expression. */
case class UrlCanonExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UrlCanon.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UrlCanon.compute($c)")
  override def prettyName: String = "url_canon"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def urlCanon(url: Column): Column = column(UrlCanonExpr(expression(url)))
}
