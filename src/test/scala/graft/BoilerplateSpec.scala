package graft

import org.apache.spark.sql.functions._

/** Removal decisions + rebuild order of [[graft.queries.TextQueries
  * .removeBoilerplate]] on a crafted corpus — the q_boilerplate oracle
  * replays the bucket rollup; this pins the per-document semantics. */
class BoilerplateSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("lines in >= k docs are removed; rebuild preserves original order") {
    // "nav" appears in all 3 docs (df=3, removed at k=3); "pair" in 2
    // (kept); per-doc bodies unique (kept)
    val pages = Seq(
      (1L, "nav\nbody one\npair\ntail one"),
      (2L, "nav\npair\nbody two"),
      (3L, "body three\nnav")).toDF("doc_id", "page")
    val got = graft.queries.TextQueries.removeBoilerplate(pages, 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq(
      (1L, 3L, 1L, "body one\npair\ntail one"),
      (2L, 2L, 1L, "pair\nbody two"),
      (3L, 1L, 1L, "body three")), got.mkString("; "))
    CacheScope.release()
  }

  test("duplicate lines WITHIN one doc count once toward df") {
    // "x" repeats inside doc 1 but appears in only 2 distinct docs -> kept
    val pages = Seq(
      (1L, "x\nmid\nx"),
      (2L, "x\nother")).toDF("doc_id", "page")
    val got = graft.queries.TextQueries.removeBoilerplate(pages, 3)
      .orderBy("doc_id").select("clean").as[String].collect().toSeq
    assert(got == Seq("x\nmid\nx", "x\nother"), got.mkString("; "))
    CacheScope.release()
  }

  test("a fully-boilerplate doc rebuilds to the empty page") {
    val pages = Seq(
      (1L, "same"), (2L, "same"), (3L, "same\nunique")).toDF("doc_id", "page")
    val got = graft.queries.TextQueries.removeBoilerplate(pages, 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSeq
    assert(got == Seq((1L, 0L, ""), (2L, 0L, ""), (3L, 1L, "unique")),
      got.mkString("; "))
    CacheScope.release()
  }
}
