package graft

import org.apache.spark.sql.functions._

/** RFC 9309 semantics of [[graft.queries.PipelineQueries.robotsRules]] /
  * `robotsVerdict` on crafted robots.txt files — the group-structure rules
  * the q_robots_gate oracle replays but can only exercise through its
  * fixed fixture arms. */
class RobotsSpec extends SparkSpec {
  import TestSpark.spark.implicits._
  import graft.queries.PipelineQueries.{robotsRules, robotsVerdict}

  private def rules(robots: String, agent: String = "graftbot") =
    robotsRules(Seq(("h", robots)).toDF("host", "robots"), agent)
      .select("typ", "rpath").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  test("a specific-agent group suppresses the * group entirely") {
    val txt = "User-agent: *\nDisallow: /a/\nUser-agent: graftbot\nDisallow: /b/"
    assert(rules(txt) == Set("disallow" -> "/b/"))
    // and with no specific group, * applies
    assert(rules(txt, agent = "otherbot") == Set("disallow" -> "/a/"))
  }

  test("consecutive user-agent lines share one group") {
    val txt = "User-agent: a\nUser-agent: graftbot\nDisallow: /x/\n" +
      "User-agent: b\nDisallow: /y/"
    assert(rules(txt) == Set("disallow" -> "/x/"))
  }

  test("orphan rules before any group, comments, unknown fields, empty values ignored") {
    val txt = "Disallow: /orphan/\n# note\nUser-agent: *\n\n" +
      "Crawl-delay: 7\nDisallow:\nAllow: /ok/"
    assert(rules(txt) == Set("allow" -> "/ok/"))
  }

  test("field names and agent tokens match case-insensitively") {
    val txt = "USER-AGENT: GraftBot\nDISALLOW: /x/"
    assert(rules(txt) == Set("disallow" -> "/x/"))
  }

  test("longest path wins; allow wins an equal-length tie; no match allows") {
    val r = Seq(
      ("h", "disallow", "/a/"), ("h", "allow", "/a/b/"),
      ("h", "allow", "/t/"), ("h", "disallow", "/t/"))
      .toDF("host", "typ", "rpath")
    val urls = Seq(
      (1L, "h", "/a/b/c"),   // allow:/a/b/ out-lengths disallow:/a/
      (2L, "h", "/a/z"),     // only disallow:/a/ matches
      (3L, "h", "/t/x"),     // equal-length tie -> allow
      (4L, "h", "/free"))    // no match -> default-allow
      .toDF("doc_id", "host", "path")
    val got = robotsVerdict(urls, r).orderBy("doc_id")
      .select("verdict").as[String].collect().toSeq
    assert(got == Seq("allow:/a/b/", "disallow:/a/", "allow:/t/", "default-allow"), got)
  }
}
