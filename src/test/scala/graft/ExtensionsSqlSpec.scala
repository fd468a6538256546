package graft

import org.apache.spark.sql.functions._
import graft.plans._

/** The SQL function surface: every kernel registered by [[GraftExtensions]]
  * must be callable from `spark.sql` and return exactly what its Column-API
  * form returns on the fixture corpus — the contract that lets a pure-SQL
  * user (spark-sql shell, Thrift server) run the engine's kernels.
  */
class ExtensionsSqlSpec extends SparkSpec {

  private lazy val ready: Unit = {
    GraftExtensions.register(spark)
    spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .createOrReplaceTempView("docs_ext")
    spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .createOrReplaceTempView("emb_ext")
  }

  /** Collects both frames (each must carry a doc_id/vec_id first column for
    * ordering) and compares row-by-row. */
  private def same(sqlText: String, api: org.apache.spark.sql.DataFrame): Unit = {
    ready
    val got = spark.sql(sqlText).collect().map(_.toSeq).toSeq
    val want = api.collect().map(_.toSeq).toSeq
    assert(got == want, s"SQL vs Column API mismatch for: $sqlText")
  }

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
  private def emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")

  test("text kernels SQL ≡ Column API") {
    same("SELECT doc_id, split_tokens(text) FROM docs_ext ORDER BY doc_id",
      docs.select(col("doc_id"),
        TextStatsExpressions.splitTokens(col("text"))).orderBy("doc_id"))
    same("SELECT doc_id, distinct_shingles(text, 3) FROM docs_ext ORDER BY doc_id",
      docs.select(col("doc_id"),
        ShingleExpressions.distinctShingles(col("text"), 3)).orderBy("doc_id"))
    same("SELECT doc_id, rolling_fingerprint(text) FROM docs_ext ORDER BY doc_id",
      docs.select(col("doc_id"),
        TextStatsExpressions.rollingFingerprint(col("text"))).orderBy("doc_id"))
    same("SELECT doc_id, window_hashes(text, 16) FROM docs_ext ORDER BY doc_id",
      docs.select(col("doc_id"),
        WindowHashExpressions.windowHashes(col("text"), 16)).orderBy("doc_id"))
    same("SELECT doc_id, chunk_texts(text, 10, 10) FROM docs_ext ORDER BY doc_id",
      docs.select(col("doc_id"),
        TextStatsExpressions.chunkTexts(col("text"), 10, 10)).orderBy("doc_id"))
    same("SELECT doc_id, feature_hist(text, 64) FROM docs_ext ORDER BY doc_id",
      docs.select(col("doc_id"),
        TextStatsExpressions.featureHist(col("text"), 64)).orderBy("doc_id"))
    same("SELECT doc_id, pii_redact(text) FROM docs_ext ORDER BY doc_id",
      docs.select(col("doc_id"),
        RedactExpressions.piiRedact(col("text"))).orderBy("doc_id"))
    same("SELECT doc_id, md5_prefix(text, 12) FROM docs_ext ORDER BY doc_id",
      docs.select(col("doc_id"),
        HashExpressions.md5Prefix(col("text"), 12)).orderBy("doc_id"))
    same("SELECT doc_id, damerau_levenshtein(text, lang) FROM docs_ext ORDER BY doc_id",
      docs.select(col("doc_id"), StringDistanceExpressions
        .damerauLevenshtein(col("text"), col("lang"))).orderBy("doc_id"))
    val page = concat(lit("<p><a href=\"https://x.test/\">l</a></p>" +
      "<table><tr><th>k</th></tr><tr><td>"), col("text"), lit("</td></tr></table>"))
    same("SELECT doc_id, html_outlinks('<p><a href=\"https://x.test/\">l</a></p>" +
      "<table><tr><th>k</th></tr><tr><td>' || text || '</td></tr></table>') " +
      "FROM docs_ext ORDER BY doc_id",
      docs.select(col("doc_id"),
        HtmlExtractExpressions.htmlOutlinks(page)).orderBy("doc_id"))
    same("SELECT doc_id, html_tables('<p><a href=\"https://x.test/\">l</a></p>" +
      "<table><tr><th>k</th></tr><tr><td>' || text || '</td></tr></table>') " +
      "FROM docs_ext ORDER BY doc_id",
      docs.select(col("doc_id"),
        HtmlExtractExpressions.htmlTables(page)).orderBy("doc_id"))
    same("SELECT doc_id, html_anchors('<p><a href=\"https://x.test/\">l</a></p>" +
      "<table><tr><th>k</th></tr><tr><td>' || text || '</td></tr></table>') " +
      "FROM docs_ext ORDER BY doc_id",
      docs.select(col("doc_id"),
        HtmlExtractExpressions.htmlAnchors(page)).orderBy("doc_id"))
  }

  test("sequence kernels SQL ≡ Column API (over the synthetic seq surrogate)") {
    // the seq family runs on upper(replace(text)) like q_kmer_explode does
    same("""SELECT doc_id, kmer_frequencies(upper(replace(text, ' ', '')), 4)
           |FROM docs_ext ORDER BY doc_id""".stripMargin,
      docs.select(col("doc_id"), SeqExpressions.kmerFrequenciesNative(
        upper(regexp_replace(col("text"), " ", "")), 4)).orderBy("doc_id"))
    same("""SELECT doc_id, minimizer_counts(upper(replace(text, ' ', '')), 5, 4)
           |FROM docs_ext ORDER BY doc_id""".stripMargin,
      docs.select(col("doc_id"), SeqExpressions.minimizerCounts(
        upper(regexp_replace(col("text"), " ", "")), 5, 4)).orderBy("doc_id"))
    same("SELECT doc_id, dna_translate('ACGTTTGGA') FROM docs_ext ORDER BY doc_id",
      docs.select(col("doc_id"),
        BioExpressions.dnaTranslate(lit("ACGTTTGGA"))).orderBy("doc_id"))
    same("SELECT doc_id, phred_stats('IIII??++55') FROM docs_ext ORDER BY doc_id",
      docs.select(col("doc_id"),
        BioExpressions.phredStats(lit("IIII??++55"))).orderBy("doc_id"))
  }

  test("vector kernels SQL ≡ Column API") {
    same("SELECT vec_id, quantize_vec(embedding) FROM emb_ext ORDER BY vec_id",
      emb.select(col("vec_id"),
        VectorExpressions.quantizeVec(col("embedding"))).orderBy("vec_id"))
    same("""SELECT vec_id,
           |       long_dot(quantize_vec(embedding), quantize_vec(embedding))
           |FROM emb_ext ORDER BY vec_id""".stripMargin,
      emb.select(col("vec_id"), VectorExpressions.longDot(
        VectorExpressions.quantizeVec(col("embedding")),
        VectorExpressions.quantizeVec(col("embedding")))).orderBy("vec_id"))
  }

  test("builder-time injection wires the same table without error") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(exts)
  }

  test("url kernels SQL ≡ Column API (r13)") {
    import graft.operators.Sampling
    import TestSpark.spark.implicits._
    val urls = Seq("https://w3.example.co.uk/p/1", "http://plain.example.com/x",
      // r14 rule classes: wildcard, exception, private, 3-label normal
      "https://a.b.site.ck/", "https://sub.www.ck/x",
      "https://x.y.kawasaki.jp/", "https://ward.city.kawasaki.jp/",
      "https://www.user1.github.io/p", "https://www.school.k12.ca.us/p")
      .toDF("u")
    urls.createOrReplaceTempView("urls_ext")
    same("SELECT url_host(u), registrable_domain(url_host(u)) FROM urls_ext ORDER BY u",
      urls.select(Sampling.urlHost(col("u")),
        Sampling.registrableDomain(Sampling.urlHost(col("u")))).orderBy("u"))
    // direct value pins through pure SQL: one per PSL rule class
    def rd(h: String): String =
      spark.sql(s"SELECT registrable_domain('$h')").head().getString(0)
    assert(rd("w3.example.co.uk") == "example.co.uk") // normal 2-label
    assert(rd("a.b.site.ck") == "b.site.ck")          // wildcard *.ck
    assert(rd("sub.www.ck") == "www.ck")              // exception !www.ck
    assert(rd("www.user1.github.io") == "user1.github.io") // private section
    assert(rd("www.school.k12.ca.us") == "school.k12.ca.us") // normal 3-label
  }

  test("non-literal integer arg fails with the intended contract message") {
    val e = intercept[Exception] {
      spark.sql("SELECT kmer_frequencies(text, doc_id) FROM docs_ext").collect()
    }
    // the foldability guard must surface "integer literal", not an
    // internal unbound-attribute error
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("integer literal"))))
  }
}
