package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.plans.{CodonUsageExpr, DamerauLevenshteinExpr, KmerFrequenciesExpr}

/** Session-extension entry point: registers the native sequence expressions
  * for every session of a cluster via
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)` at build time). Per-session
  * registration without extensions: `SeqExpressions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", "", name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("kmer_frequencies"),
      info("kmer_frequencies",
        "kmer_frequencies(seq[, k]) - overlapping k-mer frequency map (uppercase, N-windows dropped)"),
      (exprs: Seq[Expression]) => KmerFrequenciesExpr(exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Int]).getOrElse(3))))
    e.injectFunction((
      FunctionIdentifier("codon_usage"),
      info("codon_usage",
        "codon_usage(seq) - non-overlapping stride-3 codon frequency map"),
      (exprs: Seq[Expression]) => CodonUsageExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("damerau_levenshtein"),
      info("damerau_levenshtein",
        "damerau_levenshtein(a, b) - unrestricted Damerau-Levenshtein edit distance (byte-wise)"),
      (exprs: Seq[Expression]) => DamerauLevenshteinExpr(exprs.head, exprs(1))))
  }
}
