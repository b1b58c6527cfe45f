package graft

import graft.functions.HashExprs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Engine extension point: registers the custom expressions as SQL
  * functions so `spark.sql("SELECT minhash_sig(tokens, 64) ...")` works.
  *
  * Two ways in:
  *   - config: `spark.sql.extensions=graft.GraftExtensions` (spark-submit)
  *   - runtime: `GraftExtensions.register(spark)` (tests, notebooks)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach(ext.injectFunction)
    // estate time travel: `SELECT ... FROM <estate>.<table> VERSION AS
    // OF g` / `TIMESTAMP AS OF ts` (and plain live reads) for roots
    // registered via graft.sql.EstateSql.registerEstate — analyzer
    // rules can only enter at session build, so sessions wanting the
    // SQL estate surface must carry
    // `spark.sql.extensions=graft.GraftExtensions` (the engine's own
    // Verify/Bench/localSession builders do)
    ext.injectResolutionRule(session =>
      graft.sql.EstateSql.TimeTravelRule(session))
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  private[graft] val definitions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[HashExprs.MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, k) => HashExprs.MinHashSig(c, intArg(k, "minhash_sig"))
        case _ => throw new IllegalArgumentException(
          "minhash_sig(tokens array<string>, numHashes int)")
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[HashExprs.SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => HashExprs.SimHash64(c)
        case _ => throw new IllegalArgumentException(
          "simhash64(tokens array<string>)")
      }),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[HashExprs.WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, n) => HashExprs.WordShingles(c, intArg(n, "word_shingles"))
        case _ => throw new IllegalArgumentException(
          "word_shingles(tokens array<string>, n int)")
      }),
    (FunctionIdentifier("hashed_sorted_set"),
      new ExpressionInfo(classOf[HashExprs.HashedSortedSet].getName, "hashed_sorted_set"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => HashExprs.HashedSortedSet(c)
        case _ => throw new IllegalArgumentException(
          "hashed_sorted_set(tokens array<string>)")
      }),
    (FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[HashExprs.WinnowedFingerprints].getName,
        "winnow_fingerprints"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, k, w) => HashExprs.WinnowedFingerprints(
          c, intArg(k, "winnow_fingerprints"), intArg(w, "winnow_fingerprints"))
        case _ => throw new IllegalArgumentException(
          "winnow_fingerprints(tokens array<string>, k int, window int)")
      }),
    (FunctionIdentifier("positional_gram_hashes"),
      new ExpressionInfo(classOf[HashExprs.PositionalGramHashes].getName,
        "positional_gram_hashes"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c, k) => HashExprs.PositionalGramHashes(
          c, intArg(k, "positional_gram_hashes"))
        case _ => throw new IllegalArgumentException(
          "positional_gram_hashes(tokens array<string>, k int)")
      }),
    (FunctionIdentifier("indicator_summary"),
      new ExpressionInfo(classOf[graft.functions.IndicatorAggExpr].getName,
        "indicator_summary"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(ts, id, price, volume, p) =>
          graft.functions.IndicatorAggExpr(
            ts, id, price, volume, intArg(p, "indicator_summary"))
        case _ => throw new IllegalArgumentException(
          "indicator_summary(ts long, id long, price double, volume double, period int)")
      }),
    (FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[HashExprs.SortedIntersectSize].getName, "sorted_intersect_size"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => HashExprs.SortedIntersectSize(a, b)
        case _ => throw new IllegalArgumentException(
          "sorted_intersect_size(a array<long>, b array<long>)")
      }),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.VecExprs.CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => graft.functions.VecExprs.CosineSim(a, b)
        case _ => throw new IllegalArgumentException(
          "cosine_sim(a array<double>, b array<double>)")
      }),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[graft.functions.NormalizeExprs.UnicodeNormalize].getName,
        "nfc_normalize"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => graft.functions.NormalizeExprs.UnicodeNormalize(c, "NFC")
        case _ => throw new IllegalArgumentException("nfc_normalize(s string)")
      }),
    (FunctionIdentifier("nfkc_normalize"),
      new ExpressionInfo(
        classOf[graft.functions.NormalizeExprs.UnicodeNormalize].getName,
        "nfkc_normalize"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => graft.functions.NormalizeExprs.UnicodeNormalize(c, "NFKC")
        case _ => throw new IllegalArgumentException("nfkc_normalize(s string)")
      }),
    (FunctionIdentifier("ohlc_bar"),
      new ExpressionInfo(classOf[graft.functions.OhlcAggExpr].getName,
        "ohlc_bar"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(o1, o2, price) => graft.functions.OhlcAggExpr(o1, o2, price)
        case _ => throw new IllegalArgumentException(
          "ohlc_bar(ord1 long, ord2 long, price double)")
      }),
    (FunctionIdentifier("image_stats"),
      new ExpressionInfo(
        classOf[graft.functions.ImageExprs.ImageStats].getName,
        "image_stats"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(bin) => graft.functions.ImageExprs.ImageStats(bin)
        case _ => throw new IllegalArgumentException(
          "image_stats(payload binary)")
      }),
    (FunctionIdentifier("wav_stats"),
      new ExpressionInfo(
        classOf[graft.functions.ImageExprs.WavStats].getName,
        "wav_stats"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(bin) => graft.functions.ImageExprs.WavStats(bin)
        case _ => throw new IllegalArgumentException(
          "wav_stats(payload binary)")
      }),
    (FunctionIdentifier("image_phash"),
      new ExpressionInfo(
        classOf[graft.functions.ImageExprs.ImagePHash].getName,
        "image_phash"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(bin) => graft.functions.ImageExprs.ImagePHash(bin)
        case _ => throw new IllegalArgumentException(
          "image_phash(payload binary)")
      }),
    (FunctionIdentifier("image_dhash"),
      new ExpressionInfo(
        classOf[graft.functions.ImageExprs.ImageDHash].getName,
        "image_dhash"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(bin) => graft.functions.ImageExprs.ImageDHash(bin)
        case _ => throw new IllegalArgumentException(
          "image_dhash(payload binary)")
      }))

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
