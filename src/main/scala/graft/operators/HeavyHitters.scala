package graft.operators

import graft.functions.CmsExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Heavy-hitter (frequent-token) detection via Count-Min Sketch — the
  * 100 TB form of "groupBy token, count, filter n >= t". The exact form
  * shuffles the entire token stream; this form absorbs the stream into a
  * fixed d×w counter grid (built distributed with map-side merges by
  * Spark's own `stat.countMinSketch`), then probes only DISTINCT tokens
  * map-side through [[CmsExprs.CmsEstimateLong]]. The only exchange left
  * carries the deduplicated vocabulary — orders of magnitude smaller than
  * the stream, and the thing you must enumerate anyway to NAME the heavy
  * hitters (a CMS alone answers point queries, not enumeration).
  *
  * CMS error model: estimates are never below the true count; each probe
  * exceeds truth by more than eps*N with probability at most delta (q82
  * gates both sides against the exact counts).
  */
object HeavyHitters {

  /** Distributed CMS build over xxhash64(token) for every token of
    * `textCol` (TextAnalysis.tokens tokenizer). Deterministic for a fixed
    * `seed`. The returned sketch's `totalCount()` is exactly the corpus
    * token count N — callers sizing the eps*N bound need no extra pass.
    */
  def tokenSketch(
      df: DataFrame, textCol: String,
      eps: Double, confidence: Double, seed: Int): CountMinSketch =
    tokenSketchOfTokens(
      df.select(explode(TextAnalysis.tokens(col(textCol))).as("tok")),
      "tok", eps, confidence, seed)

  /** Same build over an already-exploded token frame — lets a caller
    * that needs the token frame anyway (e.g. the q82 gate's exact side)
    * tokenize once, persist, and feed both consumers.
    */
  def tokenSketchOfTokens(
      toks: DataFrame, tokenCol: String,
      eps: Double, confidence: Double, seed: Int): CountMinSketch =
    toks.select(xxhash64(col(tokenCol)).as("h"))
      .stat.countMinSketch(col("h"), eps, confidence, seed)

  /** Tokens whose CMS estimate clears `minCount`, with the estimate.
    * A superset of the true heavy hitters (estimates never undercount).
    */
  def approxHeavy(
      df: DataFrame, textCol: String,
      sketch: CountMinSketch, minCount: Long): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .distinct()
      .withColumn("est_n", CmsExprs.cmsEstimate(xxhash64(col("token")), sketch))
      .filter(col("est_n") >= minCount)
}
