package graft

import graft.functions.CmsExprs
import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

/** CMS heavy hitters: one-sided error on a known distribution, superset
  * containment of the exact heavy set, and build determinism.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // "hot" appears 60x, "warm" 12x, every cold token once
  private lazy val docs = (
    Seq.fill(12)("hot hot hot hot hot warm") ++
      (0 until 40).map(i => s"cold$i")
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  private lazy val sketch =
    HeavyHitters.tokenSketch(docs, "text", eps = 0.01,
      confidence = 0.999, seed = 7)

  private lazy val exact: Map[String, Long] =
    docs.select(explode(graft.operators.TextAnalysis.tokens(col("text")))
        .as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap

  test("estimates never undercount any token") {
    val est = docs.select(explode(
        graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .distinct()
      .select(col("t"),
        CmsExprs.cmsEstimate(xxhash64(col("t")), sketch).as("e"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"CMS undercounted $t: ${est(t)} < $n")
    }
  }

  test("approxHeavy returns a superset of the true heavy set") {
    val got = HeavyHitters.approxHeavy(docs, "text", sketch, minCount = 10L)
      .select("token").as[String].collect().toSet
    val truth = exact.filter(_._2 >= 10L).keySet
    assert(truth.subsetOf(got), s"missed heavy hitters: ${truth -- got}")
    assert(got.contains("hot") && got.contains("warm"))
  }

  test("same seed builds an identical sketch; probe plan has no join") {
    val again = HeavyHitters.tokenSketch(docs, "text", eps = 0.01,
      confidence = 0.999, seed = 7)
    assert(sketch.estimateCount(12345L) == again.estimateCount(12345L))
    assert(Seq("hot", "warm", "cold3").forall { t =>
      val h = spark.range(1).select(xxhash64(lit(t))).as[Long].head()
      sketch.estimateCount(h) == again.estimateCount(h)
    })
    val plan = HeavyHitters.approxHeavy(docs, "text", sketch, 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }
}
