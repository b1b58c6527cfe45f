package graft

import org.apache.spark.sql.functions._

/** Pins the observe()-carried partition-value-set pattern the delete
  * paths use to skip their own collect jobs: collect_set is accepted by
  * CollectMetrics and the set fills on the frame's materializing action.
  */
class ObserveCollectSetSpec extends SparkSpec {
  import spark.implicits._

  test("collect_set rides an observation through localCheckpoint") {
    val obs = org.apache.spark.sql.Observation()
    val df = Seq((1L, 2L), (3L, 2L), (4L, 5L)).toDF("a", "bucket")
      .observe(obs, collect_set(col("bucket")).as("bs"))
    df.localCheckpoint(true)
    val got = obs.get("bs").asInstanceOf[Seq[Long]].toSet
    assert(got === Set(2L, 5L))
  }
}
