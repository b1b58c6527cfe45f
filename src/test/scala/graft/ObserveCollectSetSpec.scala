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

  test("all-doomed path: empty survivors read as an empty set, filled or absent") {
    // the deleteRows contract: when every row of the affected partitions
    // is doomed, the survivor checkpoint may run ZERO tasks (AQE prunes
    // the empty frame and CollectMetrics never executes — obs.get
    // throws) or run and report an EMPTY collect_set. Callers must map
    // BOTH shapes to "no survivors" (deleteRows' metrics() helper and
    // bm25Delete's keptB read wrap in Try and default empty). Pin the
    // wrapper semantics on an all-doomed frame.
    val obs = org.apache.spark.sql.Observation()
    Seq((1L, 2L), (3L, 2L)).toDF("a", "bucket")
      .filter(col("a") < 0) // all rows doomed
      .repartition(col("bucket"))
      .observe(obs, collect_set(col("bucket")).as("bs"))
      .localCheckpoint(true)
    val keptB = scala.util.Try(obs.get("bs"))
      .map(_.asInstanceOf[Seq[Any]].map(_.asInstanceOf[Number].longValue()))
      .getOrElse(Seq.empty).toSet
    assert(keptB.isEmpty, s"all-doomed frame reported survivors: $keptB")
  }

  test("all-doomed partition: deleteRows removes the directory and counts exactly") {
    // end-to-end over the real write path: partition 2 is FULLY doomed
    // (its survivor frame is the zero-task/empty-metrics case above —
    // dynamic overwrite alone would silently leave its files alive),
    // partition 5 is untouched
    val dir = java.nio.file.Files.createTempDirectory("obs-alldoomed").toString
    Seq((1L, 2L), (3L, 2L), (4L, 5L)).toDF("id", "bucket")
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val n = graft.sinks.Sinks.deleteRows(
      spark, dir, "bucket", "id", Seq(1L, 3L).toDF("id"))
    assert(n === 2L)
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
    assert(dirs === Set("bucket=5"),
      s"all-doomed partition directory survived: $dirs")
    assert(spark.read.parquet(dir).select(col("id"))
      .collect().map(_.getLong(0)).toSeq === Seq(4L))
  }
}
