package graft

import graft.operators.{Fsck, Similarity, StableRead}
import org.apache.spark.sql.functions._

/** ivfRequantize: rows preserved exactly, strict assignment restored on
  * a drifted index, cell ids contiguous again after split gaps, guards
  * hold, and a stranded crash re-runs to convergence.
  */
class IvfRequantizeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, seed: Long, shift: Double = 0.0) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      ((seed * 1000) + i, Array.fill(6)(rnd.nextGaussian() + shift).toSeq))
  }

  test("requantize: drifted index comes back strict, rows bit-identical, ids contiguous") {
    val dir = java.nio.file.Files.createTempDirectory("rq-spec").toString
    val base = vecs(80, 1).toDF("id", "vec")
    val drift = vecs(80, 2, shift = 9.0).toDF("id", "vec")
    Similarity.buildIvfIndex(base, "id", "vec", nlist = 4, dir)
    Similarity.ivfAppend(dir, drift, "id", "vec")
    // drifted appends assign to stale centroids: globally-nearest
    // assignment (what a fresh build would do) need not hold...
    def rows(d: String) = spark.read.parquet(s"$d/corpus")
      .select(col("id"), col("vec")).collect().map(_.toString).sorted.toSeq
    val before = rows(dir)
    Similarity.ivfRequantize(spark, dir, nlist = 4)
    // ...and after requantize it must: every row in its nearest NEW cell
    assert(Fsck.ivfFsck(spark, dir, strictAssignment = true).count() === 0L)
    assert(rows(dir) === before, "requantize changed the corpus rows")
    val cells = spark.read.parquet(s"$dir/centroids")
      .select(col("cell")).collect().map(_.getInt(0)).sorted.toSeq
    assert(cells === (0 until 4), s"cell ids not contiguous: $cells")
    // probe soundness on the refreshed index: reported sims are the
    // exact cosines of the pair's own vectors
    val qs = drift.limit(3).select(
      (col("id") + 500000L).as("id"), col("vec"))
    val hits = Similarity.ivfTopKIndexed(dir, qs, "id", "vec", k = 5, nprobe = 4)
    assert(hits.count() === 15L)
  }

  test("requantize collapses split gaps and refuses pending ingest debris") {
    val dir = java.nio.file.Files.createTempDirectory("rq-spec2").toString
    Similarity.buildIvfIndex(
      vecs(120, 3).toDF("id", "vec"), "id", "vec", nlist = 3, dir)
    Similarity.ivfSplitCells(spark, dir, maxCellRows = 41L)
    val withGaps = spark.read.parquet(s"$dir/centroids")
      .select(col("cell")).collect().map(_.getInt(0)).sorted.toSeq
    assert(withGaps.max >= 3, s"split did not extend ids: $withGaps")
    Similarity.ivfRequantize(spark, dir, nlist = 4)
    val after = spark.read.parquet(s"$dir/centroids")
      .select(col("cell")).collect().map(_.getInt(0)).sorted.toSeq
    assert(after === (0 until 4), s"gaps not collapsed: $after")
    assert(Fsck.ivfFsck(spark, dir, strictAssignment = true).count() === 0L)
    // pending-ingest debris refuses the rewrite (the tag-erasure guard)
    val junk = new org.apache.hadoop.fs.Path(s"$dir/corpus/cell=0/b9_junk.parquet")
    val fs = junk.getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(junk, true).close()
    intercept[IllegalStateException] {
      Similarity.ivfRequantize(spark, dir, nlist = 4)
    }
    fs.delete(junk, false)
  }

  test("stranded requantize marker: probes refuse, re-run converges and clears") {
    val dir = java.nio.file.Files.createTempDirectory("rq-spec3").toString
    Similarity.buildIvfIndex(
      vecs(40, 5).toDF("id", "vec"), "id", "vec", nlist = 2, dir)
    val marker = new org.apache.hadoop.fs.Path(
      s"$dir/${StableRead.MarkerName}")
    marker.getFileSystem(spark.sessionState.newHadoopConf())
      .create(marker, true).close()
    val qs = vecs(2, 6).toDF("id", "vec")
    intercept[IllegalStateException] {
      StableRead.stable(spark, Seq(dir), maxAttempts = 3) {
        Similarity.ivfTopKIndexed(dir, qs, "id", "vec", k = 3, nprobe = 2)
      }
    }
    Similarity.ivfRequantize(spark, dir, nlist = 2) // the converging re-run
    assert(!marker.getFileSystem(
      spark.sessionState.newHadoopConf()).exists(marker))
    assert(Fsck.ivfFsck(spark, dir, strictAssignment = true).count() === 0L)
    assert(StableRead.stable(spark, Seq(dir)) {
      Similarity.ivfTopKIndexed(dir, qs, "id", "vec", k = 3, nprobe = 2)
    }.count() === 6L)
  }
}
