package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures LSH and IVF ANN recall against brute-force cosine top-k on the
  * real embeddings table — the evidence behind the recall bounds pinned by
  * the q40/q41 gate queries.
  *
  * Run: sbt "runMain graft.tools.AnnRecall /root/testdata/sf0.01"
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.Tables.load(spark, dir, "embeddings")
    val qs = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", qs, "vec_id", "embedding", k = 10)
      .select(col("qid"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(name: String, approx: Array[(Long, Long)]): Unit = {
      val hits = approx.count(brute.contains)
      println(f"[recall] $name%-8s ${hits.toDouble / brute.size}%.3f ($hits/${brute.size})")
    }
    recall("lsh", Similarity.lshTopK(
      emb, "vec_id", "embedding", qs, "vec_id", "embedding",
      dim = 64, k = 10)
      .select(col("qid"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1))))
    recall("ivf", Similarity.ivfTopK(
      emb, "vec_id", "embedding", qs, "vec_id", "embedding",
      k = 10, nlist = 16, nprobe = 4)
      .select(col("qid"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1))))

    // parameter sweep: recall vs corpus fraction touched, the tuning table
    // for picking (tables, bits, radius) on a given similarity regime
    val n = emb.count() - 1 // candidates exclude self
    for {
      tables <- Seq(4, 8, 16)
      bits <- Seq(8, 10, 12)
      radius <- Seq(0, 1)
    } {
      val out = Similarity.lshTopK(
        emb, "vec_id", "embedding", qs, "vec_id", "embedding",
        dim = 64, k = 10, tables = tables, bitsPerTable = bits,
        probeRadius = radius)
      val got = out.select(col("qid"), col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // expected scan fraction: tables * probes / 2^bits (capped at 1)
      val probes = 1 + (if (radius >= 1) bits else 0)
      val frac = math.min(1.0, tables.toDouble * probes / (1L << bits))
      val hits = got.count(brute.contains)
      println(f"[sweep] L=$tables%2d r=$bits%2d probe=$radius " +
        f"recall=${hits.toDouble / brute.size}%.3f est_scan=${frac}%.3f")
    }
    spark.stop()
  }
}
