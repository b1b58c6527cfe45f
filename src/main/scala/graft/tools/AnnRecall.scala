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

    val emb = graft.Tables.load(spark, dir, "embeddings").persist()
    emb.count()
    val nCorpus = emb.count()
    val qs = emb.filter(col("vec_id") < 30).persist()
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

    // LSH sweep: recall vs corpus fraction touched, the tuning table
    // for picking (tables, bits, radius) on a given similarity regime
    for {
      tables <- Seq(4, 8, 16)
      bits <- Seq(8, 10, 12)
      radius <- Seq(0, 1)
    } {
      val t0 = System.nanoTime()
      val out = Similarity.lshTopK(
        emb, "vec_id", "embedding", qs, "vec_id", "embedding",
        dim = 64, k = 10, tables = tables, bitsPerTable = bits,
        probeRadius = radius)
      val got = out.select(col("qid"), col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val wall = (System.nanoTime() - t0) / 1e9
      // expected scan fraction: tables * probes / 2^bits (capped at 1)
      val probes = 1 + (if (radius >= 1) bits else 0)
      val frac = math.min(1.0, tables.toDouble * probes / (1L << bits))
      val hits = got.count(brute.contains)
      println(f"[sweep] lsh L=$tables%2d r=$bits%2d probe=$radius " +
        f"recall=${hits.toDouble / brute.size}%.3f est_scan=$frac%.3f " +
        f"wall=$wall%5.2f s")
    }

    // Quantized persisted-index sweep (the q159 production layout):
    // recall vs nprobe x rerankFactor, with the stage-1 bytes-read cost
    // reported against the float indexed probe at the same nprobe. The
    // int8 stage only SELECTS candidates (reported sims are exact float
    // cosines), so its only quality lever is how many survivors the
    // rerank sees — rerankFactor buys back the int8 selection loss.
    // Bytes are logical uncompressed per candidate row: float stage-1
    // reads (id, vec) = 8 + 8*dim; quantized stage-1 reads (id, qvec,
    // qn2) = 8 + dim + 8, ~1/8th at dim=64 — the probed-cell candidate
    // count is measured, the per-row widths are schema facts.
    locally {
      val dim = emb.selectExpr("size(embedding)").first().getInt(0)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-annrecall-ivfq").toString
      Similarity.buildIvfQIndex(
        emb, "vec_id", "embedding", nlist = 16, idxDir)
      val cents = spark.read.parquet(s"$idxDir/centroids")
        .orderBy(col("cell")).collect().map(_.getSeq[Double](1)).toSeq
      val assigned = emb.select(
          col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))
        .withColumn("cell", element_at(
          graft.functions.VecExprs.nearestCentroids(col("vec"), cents, 1), 1))
        .persist()
      for {
        nprobe <- Seq(2, 4, 8)
        rerank <- Seq(1, 2, 4, 8)
      } {
        val candRows = qs.select(
            col("vec_id").as("qid"),
            col("embedding").cast("array<double>").as("qvec"))
          .select(col("qid"), explode(
            graft.functions.VecExprs.nearestCentroids(
              col("qvec"), cents, nprobe)).as("cell"))
          .join(assigned, "cell").count()
        val t0 = System.nanoTime()
        val got = Similarity.ivfQTopKIndexed(
            idxDir, qs, "vec_id", "embedding",
            k = 10, nprobe = nprobe, rerankFactor = rerank)
          .select(col("qid"), col("id")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val wall = (System.nanoTime() - t0) / 1e9
        val hits = got.count(brute.contains)
        val s1KB = candRows * (8L + dim + 8L) / 1024
        val floatKB = candRows * (8L + 8L * dim) / 1024
        println(f"[sweep] ivfq nprobe=$nprobe rerank=$rerank " +
          f"recall=${hits.toDouble / brute.size}%.3f " +
          f"stage1=${s1KB}%6d KiB (float probe ${floatKB}%6d KiB) " +
          f"wall=$wall%5.2f s")
      }
      assigned.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir))
    }

    // IVF sweep: recall vs probed-cell cost — nprobe/nlist is the
    // designed corpus fraction; cand_frac is the MEASURED one (actual
    // probed-cell population / (queries x corpus)), which diverges when
    // cells are imbalanced
    for {
      nlist <- Seq(16, 64)
      nprobe <- Seq(1, 2, 4, 8)
      if nprobe < nlist
    } {
      val centroids = Similarity.trainIvfCentroids(
        emb, "vec_id", "embedding", nlist)
      val cents = centroids.map(_.toSeq).toSeq
      val assigned = emb.select(
          col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))
        .withColumn("cell", element_at(
          graft.functions.VecExprs.nearestCentroids(col("vec"), cents, 1), 1))
      val probed = qs.select(
          col("vec_id").as("qid"),
          col("embedding").cast("array<double>").as("qvec"))
        .select(col("qid"), explode(
          graft.functions.VecExprs.nearestCentroids(
            col("qvec"), cents, nprobe)).as("cell"))
        .join(assigned, "cell").count()
      val candFrac = probed.toDouble / (qs.count() * nCorpus)
      val t0 = System.nanoTime()
      val got = Similarity.ivfTopK(
          emb, "vec_id", "embedding", qs, "vec_id", "embedding",
          k = 10, nlist = nlist, nprobe = nprobe)
        .select(col("qid"), col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val wall = (System.nanoTime() - t0) / 1e9
      val hits = got.count(brute.contains)
      println(f"[sweep] ivf nlist=$nlist%2d nprobe=$nprobe " +
        f"recall=${hits.toDouble / brute.size}%.3f " +
        f"designed=${nprobe.toDouble / nlist}%.3f cand_frac=$candFrac%.3f " +
        f"wall=$wall%5.2f s")
    }
    spark.stop()
  }
}
