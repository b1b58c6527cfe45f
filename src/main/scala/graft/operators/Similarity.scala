package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k as the exact
  * baseline, and a random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Scale design:
  *   - Brute force is exact and O(|Q| * |N|): only viable when the query set
  *     is small enough to broadcast. We broadcast Q and stream the corpus —
  *     one pass, no corpus shuffle, per-query top-k via window (at very
  *     large |corpus| the window shuffle carries only (qid, nid, sim)).
  *   - LSH: `nbits` random hyperplanes -> a bucket id per vector; candidate
  *     generation joins on bucket (plus optional multi-probe neighbors at
  *     Hamming distance 1), exact cosine re-rank within candidates. The
  *     corpus is bucketed once (reusable, like an index build: at 100 TB you
  *     persist the bucketed table, bucketed BY bucket).
  *   - Dot products are `aggregate(zip_with(...))` over array columns —
  *     built-in higher-order functions, no UDF.
  */
object Similarity {

  /** Cosine similarity between two array<double|float> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(
      zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Exact top-k cosine neighbors of each query vector.
    *
    * `queries`: (qid, qvec) — must be small (it is broadcast);
    * `corpus`: (idCol, vecCol). Self-matches (qid == id) are excluded.
    * Output: (qid, id, sim, rank), rank 1..k by descending similarity.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int): DataFrame = {
    val joined = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"))
      .join(broadcast(
        queries.select(
          col(qidCol).as("qid"), col(qvecCol).cast("array<double>").as("qvec"))))
      .filter(col("qid") =!= col("id"))
      .withColumn("sim", cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("sim"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane matrix (nbits x dim), seeded —
    * every executor materializes the identical planes from the literal.
    */
  private def hyperplanes(dim: Int, nbits: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nbits, dim)(rng.nextGaussian())
  }

  /** Adds an integer LSH `bucket` column: bit i = sign(v . plane_i). */
  def withLshBucket(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      nbits: Int = 12,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, nbits, seed)
    val v = col(vecCol).cast("array<double>")
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(v, typedLit(p.toSeq), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, shiftleft(lit(1), i)).otherwise(0)
    }.reduce(_ + _)
    df.withColumn("bucket", bucket)
  }

  /** Approximate top-k: candidates share the query's bucket or any bucket at
    * Hamming distance 1 (multi-probe), re-ranked by exact cosine.
    */
  def lshTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      dim: Int,
      k: Int,
      nbits: Int = 12,
      seed: Long = 42L): DataFrame = {
    val c = withLshBucket(
      corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec")),
      "vec", dim, nbits, seed)
    val q = withLshBucket(
      queries.select(col(qidCol).as("qid"), col(qvecCol).cast("array<double>").as("qvec")),
      "qvec", dim, nbits, seed)
      .withColumnRenamed("bucket", "qbucket")
    // multi-probe: the query's own bucket + all nbits buckets one bit away
    val probes = q.select(
      col("qid"), col("qvec"),
      explode(
        array_union(
          array(col("qbucket")),
          transform(
            sequence(lit(0), lit(nbits - 1)),
            i => col("qbucket").bitwiseXOR(
              call_function("shiftleft", lit(1), i.cast("int"))))))
        .as("bucket"))
    val candidates = probes.join(c, Seq("bucket"))
      .filter(col("qid") =!= col("id"))
      .dropDuplicates("qid", "id")
      .withColumn("sim", cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("sim"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: bucket both sides, exact cosine
    * within bucket, keep pairs above threshold. The embedding analogue of
    * Dedup.minhashNearDuplicates.
    */
  def cosineNearDuplicates(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double = 0.95,
      nbits: Int = 10,
      seed: Long = 42L): DataFrame = {
    val bucketed = withLshBucket(
      df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec")),
      "vec", dim, nbits, seed)
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }
}
