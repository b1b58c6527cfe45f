package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines: exact
  * (content-hash), MinHash+LSH near-dup, SimHash, and n-gram Jaccard
  * verification.
  *
  * Scale design (the point of these ops is the 100 TB case):
  *   - Exact dedup is a hash-aggregate on a 128-bit digest — shuffles the
  *     digest + id only, never the text.
  *   - MinHash LSH is the classic shingle -> k-minhash -> band-bucket ->
  *     within-bucket candidate join. The only wide ops are (a) one shuffle
  *     of (band_key, id, signature) rows — O(bands) per doc, text NOT
  *     shuffled — and (b) the candidate-pair verification join, whose size
  *     LSH bounds. No cross join anywhere.
  *   - All per-doc computation is built-in higher-order functions
  *     (transform/aggregate/array_*) -> codegen, no UDFs, no driver loops.
  */
object Dedup {

  /** Word-level shingles (n-grams joined by a space). n=1 gives the token
    * set itself.
    */
  def shingles(textCol: Column, n: Int): Column = {
    val toks = split(textCol, "\\s+")
    if (n <= 1) array_distinct(toks)
    else
      array_distinct(
        transform(
          sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Exact duplicate groups: md5 digest of normalized content. Returns
    * (digest, n_copies, ids) for groups with more than one member.
    */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), md5(col(textCol)).as("digest"))
      .groupBy(col("digest"))
      .agg(count(lit(1)).as("n_copies"), sort_array(collect_list(col("id"))).as("ids"))
      .filter(col("n_copies") > 1)

  /** Keep one row per distinct digest (first by idCol) — the "dedup" action
    * itself. Equivalent to dropDuplicates on the digest but with a
    * deterministic survivor.
    */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** MinHash signature as an array<long> of length `numHashes`.
    *
    * h_i(s) = (a_i * xxhash64(s) + b_i) mod p over the shingle set; the
    * signature element i is the minimum. (a_i, b_i) derive deterministically
    * from i — no RNG state, so executors compute identical functions.
    *
    * p = 2^31 - 1 keeps every intermediate product strictly below 2^62, so
    * the arithmetic never overflows a signed 64-bit long even under ANSI
    * mode (Spark 4 default). A 31-bit hash space is ample for per-document
    * shingle sets (collision odds ~n²/2^32 per signature slot).
    */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column = {
    val p = lit(2147483647L) // 2^31 - 1, Mersenne prime
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => {
        val a = pmod(hash(i, lit(0x5EED)).cast("long") * 48271L, p - 1) + 1
        val b = pmod(hash(i, lit(0xB0B)).cast("long") * 40503L, p)
        array_min(
          transform(
            shingleSet,
            s => pmod(a * pmod(xxhash64(s), p) + b, p)))
      })
  }

  /** Candidate near-duplicate pairs via banded LSH over MinHash signatures,
    * verified with exact shingle-set Jaccard.
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold,
    * one row per pair (deduped across bands).
    */
  def minhashNearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands

    val docs = df.select(
      col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    // band key = hash of the band's slice of the signature; explode to
    // (band, band_hash, id). Only ids + small arrays shuffle.
    val banded = docs.select(
      col("id"), col("sh"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => hash(lit(42), b, concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
        .as(Seq("band", "bucket")))

    val a = banded.select(
      col("band"), col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(
      col("band"), col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))

    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash over the token multiset, one pass, pure higher-order
    * functions (codegen'd, no UDF). For each bit j:
    * vote = Σ_tokens (bit_j(xxhash64(t)) ? +1 : -1); bit j of the
    * fingerprint is set iff vote > 0.
    */
  def simhash64(textCol: Column): Column = {
    val toks = split(textCol, "\\s+")
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, j) => {
        val vote = aggregate(
          toks,
          lit(0),
          (a, t) =>
            a + when(
              call_function("shiftright", xxhash64(t), j.cast("int"))
                .bitwiseAND(lit(1L)) === 1L,
              1).otherwise(-1))
        acc + when(vote > 0, call_function("shiftleft", lit(1L), j.cast("int")))
          .otherwise(0L)
      })
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate candidates: block on the 4 16-bit chunks of the
    * fingerprint (two docs within Hamming distance 3 share at least one
    * chunk — pigeonhole), verify with exact Hamming distance.
    */
  def simhashNearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val docs = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("fp"))
    val chunked = docs.select(
      col("id"), col("fp"),
      posexplode(
        transform(
          sequence(lit(0), lit(3)),
          c => call_function("shiftright", col("fp"), c.cast("int") * 16)
            .bitwiseAND(lit(0xFFFFL))))
        .as(Seq("chunk", "ckey")))
    val a = chunked.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = chunked.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact pairwise n-gram Jaccard within a blocking key (for verification
    * and small candidate sets — the all-pairs form is intentionally gated by
    * the block to stay shuffle-bounded).
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      shingleSize: Int,
      threshold: Double): DataFrame = {
    val base = df.select(
      (blockCols.map(col) :+
        col(idCol).as("id") :+
        shingles(col(textCol), shingleSize).as("sh")): _*)
    val a = base.select(
      (blockCols.map(col) :+ col("id").as("id_a") :+ col("sh").as("sh_a")): _*)
    val b = base.select(
      (blockCols.map(col) :+ col("id").as("id_b") :+ col("sh").as("sh_b")): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(
        (blockCols.map(col) :+ col("id_a") :+ col("id_b") :+
          round(col("jaccard"), 4).as("jaccard")): _*)
  }
}
