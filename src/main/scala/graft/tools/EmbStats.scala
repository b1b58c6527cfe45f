package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EmbStats {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.localSession("embstats")
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    println("[stats] n=" + emb.count() + " labels=" + emb.select("label").distinct().count())
    emb.printSchema()
    // candidate pair volume at current q36 parameters (8 bands x 8 bits)
    val docs = emb.select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    for ((bands, bits) <- Seq((8, 8), (16, 16), (32, 16))) {
      val d = graft.operators.Similarity.cosineNearDuplicates(docs, "id", "vec", 64, 0.9, bands, bits)
      val t0 = System.nanoTime()
      val n = d.count()
      println(f"[stats] bands=$bands bits=$bits pairs=$n t=${(System.nanoTime()-t0)/1e9}%.2f s")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
