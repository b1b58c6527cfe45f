package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Pins the CacheScope cleanup contract: sketch operators persist internal
  * frames (shingle sets, band keys, tf triples) that must survive the
  * operator call, and `CacheScope.scoped { ... }` releases exactly those
  * persists when a construct-and-consume unit finishes — zero cached RDDs
  * left behind, the round-3 review's library-session leak closed.
  */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1 to 40).map { i =>
    (i.toLong, s"alpha beta gamma delta tok$i tok${i % 7} epsilon zeta")
  }.toDF("doc_id", "text")

  private def embeddings = (1 to 30).map { i =>
    (i.toLong, Array.tabulate(8)(d => math.sin(i * 31 + d).toFloat))
  }.toDF("vec_id", "embedding")

  private def cachedCount: Int = spark.sparkContext.getPersistentRDDs.size

  test("scoped jaccardPairs leaves zero cached RDDs after consumption") {
    spark.sharedState.cacheManager.clearCache()
    assert(cachedCount == 0)
    val n = CacheScope.scoped {
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", Nil, 3, 0.3)
      val inScope = pairs.count()
      assert(cachedCount > 0, "operator registered no internal caches")
      inScope
    }
    assert(n >= 0)
    assert(cachedCount == 0,
      s"$cachedCount cached RDDs leaked past the scope")
  }

  test("scoped minhash + cosine + tfidf all release their caches") {
    spark.sharedState.cacheManager.clearCache()
    CacheScope.scoped {
      Dedup.minhashNearDuplicates(docs, "doc_id", "text").count()
      Similarity.cosineNearDuplicates(embeddings, "vec_id", "embedding", 8, 0.9).count()
      TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 3).count()
      assert(cachedCount > 0)
    }
    assert(cachedCount == 0,
      s"$cachedCount cached RDDs leaked past the scope")
  }

  test("without a scope the lazy-lifetime contract is unchanged") {
    spark.sharedState.cacheManager.clearCache()
    Dedup.jaccardPairs(docs, "doc_id", "text", Nil, 3, 0.3).count()
    assert(cachedCount > 0, "scope-free persists should remain cached")
    spark.sharedState.cacheManager.clearCache()
    assert(cachedCount == 0)
  }

  test("scopes nest: inner releases its own persists, outer keeps its own") {
    spark.sharedState.cacheManager.clearCache()
    CacheScope.scoped {
      Dedup.jaccardPairs(docs, "doc_id", "text", Nil, 3, 0.3).count()
      val outerCached = cachedCount
      assert(outerCached > 0)
      CacheScope.scoped {
        TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 3).count()
        assert(cachedCount > outerCached)
      }
      assert(cachedCount == outerCached,
        "inner scope released frames it did not register, or leaked its own")
    }
    assert(cachedCount == 0)
  }

  test("scope releases persists even when the body throws") {
    spark.sharedState.cacheManager.clearCache()
    intercept[RuntimeException] {
      CacheScope.scoped {
        Dedup.jaccardPairs(docs, "doc_id", "text", Nil, 3, 0.3).count()
        assert(cachedCount > 0)
        throw new RuntimeException("boom")
      }
    }
    assert(cachedCount == 0)
  }
}
