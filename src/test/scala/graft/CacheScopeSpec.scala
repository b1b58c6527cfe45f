package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Pins the CacheScope cleanup contract: sketch operators persist internal
  * frames (shingle sets, band keys, tf triples) that must survive the
  * operator call, and `CacheScope.scoped { ... }` releases exactly those
  * persists when a construct-and-consume unit finishes — no cached frames
  * left behind, the round-3 review's library-session leak closed.
  *
  * Assertions read the SQL cache manager — exactly the store CacheScope
  * manages. Raw getPersistentRDDs counts would be flaky here: other
  * suites' live localCheckpoint RDDs share the session and are reaped
  * asynchronously by the context cleaner.
  */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1 to 40).map { i =>
    (i.toLong, s"alpha beta gamma delta tok$i tok${i % 7} epsilon zeta")
  }.toDF("doc_id", "text")

  private def embeddings = (1 to 30).map { i =>
    (i.toLong, Array.tabulate(8)(d => math.sin(i * 31 + d).toFloat))
  }.toDF("vec_id", "embedding")

  private def sqlCacheEmpty: Boolean = spark.sharedState.cacheManager.isEmpty

  test("scoped jaccardPairs leaves no cached frames after consumption") {
    spark.sharedState.cacheManager.clearCache()
    val n = CacheScope.scoped {
      val inScope = Dedup.jaccardPairs(docs, "doc_id", "text", Nil, 3, 0.3).count()
      assert(!sqlCacheEmpty, "operator registered no internal caches")
      inScope
    }
    assert(n >= 0)
    assert(sqlCacheEmpty, "cached frames leaked past the scope")
  }

  test("scoped minhash + cosine + tfidf all release their caches") {
    spark.sharedState.cacheManager.clearCache()
    CacheScope.scoped {
      Dedup.minhashNearDuplicates(docs, "doc_id", "text").count()
      Similarity.cosineNearDuplicates(embeddings, "vec_id", "embedding", 8, 0.9).count()
      TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 3).count()
      assert(!sqlCacheEmpty)
    }
    assert(sqlCacheEmpty, "cached frames leaked past the scope")
  }

  test("consuming: action runs inside the scope, caches released after") {
    spark.sharedState.cacheManager.clearCache()
    val rows = CacheScope.consuming(
      Dedup.jaccardPairs(docs, "doc_id", "text", Nil, 3, 0.3)) { pairs =>
      assert(!sqlCacheEmpty, "operator caches should be live during the action")
      pairs.collect()
    }
    assert(rows.length >= 0)
    assert(sqlCacheEmpty, "cached frames leaked past consuming")
  }

  test("without a scope the lazy-lifetime contract is unchanged") {
    spark.sharedState.cacheManager.clearCache()
    Dedup.jaccardPairs(docs, "doc_id", "text", Nil, 3, 0.3).count()
    assert(!sqlCacheEmpty, "scope-free persists should remain cached")
    spark.sharedState.cacheManager.clearCache()
    assert(sqlCacheEmpty)
  }

  test("scopes nest: inner releases its own persists, outer keeps its own") {
    spark.sharedState.cacheManager.clearCache()
    CacheScope.scoped {
      Dedup.jaccardPairs(docs, "doc_id", "text", Nil, 3, 0.3).count()
      CacheScope.scoped {
        TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 3).count()
      }
      // the outer scope's frames must still be cached after the inner
      // scope exits
      assert(!sqlCacheEmpty,
        "inner scope released frames it did not register")
    }
    assert(sqlCacheEmpty)
  }

  test("scope releases persists even when the body throws") {
    spark.sharedState.cacheManager.clearCache()
    intercept[RuntimeException] {
      CacheScope.scoped {
        Dedup.jaccardPairs(docs, "doc_id", "text", Nil, 3, 0.3).count()
        assert(!sqlCacheEmpty)
        throw new RuntimeException("boom")
      }
    }
    assert(sqlCacheEmpty)
  }
}
