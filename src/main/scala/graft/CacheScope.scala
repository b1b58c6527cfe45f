package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cleanup contract for the sketch operators' internal caches.
  *
  * Several operators persist intermediate sketch frames because the frames
  * feed two or more downstream joins of the SAME returned plan (shingle
  * sets in Dedup, band keys in Similarity, tf triples in TextAnalysis).
  * Those persists must outlive the operator call — the returned frame is
  * lazy — so the operator itself can never unpersist them. The flip side
  * is that a long-lived session running many such queries accumulates
  * cached RDDs (the round-3 review's "intentional leak").
  *
  * `scoped { ... }` is the bounded-lifetime form: every internal persist
  * registered while the block runs is unpersisted when the block exits
  * (normally or exceptionally). Use it around construct-and-consume units:
  *
  * {{{
  * val pairs = CacheScope.scoped {
  *   Dedup.jaccardPairs(docs, "doc_id", "text", 0.5).collect()
  * }
  * // zero graft-cached RDDs remain (CacheScopeSpec pins this)
  * }}}
  *
  * Outside a scope the pre-existing contract is unchanged: caches live
  * until the session clears them (Bench clears between queries; Verify
  * runs one session per gate pass). Scopes are per-thread and nest; each
  * scope releases exactly the persists registered while it was the
  * innermost active scope on its thread.
  */
object CacheScope {

  private val active =
    new ThreadLocal[List[scala.collection.mutable.ArrayBuffer[DataFrame]]] {
      override def initialValue(): List[scala.collection.mutable.ArrayBuffer[DataFrame]] = Nil
    }

  /** Operator-internal replacement for `df.persist(MEMORY_AND_DISK)`:
    * persists, and registers the frame with the innermost scope (if any)
    * on the calling thread.
    */
  private[graft] def persisted(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    active.get() match {
      case buf :: _ => buf += p
      case Nil      =>
    }
    p
  }

  /** Structural form of the construct-and-consume contract. `scoped` alone
    * can't stop a caller from RETURNING a still-lazy DataFrame out of the
    * block, whose operator-internal caches are then released before first
    * consumption — every later action silently recomputes the expensive
    * subplans. Here the consuming action runs inside the scope and only
    * its (materialized) value escapes, so the mistake is unrepresentable:
    *
    * {{{
    * val rows = CacheScope.consuming(Dedup.jaccardPairs(docs, "id", "text", 0.5))(_.collect())
    * }}}
    */
  def consuming[A, T](build: => A)(action: A => T): T =
    scoped { action(build) }

  /** Run `body`, then unpersist every operator-internal cache registered
    * during it. Unpersist is non-blocking: cache-manager entries are
    * dropped synchronously (plans stop using them immediately); executor
    * block eviction proceeds asynchronously.
    *
    * Contract: `body` must both construct AND consume (materialize) — a
    * still-lazy frame returned out of the block will recompute its
    * operator-internal subplans after the scope releases their caches.
    * Prefer [[consuming]], which makes that contract structural.
    */
  def scoped[T](body: => T): T = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    active.set(buf :: active.get())
    try body
    finally {
      active.set(active.get().tail)
      buf.foreach(df => df.unpersist(blocking = false))
    }
  }
}
