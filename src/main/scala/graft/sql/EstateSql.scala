package graft.sql

import graft.operators.StableRead
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** Plain-SQL surface for the MVCC estate — `VERSION AS OF` /
  * `TIMESTAMP AS OF` over estate tables (round 19; the round-18
  * verdict's #3: `pinnedAt`/`readSnapshotAsOf` were library-only).
  *
  * Usage:
  * {{{
  *   EstateSql.registerEstate("myidx", "/data/indexes/bm25")   // once
  *   spark.sql("SELECT * FROM myidx.doclen VERSION AS OF 3")
  *   spark.sql(
  *     "SELECT * FROM myidx.terms TIMESTAMP AS OF '2026-08-16 12:00:00'")
  *   spark.sql("SELECT count(*) FROM myidx.postings")          // live read
  * }}}
  *
  * Mechanics: Spark's parser already produces
  * [[RelationTimeTravel]](UnresolvedRelation, timestamp, version) for the
  * standard `FOR?/VERSION|TIMESTAMP AS OF` syntax; the injected
  * resolution rule ([[EstateSql.TimeTravelRule]], wired through
  * `spark.sql.extensions=graft.GraftExtensions`) matches two-part
  * identifiers whose head is a REGISTERED estate name and splices in the
  * exact relation [[StableRead.readTableAt]] resolves for that
  * generation — the same file-level resolution `pinnedAt` serves, so the
  * SQL read is hash-identical to the library read (q206 pins that).
  * Resolution semantics follow the library exactly:
  *
  *   - `VERSION AS OF g` — generation `g`'s committed snapshot; a
  *     generation expired past the GC horizon fails LOUDLY, never a
  *     silently-nearest state ([[StableRead.readSnapshotAt]]);
  *   - `TIMESTAMP AS OF ts` — the newest retained generation whose
  *     commit landed at or before `ts` ([[StableRead.readSnapshotAsOf]];
  *     the timestamp expression must be foldable, e.g. a literal);
  *   - no AS OF — the live directory read, unchanged semantics.
  *
  * The registry maps a SQL-safe estate NAME to its root path (paths
  * make poor SQL identifiers); registration is session-independent
  * (a JVM-wide map, matching the estate layout on shared storage).
  */
object EstateSql {

  private val estates =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Expose `root`'s tables to SQL as `<name>.<table>`. */
  def registerEstate(name: String, root: String): Unit = {
    require(name.nonEmpty && !name.contains('.'),
      s"EstateSql.registerEstate: bad estate name '$name'")
    estates.put(name.toLowerCase(java.util.Locale.ROOT),
      root.stripSuffix("/"))
  }

  def unregisterEstate(name: String): Unit =
    estates.remove(name.toLowerCase(java.util.Locale.ROOT))

  private def rootOf(name: String): Option[String] =
    Option(estates.get(name.toLowerCase(java.util.Locale.ROOT)))

  /** (root, table) for a registered two-part identifier, None otherwise. */
  private def resolveIdent(u: UnresolvedRelation): Option[(String, String)] =
    u.multipartIdentifier match {
      case Seq(est, table) => rootOf(est).map(r => (r, table))
      case _ => None
    }

  /** The analyzer rule — injected by [[graft.GraftExtensions]]. */
  case class TimeTravelRule(spark: SparkSession) extends Rule[LogicalPlan] {

    private def aliased(u: UnresolvedRelation, df: DataFrame): LogicalPlan =
      SubqueryAlias(u.multipartIdentifier, df.queryExecution.analyzed)

    private def tsMillis(e: Expression): Long = {
      val cast = Cast(e, TimestampType,
        Some(spark.sessionState.conf.sessionLocalTimeZone))
      require(cast.foldable,
        s"estate TIMESTAMP AS OF expects a foldable timestamp, got $e")
      val v = cast.eval()
      require(v != null, s"estate TIMESTAMP AS OF evaluated to null: $e")
      Math.floorDiv(v.asInstanceOf[Long], 1000L) // micros -> ms
    }

    override def apply(plan: LogicalPlan): LogicalPlan = {
      // the analyzer runs every resolution rule per fixed-point
      // iteration on EVERY query — with no estates registered (the
      // common session) this must be one map-size check, never a tree
      // walk; with estates registered, tree-pattern pruning skips any
      // plan without an unresolved relation
      if (estates.isEmpty || plan.resolved) return plan
      plan.resolveOperatorsUpWithPruning(
        _.containsAnyPattern(
          org.apache.spark.sql.catalyst.trees.TreePattern.UNRESOLVED_RELATION,
          org.apache.spark.sql.catalyst.trees.TreePattern.RELATION_TIME_TRAVEL)) {
        case RelationTimeTravel(u: UnresolvedRelation, tsOpt, verOpt)
            if resolveIdent(u).isDefined =>
          val (root, table) = resolveIdent(u).get
          val snap = (verOpt, tsOpt) match {
            case (Some(v), None) =>
              val gen = scala.util.Try(v.toLong).getOrElse(
                throw new IllegalArgumentException(
                  s"estate VERSION AS OF expects a generation number, " +
                    s"got '$v'"))
              StableRead.readSnapshotAt(spark, root, gen).getOrElse(
                throw new IllegalStateException(
                  s"estate $root has no readable generation $gen — never " +
                    "committed, or expired past the retention horizon"))
            case (None, Some(ts)) =>
              val ms = tsMillis(ts)
              StableRead.readSnapshotAsOf(spark, root, ms).getOrElse(
                throw new IllegalStateException(
                  s"estate $root has no retained generation at or before " +
                    s"timestamp $ms ms — older than retained history"))
            case _ => throw new IllegalArgumentException(
              "estate time travel needs exactly one of VERSION AS OF / " +
                "TIMESTAMP AS OF")
          }
          aliased(u, StableRead.readTableAt(spark, snap, table))
        case u: UnresolvedRelation if resolveIdent(u).isDefined =>
          val (root, table) = resolveIdent(u).get
          aliased(u, StableRead.readTable(spark, root, table))
      }
    }
  }
}
