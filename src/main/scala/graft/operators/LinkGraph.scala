package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-level link-graph analysis for crawl curation: which hosts does
  * the corpus link to, and which of them carry link authority? Link
  * structure is the classic crawl-quality signal the per-document text
  * filters cannot see (a spam farm scores fine on stopword ratios but
  * its link neighborhood is a clique of unknowns), and host-level
  * aggregation is what makes it tractable — the host graph of a 100 TB
  * crawl is millions of nodes where the page graph is hundreds of
  * billions.
  *
  * Everything here is integer-exact by construction (counts, or
  * fixed-point ranks under integral division), so DuckDB oracles
  * replicate the arithmetic bit-for-bit — no float fixpoint whose
  * summation order could diverge across engines.
  *
  * Reference analogue: none — the reference has no graph surface; this
  * extends its per-symbol aggregation pattern to a self-joined edge
  * relation.
  */
object LinkGraph {

  private val UrlPat =
    "(?i)https?://([A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)+)(/[A-Za-z0-9._/%-]*)?"

  /** Distinct (src, dst) host edges: outlink hosts extracted from
    * `textCol` (same RE2-compatible pattern as TextAnalysis.urlRefs but
    * case-insensitive on the scheme), self-loops dropped. Hosts are
    * DNS-case-insensitive, so both endpoints are lowercased before the
    * distinct — matching canonicalizeUrl — or 'Example.COM' and
    * 'example.com' would split into two graph nodes. Map-side explode +
    * one distinct — the edge relation is what shuffles, and it is
    * distinct-host-pair sized, never corpus-sized.
    */
  def hostEdges(df: DataFrame, srcHostCol: String, textCol: String): DataFrame =
    df.select(
        lower(col(srcHostCol)).as("src"),
        explode(regexp_extract_all(col(textCol), lit(UrlPat), lit(1))).as("dst0"))
      .select(col("src"), lower(col("dst0")).as("dst"))
      .filter(col("dst") =!= "" && col("src") =!= col("dst"))
      .distinct()

  /** Integer link-authority profile per host: `in_hosts` = distinct
    * linking hosts (in-degree over the distinct edge relation) and
    * `reach2` = distinct hosts with a directed 2-step path to this host
    * (excluding the host itself). Hosts that appear only as sources
    * report zeros; a host whose only edge is a self-loop carries no
    * graph information and drops out entirely (spec-pinned). Two hash
    * equi-joins + hash aggregates — the 2-hop
    * join is edge⋈edge on the shared middle host, never a cross
    * product; both metrics are exact counts a recursive-free SQL oracle
    * reproduces.
    */
  def authority(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .transform(graft.CacheScope.persisted)
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host")))
      .distinct()
    val indeg = e.groupBy(col("dst").as("host"))
      .agg(count(lit(1)).as("in_hosts"))
    val reach2 = e.as("e1")
      .join(e.as("e2"), col("e1.dst") === col("e2.src"))
      .filter(col("e1.src") =!= col("e2.dst"))
      .select(col("e2.dst").as("host"), col("e1.src").as("origin"))
      .distinct()
      .groupBy(col("host"))
      .agg(count(lit(1)).as("reach2"))
    nodes
      .join(indeg, Seq("host"), "left")
      .join(reach2, Seq("host"), "left")
      .select(col("host"),
        coalesce(col("in_hosts"), lit(0L)).as("in_hosts"),
        coalesce(col("reach2"), lit(0L)).as("reach2"))
  }

  /** Fixed-point integer PageRank: ranks live in `scale` micro-units
    * (default: 1,000,000 = 1.0) and every step is integral division, so
    * the quantized fixpoint is DETERMINISTIC and engine-portable — a
    * float power iteration's ±1 ulp summation noise cannot flip a rank
    * comparison, because there are no floats. Per iteration each host
    * sends `rank div outdeg` along its out-edges and every host
    * receives `((den-num)·scale) div den + (num·(Σcontrib + share))
    * div den` (hosts without in-links keep the base term), where
    * `share` is the DANGLING MASS redistribution: hosts with no
    * out-edges would otherwise leak their rank out of the system each
    * round (the textbook simplified formulation's known defect — total
    * mass decays toward N·base and long-iteration rankings skew toward
    * the base term), so their summed rank is divided uniformly across
    * all hosts, `share = (Σ dangling rank) div N` — the standard
    * dangling-node treatment in integral form. Total mass is conserved
    * up to integral-division truncation (< 1 micro-unit per div).
    *
    * Scale: the iterate is a host-sized frame; each of the `iters`
    * rounds is one equi-join with the (persisted) edge relation, a hash
    * aggregate on dst, and the one-row dangling sum riding a scalar
    * subquery. The iterate is eagerly localCheckpoint'd per round: the
    * dangling term references the previous iterate a second time, so a
    * lazy chain would recompute (and re-analyze) 2^iters subtrees —
    * the checkpoint keeps both plan and runtime linear in `iters` (the
    * Dedup.connectedComponents driver-loop precedent).
    */
  def pageRankInt(
      edges: DataFrame, iters: Int = 3, scale: Long = 1000000L,
      dampNum: Int = 85, dampDen: Int = 100): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters must be in [1, 8], got $iters")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping $dampNum/$dampDen must be in (0, 1)")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .transform(graft.CacheScope.persisted)
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host")))
      .distinct()
      .transform(graft.CacheScope.persisted)
    val outdeg = e.groupBy(col("src").as("host"))
      .agg(count(lit(1)).as("outdeg"))
      .transform(graft.CacheScope.persisted)
    val base = (scale * (dampDen - dampNum)) / dampDen
    val nTotal = nodes.agg(count(lit(1)).as("n")).scalar()
    var ranks = nodes.select(col("host"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      val cur = ranks.localCheckpoint(true)
      val contribs = cur
        .join(outdeg, Seq("host"))
        .select(col("host"),
          call_function("div", col("rank"), col("outdeg")).as("contrib"))
        .join(e, col("host") === col("src"))
        .groupBy(col("dst").as("host"))
        .agg(sum(col("contrib")).as("in_sum"))
      // dangling mass: hosts with no out-edges, their rank shared
      // uniformly — one bounded row riding a scalar subquery
      val share = call_function("div",
        cur.join(outdeg, Seq("host"), "left_anti")
          .agg(coalesce(sum(col("rank")), lit(0L)).as("d")).scalar(),
        nTotal)
      ranks = nodes
        .join(contribs, Seq("host"), "left")
        .select(col("host"),
          (lit(base) + call_function("div",
            lit(dampNum.toLong) *
              (coalesce(col("in_sum"), lit(0L)) + share),
            lit(dampDen.toLong))).as("rank"))
    }
    ranks
  }
}
