package graft

import graft.operators.LinkGraph
import org.apache.spark.sql.functions._

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (String, String)*) = rows.toDF("src", "dst")

  test("hostEdges extracts outlink hosts, drops self-links, distincts") {
    val docs = Seq(
      ("a.com", "see https://b.org/x and https://b.org/y plus http://a.com/self"),
      ("a.com", "again https://b.org/z"),
      ("c.net", "nothing linked here")).toDF("src_host", "text")
    val out = LinkGraph.hostEdges(docs, "src_host", "text")
      .as[(String, String)].collect().toSeq.sorted
    // b.org twice from a.com collapses to one edge; the a.com self-link
    // and the linkless doc contribute nothing
    assert(out === Seq(("a.com", "b.org")))
  }

  test("authority computes in-degree and 2-hop reach on a hand graph") {
    // a->b, b->c, a->c, c->a, d->a (plus noise: a duplicate and a self-loop)
    val e = edges("a" -> "b", "b" -> "c", "a" -> "c", "c" -> "a", "d" -> "a",
      "a" -> "b", "e" -> "e")
    val out = LinkGraph.authority(e)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    // reach2(a) = {b} (b->c->a; a->c->a excluded as self-origin)
    // reach2(b) = {c, d} (via a); reach2(c) = {a, d} (a->b->c, d->a->c)
    // d has no in-edges at all
    assert(out === Seq(
      ("a", 2L, 1L), ("b", 1L, 2L), ("c", 2L, 2L), ("d", 0L, 0L)))
  }

  test("pageRankInt: hand-computed integer fixpoint, one and two iterations") {
    // a->b, a->c, b->c: outdeg a=2, b=1; ranks start at 1,000,000
    val e = edges("a" -> "b", "a" -> "c", "b" -> "c")
    val r1 = LinkGraph.pageRankInt(e, iters = 1)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    // a: base only = 150000
    // b: 150000 + 85*(1000000 div 2) div 100 = 150000 + 425000
    // c: 150000 + 85*(500000 + 1000000) div 100 = 150000 + 1275000
    assert(r1 === Seq(("a", 150000L), ("b", 575000L), ("c", 1425000L)))
    val r2 = LinkGraph.pageRankInt(e, iters = 2)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    // second round from (150000, 575000, ...): a stays base;
    // b: 150000 + 85*(150000 div 2) div 100 = 150000 + 63750
    // c: 150000 + 85*(75000 + 575000) div 100 = 150000 + 552500
    assert(r2 === Seq(("a", 150000L), ("b", 213750L), ("c", 702500L)))
  }

  test("pageRankInt rejects degenerate damping and iteration counts") {
    val e = edges("a" -> "b")
    intercept[IllegalArgumentException] {
      LinkGraph.pageRankInt(e, iters = 0)
    }
    intercept[IllegalArgumentException] {
      LinkGraph.pageRankInt(e, dampNum = 100, dampDen = 100)
    }
  }

  test("authority and pageRankInt are partitioning-invariant") {
    val e = edges((0 until 40).map(i =>
      (s"h${i % 7}", s"h${(i * 3 + 1) % 7}")): _*)
    val a1 = LinkGraph.authority(e).orderBy("host")
      .as[(String, Long, Long)].collect().toSeq
    val a2 = LinkGraph.authority(e.repartition(13)).orderBy("host")
      .as[(String, Long, Long)].collect().toSeq
    assert(a1 === a2)
    val p1 = LinkGraph.pageRankInt(e).orderBy("host")
      .as[(String, Long)].collect().toSeq
    val p2 = LinkGraph.pageRankInt(e.repartition(13)).orderBy("host")
      .as[(String, Long)].collect().toSeq
    assert(p1 === p2)
  }
}
