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

  test("pageRankInt: hand-computed integer fixpoint with dangling redistribution") {
    // a->b, a->c, b->c: outdeg a=2, b=1; c is DANGLING; ranks start at
    // 1,000,000 each; every round redistributes share = D div 3
    val e = edges("a" -> "b", "a" -> "c", "b" -> "c")
    val r1 = LinkGraph.pageRankInt(e, iters = 1)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    // round 1: D = rank(c) = 1000000, share = 333333
    // a: 150000 + 85*(0       + 333333) div 100 = 150000 +  283333
    // b: 150000 + 85*(500000  + 333333) div 100 = 150000 +  708333
    // c: 150000 + 85*(1500000 + 333333) div 100 = 150000 + 1558333
    assert(r1 === Seq(("a", 433333L), ("b", 858333L), ("c", 1708333L)))
    val r2 = LinkGraph.pageRankInt(e, iters = 2)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    // round 2: D = 1708333, share = 569444; contribs b = 433333 div 2 =
    // 216666, c = 216666 + 858333 = 1074999
    // a: 150000 + 85*(0       + 569444) div 100 = 150000 + 484027
    // b: 150000 + 85*(216666  + 569444) div 100 = 150000 + 668193
    // c: 150000 + 85*(1074999 + 569444) div 100 = 150000 + 1397776
    assert(r2 === Seq(("a", 634027L), ("b", 818193L), ("c", 1547776L)))
  }

  test("pageRankInt conserves total mass under dangling nodes (up to div truncation)") {
    // the leaking formulation this replaced decayed a->b's total mass
    // toward 2*base = 600000 over iterations; redistribution holds it
    // at 2*scale minus sub-micro-unit truncation
    val e = edges("a" -> "b")
    (1 to 8).foreach { it =>
      val total = LinkGraph.pageRankInt(e, iters = it)
        .agg(org.apache.spark.sql.functions.sum("rank"))
        .as[Long].head()
      assert(total <= 2000000L && total >= 2000000L - 4L * it,
        s"iters=$it total=$total")
    }
    // iters=3 exact values: share3 = 1244375 div 2 = 622187
    val r3 = LinkGraph.pageRankInt(e, iters = 3)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(r3 === Seq(("a", 678858L), ("b", 1321140L)))
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
