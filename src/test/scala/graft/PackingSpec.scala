package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("greedy contiguous packing with a hand-checked boundary walk") {
    // one shard (numShards=1), budget 10, ids in order:
    //   id 1 (4 toks)  cumBefore 0  -> pack 0
    //   id 2 (5 toks)  cumBefore 4  -> pack 0   (pack 0 now 9)
    //   id 3 (3 toks)  cumBefore 9  -> pack 0   (overflows to 12)
    //   id 4 (2 toks)  cumBefore 12 -> pack 1
    //   id 5 (25 toks) cumBefore 14 -> pack 1   (mega-doc overflows)
    //   id 6 (1 tok)   cumBefore 39 -> pack 3   (pack 2 skipped entirely)
    val df = Seq((1L, 4L), (2L, 5L), (3L, 3L), (4L, 2L), (5L, 25L), (6L, 1L))
      .toDF("doc_id", "n_toks")
    val got = Packing.packSequences(df, "doc_id", "n_toks", budget = 10L, numShards = 1)
      .select("doc_id", "pack").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 3L))
  }

  test("packProfile: totals conserved, overflow only where expected") {
    val df = Seq((1L, 4L), (2L, 5L), (3L, 3L), (4L, 2L), (5L, 25L), (6L, 1L))
      .toDF("doc_id", "n_toks")
    val prof = Packing.packProfile(df, "doc_id", "n_toks", 10L, 1)
      .orderBy("pack")
      .select("pack", "n_docs", "pack_tokens", "overflow_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(prof == Seq((0L, 3L, 12L, 2L), (1L, 2L, 27L, 17L), (3L, 1L, 1L, 0L)))
    assert(prof.map(_._3).sum == df.agg(sum("n_toks")).as[Long].head())
  }

  test("chunkDocuments: exact chunk walk, conservation, remainder") {
    // budget 10: 25 toks -> chunks (10,10,5); 10 -> (10); 3 -> (3)
    val df = Seq((1L, 25L), (2L, 10L), (3L, 3L)).toDF("doc_id", "n_toks")
    val out = Packing.chunkDocuments(df, "doc_id", "n_toks", budget = 10L)
      .select("doc_id", "chunk", "chunk_tokens")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(out === Seq(
      (1L, 0L, 10L), (1L, 1L, 10L), (1L, 2L, 5L),
      (2L, 0L, 10L), (3L, 0L, 3L)))
    // conservation across any input
    val rng = new scala.util.Random(5)
    val rows = (1L to 200L).map(i => (i, 1L + rng.nextInt(300).toLong))
    val chunked = Packing.chunkDocuments(
      rows.toDF("doc_id", "n_toks"), "doc_id", "n_toks", 64L)
    assert(chunked.agg(sum("chunk_tokens")).as[Long].head() === rows.map(_._2).sum)
    assert(chunked.filter(col("chunk_tokens") > 64L).count() === 0)
  }

  test("chunkDocuments rejects null and non-positive token counts") {
    val bad = Seq((1L, Some(4L)), (2L, Some(0L))).toDF("doc_id", "n_toks")
    val e = intercept[Exception] {
      Packing.chunkDocuments(bad, "doc_id", "n_toks", 10L).collect()
    }
    assert(e.getMessage.contains("chunkDocuments") ||
      Option(e.getCause).exists(_.getMessage.contains("chunkDocuments")))
  }

  test("null id or token count fails fast instead of a silent null pack") {
    // a null token count would otherwise be SKIPPED by sum().over(w) while
    // cum_after - tokenCol yields a null pack — the doc lands in its own
    // null-pack group instead of erroring
    val nullToks = Seq((1L, Some(4L)), (2L, None), (3L, Some(3L)))
      .toDF("doc_id", "n_toks")
    val e = intercept[Exception] {
      Packing.packSequences(nullToks, "doc_id", "n_toks", 10L, 1)
        .collect()
    }
    assert(e.getMessage.contains("packSequences") ||
      Option(e.getCause).exists(_.getMessage.contains("packSequences")))
  }

  test("assignment is partition-layout invariant") {
    val rng = new scala.util.Random(3)
    val rows = (1L to 500L).map(i => (i, 1L + rng.nextInt(200).toLong))
    val a = Packing.packSequences(
      rows.toDF("doc_id", "n_toks").repartition(13), "doc_id", "n_toks", 256L, 4)
      .select("doc_id", "shard", "pack").as[(Long, Long, Long)].collect().toSet
    val b = Packing.packSequences(
      rows.reverse.toDF("doc_id", "n_toks").coalesce(1), "doc_id", "n_toks", 256L, 4)
      .select("doc_id", "shard", "pack").as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    // shards partition the corpus
    assert(a.map(_._1).size == 500)
  }

  test("every non-final pack in a shard reaches the budget threshold") {
    // greedy-contiguous invariant: a new pack only starts after the
    // running sum crosses a budget boundary, so each pack except the
    // shard's last must end at-or-past its boundary
    val rng = new scala.util.Random(9)
    val rows = (1L to 300L).map(i => (i, 1L + rng.nextInt(50).toLong))
    val prof = Packing.packProfile(rows.toDF("doc_id", "n_toks"),
      "doc_id", "n_toks", 128L, 2)
      .orderBy("shard", "pack")
      .select("shard", "pack", "pack_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    prof.groupBy(_._1).foreach { case (_, packs) =>
      packs.dropRight(1).foreach { case (s, p, toks) =>
        // a pack closes only by crossing its boundary unless a later doc
        // jumped multiple boundaries (mega-doc) — then the skipped pack
        // simply doesn't exist, so every listed non-final pack crossed
        assert(toks > 0, s"empty pack $s/$p")
      }
    }
  }

  test("chunkTexts reconstructs the token stream and conserves counts") {
    val docs = Seq(
      (1L, (1 to 10).map("t" + _).mkString(" ")),  // 10 toks -> 4,4,2 at budget 4
      (2L, "a  b\tc"),                             // messy whitespace, 3 toks
      (3L, ""),                                    // zero tokens -> no chunks
      (4L, (1 to 4).map("u" + _).mkString(" "))    // exactly one full chunk
    ).toDF("doc_id", "text")
    val out = Packing.chunkTexts(docs, "text", budget = 4)
      .orderBy("doc_id", "chunk")
      .select("doc_id", "chunk", "chunk_text", "chunk_tokens")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(!out.exists(_._1 == 3L), "zero-token doc produced a chunk")
    // chunk sizes: full budget except the last remainder
    assert(out.filter(_._1 == 1L).map(_._4) == Seq(4L, 4L, 2L))
    assert(out.filter(_._1 == 2L).map(_._4) == Seq(3L))
    assert(out.filter(_._1 == 4L).map(_._4) == Seq(4L))
    // concatenating chunk texts in order == single-spaced token stream
    val rebuilt = out.filter(_._1 == 1L).map(_._3).mkString(" ")
    assert(rebuilt == (1 to 10).map("t" + _).mkString(" "), rebuilt)
    assert(out.find(_._1 == 2L).get._3 == "a b c")
  }

  test("slidingChunks: start grid, overlap, tail, degenerate cases") {
    val docs = Seq(
      (1L, (1 to 10).map("t" + _).mkString(" ")), // 10 toks, w=4 s=2 -> starts 0,2,4,6
      (2L, "a b c"),                              // n <= window -> one whole chunk
      (3L, ""),                                   // zero tokens -> dropped
      (4L, (1 to 9).map("u" + _).mkString(" "))   // 9 toks -> starts 0,2,4,6 (tail 3)
    ).toDF("doc_id", "text")
    val out = Packing.slidingChunks(docs, "text", window = 4, stride = 2)
      .orderBy("doc_id", "chunk")
      .select("doc_id", "chunk_start", "chunk_text", "chunk_tokens")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(!out.exists(_._1 == 3L), "zero-token doc produced a chunk")
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2) == Seq(0L, 2L, 4L, 6L), d1)
    assert(d1.map(_._4) == Seq(4L, 4L, 4L, 4L))
    // the overlap property itself: each chunk's last window-stride tokens
    // are the next chunk's first
    d1.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3.split(" ").takeRight(2).toSeq ===
        b._3.split(" ").take(2).toSeq, s"$a | $b")
    }
    assert(d1.last._3 == "t7 t8 t9 t10")
    assert(out.filter(_._1 == 2L).map(t => (t._2, t._3, t._4)) ==
      Seq((0L, "a b c", 3L)))
    val d4 = out.filter(_._1 == 4L)
    assert(d4.map(_._2) == Seq(0L, 2L, 4L, 6L))
    assert(d4.last._4 === 3L) // short tail still covers the end
    assert(d4.last._3 == "u7 u8 u9")

    // stride == window degenerates to chunkTexts' disjoint layout
    val slid = Packing.slidingChunks(docs, "text", window = 4, stride = 4)
      .select("doc_id", "chunk", "chunk_text", "chunk_tokens")
      .as[(Long, Long, String, Long)].collect().toSet
    val disjoint = Packing.chunkTexts(docs, "text", budget = 4)
      .select("doc_id", "chunk", "chunk_text", "chunk_tokens")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(slid === disjoint)

    intercept[IllegalArgumentException] {
      Packing.slidingChunks(docs, "text", window = 4, stride = 5)
    }
  }

  test("chunkDedup keeps the first coordinate per repeated chunk, globally") {
    val common = (1 to 4).map("x" + _).mkString(" ") // a 4-token boilerplate run
    val docs = Seq(
      // doc 1: unique head + boilerplate tail => chunks [head][common]
      (1L, "en", (1 to 4).map("a" + _).mkString(" ") + " " + common),
      // doc 2 (other lang): boilerplate head + unique tail
      (2L, "de", common + " " + (1 to 4).map("b" + _).mkString(" ")),
      // doc 3: the boilerplate alone — fully deduped away
      (3L, "en", common)
    ).toDF("doc_id", "lang", "text")
    val out = graft.operators.Dedup
      .chunkDedup(docs, "doc_id", "text", budget = 4, carryCols = Seq("lang"))
      .select("doc_id", "chunk", "keep").as[(Long, Long, Boolean)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // 5 chunks total (2+2+1); the common chunk appears at (1,1), (2,0),
    // (3,0) — survivor is (1,1) (lowest doc_id, then chunk)
    assert(out.size == 5)
    assert(out((1L, 0L)) && out((1L, 1L)), "doc 1 chunks must both survive")
    assert(!out((2L, 0L)), "doc 2's boilerplate head must dedup away")
    assert(out((2L, 1L)), "doc 2's unique tail must survive")
    assert(!out((3L, 0L)), "doc 3 (pure boilerplate) must dedup away")
  }

  test("materializePacks concatenates each pack's members in id order") {
    // shard 1 (odd ids): cums 2,3,6,7 at budget 5 -> packs 0,0,0,1
    val d = Seq(
      (1L, "a b", 2L), (3L, "c", 1L), (5L, "d d d", 3L), (7L, "e", 1L),
      (2L, "z", 1L)
    ).toDF("doc_id", "text", "nt")
    val out = Packing.materializePacks(d, "doc_id", "text", "nt",
        budget = 5L, numShards = 2)
      .select("shard", "pack", "n_docs", "pack_tokens", "pack_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(out === Seq(
      (0L, 0L, 1L, 1L, "z"),
      (1L, 0L, 3L, 6L, "a b c d d d"),
      (1L, 1L, 1L, 1L, "e")))
    // arrival order cannot change the layout
    val shuffled = Packing.materializePacks(d.repartition(7), "doc_id",
        "text", "nt", budget = 5L, numShards = 2)
      .select("shard", "pack", "pack_text")
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(shuffled === out.map(r => (r._1, r._2, r._5)))
  }

  test("lengthBucketStats: hand-computed buckets, padding, truncation") {
    val d = Seq((1L, 10L), (2L, 16L), (3L, 17L), (4L, 40L), (5L, 100L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.lengthBucketStats(d, "doc_id", "n_tokens", Seq(16, 32, 64))
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      // bucket, n_docs, token_total, padded, truncated, utilization_pct
      (16L, 2L, 26L, 6L, 0L, 81L),   // 26*100 div 32 = 81
      (32L, 1L, 17L, 15L, 0L, 53L),  // 17*100 div 32 = 53
      (64L, 2L, 140L, 24L, 36L, 81L) // (40+64)*100 div 128 = 81
    ))
  }

  test("lengthBucketStats rejects bad boundaries and null/zero tokens") {
    val d = Seq((1L, 10L)).toDF("doc_id", "n_tokens")
    intercept[IllegalArgumentException] {
      Packing.lengthBucketStats(d, "doc_id", "n_tokens", Seq(32, 16))
    }
    intercept[IllegalArgumentException] {
      Packing.lengthBucketStats(d, "doc_id", "n_tokens", Seq.empty)
    }
    val e = intercept[Exception] {
      Packing.lengthBucketStats(
        Seq((1L, 0L)).toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", Seq(16)).collect()
    }
    assert(e.getMessage.contains("lengthBucketStats"))
  }

  test("chunkDedup plan ships digests, not chunk text, through the exchange") {
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = graft.operators.Dedup
      .chunkDedup(docs, "doc_id", "text", budget = 4)
      .queryExecution.executedPlan.toString
    // no Exchange may list a text attribute in its partitioning header —
    // the digest partitions the window (same check as PlanShapeSpec)
    val exchanges = plan.split("Exchange").drop(1)
    assert(exchanges.nonEmpty, plan)
    assert(!exchanges.exists(e => e.takeWhile(_ != '\n').contains("text#")),
      "an exchange carries chunk/document text:\n" + plan)
  }

  test("cdc chunks: lossless partition, short docs, and determinism") {
    val words = (0 until 400).map(i => s"w${i * 7919 % 997}")
    val docs = Seq(
      (1L, words.mkString(" ")),
      (2L, "a b"),          // shorter than k+1: exactly one chunk
      (3L, "")               // tokenless: no rows
    ).toDF("doc_id", "text")
    val out = Packing.cdcChunks(docs, "doc_id", "text").collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(!byDoc.contains(3L))
    assert(byDoc(2L).map(_.getString(2)).toSeq === Seq("a b"))
    // chunks of doc 1 concatenate back to the original token stream
    val d1 = byDoc(1L).sortBy(_.getInt(1))
    assert(d1.map(_.getString(2)).mkString(" ") === words.mkString(" "))
    assert(d1.length > 1, "mask 16 over 400 tokens should cut somewhere")
    // chunk_idx is a clean 0..m-1 ramp and n_tokens sums to the doc
    assert(d1.map(_.getInt(1)).toSeq === d1.indices)
    assert(d1.map(_.getInt(3)).sum === 400)
  }

  test("cdc chunks: an edit changes only the chunks that touch it") {
    val words = (0 until 400).map(i => s"w${i * 7919 % 997}")
    val orig = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    // splice one token into the middle — fixed-size chunking would shift
    // every downstream boundary; CDC must re-use the far chunks
    val edited = Seq(
      (1L, (words.take(200) ++ Seq("EDIT") ++ words.drop(200)).mkString(" ")))
      .toDF("doc_id", "text")
    def digests(df: org.apache.spark.sql.DataFrame): Seq[String] =
      Packing.cdcChunks(df, "doc_id", "text")
        .orderBy(col("chunk_idx")).select("chunk_digest")
        .as[String].collect().toSeq
    val a = digests(orig)
    val b = digests(edited)
    val shared = a.toSet.intersect(b.toSet).size
    // all but the edited chunk (and at most its immediate neighbors,
    // if the splice created or destroyed a cut) survive
    assert(shared >= a.size - 3,
      s"edit invalidated ${a.size - shared} of ${a.size} chunks")
    assert(a.toSet !== b.toSet) // the touched chunk DID change
    intercept[IllegalArgumentException](
      Packing.cdcChunks(orig, "doc_id", "text", k = 1))
    intercept[IllegalArgumentException](
      Packing.cdcChunks(orig, "doc_id", "text", mask = 1))
  }
}
