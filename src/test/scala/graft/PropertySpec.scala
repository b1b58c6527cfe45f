package graft

import graft.operators.{CurationFilters, Dedup, Indicators, Packing, Sessionize, TradeRules, Validation}
import org.scalacheck.Gen

/** Property-based invariants (SURVEY.md §5 test plan): indicator bounds,
  * validator-implies-constraints, and — most load-bearing — the
  * prefix-filtered Jaccard join agreeing with brute force on random
  * corpora (the PPJoin rewrite must be output-identical by construction).
  *
  * Sampling is a deterministic seed-walked loop over ScalaCheck Gens (the
  * scalatest-scalacheck bridge artifact is not on the offline classpath).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(body)
      seed = seed.next
      i += 1
    }
  }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val priceSeries: Gen[List[Double]] =
    Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1.0, 1000.0).map(v => math.rint(v * 100) / 100)))

  test("property: rsi in [0,100], sma and vwap within price bounds") {
    forAll(priceSeries) { prices =>
      whenever(prices.nonEmpty) {
        val df = prices.zipWithIndex
          .map { case (p, i) => ("S", i.toLong, p, 1) }
          .toDF("symbol", "ts", "price", "volume")
        val (sma, rsi, vwap) = Indicators.summary(
          df, Seq("symbol"), "price", Some("volume"), Seq("ts"), 14)
          .select("sma", "rsi", "vwap").as[(Double, Double, Double)].head()
        assert(rsi >= 0.0 && rsi <= 100.0)
        assert(sma >= prices.min - 1e-9 && sma <= prices.max + 1e-9)
        assert(vwap >= prices.min - 1e-9 && vwap <= prices.max + 1e-9)
      }
    }
  }

  test("property: validator acceptance implies the DB CHECK constraints") {
    val anyTrade = for {
      sym <- Gen.oneOf(Gen.alphaUpperStr.map(_.take(10)), Gen.alphaStr.map(_.take(10)))
      price <- Gen.chooseNum(-10.0, 2000000.0)
      vol <- Gen.chooseNum(-5, 5000)
      side <- Gen.oneOf("B", "S", "N", "X", "")
      typ <- Gen.oneOf("M", "L", "I", "Q")
      ts <- Gen.chooseNum(-1L, 10L)
    } yield (sym, price, vol, side, typ, ts)
    forAll(Gen.listOfN(30, anyTrade)) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.zipWithIndex.map { case ((sym, p, v, s, t, ts), i) =>
          graft.model.Trade(i.toLong, i.toLong, ts, p, v, sym, "", s, t, is_pro = false)
        }.toDF()
        val valid = Validation.split(df, TradeRules.rules).valid
          .as[graft.model.Trade].collect()
        valid.foreach { tr =>
          assert(tr.price > 0 && tr.price < 1000000)
          assert(tr.volume > 0)
          assert(Set("B", "S", "N")(tr.side) && Set("M", "L", "I")(tr.`type`))
          assert(tr.timestamp > 0)
          assert(tr.symbol.matches("[A-Z]{1,10}"))
        }
      }
    }
  }

  test("property: prefix-filtered jaccard equals brute force") {
    val word: Gen[String] = Gen.chooseNum(0, 25).map(i => s"w$i")
    val doc: Gen[String] =
      Gen.chooseNum(3, 15).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    forAll(Gen.chooseNum(5, 25).flatMap(n => Gen.listOfN(n, doc))) { docs =>
      whenever(docs.nonEmpty) {
        val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d, "b") }
          .toDF("doc_id", "text", "blk")
        val got = Dedup.jaccardPairs(df, "doc_id", "text", Seq("blk"), 1, 0.5)
          .select("id_a", "id_b", "jaccard")
          .as[(Long, Long, Double)].collect().toSet
        // driver-side brute force over token sets
        val sets = docs.map(_.split("\\s+").filter(_.nonEmpty).toSet)
        val expected = (for {
          i <- sets.indices; j <- sets.indices if i < j
          inter = sets(i).intersect(sets(j)).size
          uni = sets(i).union(sets(j)).size
          if uni > 0 && inter.toDouble / uni >= 0.5
        } yield (i.toLong, j.toLong,
          math.rint(inter.toDouble / uni * 10000) / 10000)).toSet
        assert(got === expected)
      }
    }
  }

  test("property: assignSplit partitions every row among exactly the named splits") {
    val weightsGen: Gen[List[Double]] =
      Gen.chooseNum(2, 5).flatMap(k => Gen.listOfN(k, Gen.chooseNum(0.05, 1.0)))
    forAll(weightsGen) { raw =>
      whenever(raw.nonEmpty) {
        val total = raw.sum
        val splits = raw.zipWithIndex.map { case (w, i) => s"s$i" -> w / total }
        val n = 500
        val df = (0 until n).map(i => Tuple1(i.toLong)).toDF("id")
        val out = graft.operators.Sampling.assignSplit(df, "id", splits)
          .groupBy("split").count().as[(String, Long)].collect().toMap
        assert(out.values.sum == n) // every row assigned exactly once
        assert(out.keySet.subsetOf(splits.map(_._1).toSet)) // no invented splits
      }
    }
  }

  test("property: bucketized range join equals the naive inequality join") {
    case class P(n: Int, span: Long, lower: Long, width: Long)
    val gen: Gen[P] = for {
      n <- Gen.chooseNum(20, 120)
      span <- Gen.chooseNum(500L, 20000L)
      lower <- Gen.chooseNum(-200L, 200L)
      width <- Gen.chooseNum(1L, 500L)
    } yield P(n, span, lower, width)
    forAll(gen, n = 6) { p =>
      val rng = new scala.util.Random(p.n * 31 + p.span)
      val l = (0 until p.n).map(i => (i.toLong, rng.nextLong(p.span))).toDF("l_id", "l_ts")
      val r = (0 until p.n).map(i => (i.toLong, rng.nextLong(p.span))).toDF("r_id", "r_ts")
      val got = graft.operators.RangeJoin
        .timeRangeJoin(l, "l_ts", r, "r_ts", p.lower, p.lower + p.width)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      val lt = l.as[(Long, Long)].collect(); val rt = r.as[(Long, Long)].collect()
      val want = (for {
        (li, lts) <- lt; (ri, rts) <- rt
        if rts >= lts + p.lower && rts < lts + p.lower + p.width
      } yield (li, ri)).toSet
      assert(got === want, s"params $p")
    }
  }

  test("property: sessions never exceed events; infinite gap gives one session") {
    val tsGen = Gen.chooseNum(5, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 100000L)))
    forAll(tsGen) { ts =>
      whenever(ts.nonEmpty) {
        val df = ts.distinct.map(t => (1L, t)).toDF("user_id", "ts")
        val n = df.count()
        val (sessions, events) = Sessionize.stats(df, "user_id", "ts", Seq("ts"), 500L)
          .select("n_sessions", "n_events").as[(Long, Long)].head()
        assert(sessions >= 1 && sessions <= events && events === n)
        val one = Sessionize.stats(df, "user_id", "ts", Seq("ts"), Long.MaxValue)
          .select("n_sessions").as[Long].head()
        assert(one === 1L)
      }
    }
  }

  private val randomDocs: Gen[List[(Long, String)]] = {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    Gen.chooseNum(3, 25).flatMap(n =>
      Gen.listOfN(n,
        Gen.chooseNum(1, 30).flatMap(len => Gen.listOfN(len, word).map(_.mkString(" ")))))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
  }

  test("property: repetitionStats conserves token counts exactly") {
    forAll(randomDocs, n = 5) { docs =>
      whenever(docs.nonEmpty) {
        val df = docs.toDF("doc_id", "text")
        val stats = CurationFilters.repetitionStats(df, "doc_id", "text")
          .select("id", "n_tokens", "n_distinct_words", "max_word_count",
            "n_bigrams", "n_distinct_bigrams")
          .as[(Long, Long, Long, Long, Long, Long)].collect()
        val byId = docs.toMap
        stats.foreach { case (id, nt, nd, mx, nb, nbd) =>
          val toks = byId(id).split("\\s+").filter(_.nonEmpty)
          assert(nt == toks.length, s"doc $id token count")
          assert(nd == toks.distinct.length, s"doc $id distinct")
          assert(mx == toks.groupBy(identity).values.map(_.size).max, s"doc $id max")
          assert(nb == math.max(0, toks.length - 1), s"doc $id bigrams")
          assert(nbd <= nb || nb == 0, s"doc $id distinct bigrams bound")
        }
      }
    }
  }

  test("property: decontaminate is monotone in the benchmark set") {
    forAll(randomDocs, n = 5) { docs =>
      whenever(docs.size >= 4) {
        val df = docs.toDF("doc_id", "text")
        val benchSmall = df.filter($"doc_id" % 4 === 0)
        val benchBig = df.filter($"doc_id" % 2 === 0)
        def flagged(b: org.apache.spark.sql.DataFrame) =
          CurationFilters.decontaminate(
            df.filter($"doc_id" % 2 =!= 0), b, "doc_id", "text", 3)
            .as[Long].collect().toSet
        // a larger benchmark can only flag MORE corpus docs, never fewer
        assert(flagged(benchSmall).subsetOf(flagged(benchBig)))
      }
    }
  }

  test("property: packing conserves docs and tokens in every shard") {
    val sizes = Gen.chooseNum(5, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 400L)))
    forAll(sizes, n = 6) { toks =>
      whenever(toks.nonEmpty) {
        val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "n_toks")
        val packed = Packing.packSequences(df, "doc_id", "n_toks", 128L, 3)
        // every doc appears exactly once with its token count intact
        assert(packed.count() == toks.size)
        val total = packed.agg(org.apache.spark.sql.functions.sum("n_toks"))
          .as[Long].head()
        assert(total == toks.sum)
        // pack ids within a shard are contiguous from 0 in doc order except
        // skips after mega-docs; they are always non-decreasing in id order
        val perShard = packed.select("shard", "doc_id", "pack")
          .as[(Long, Long, Long)].collect().groupBy(_._1)
        perShard.values.foreach { rows =>
          val ordered = rows.sortBy(_._2).map(_._3)
          assert(ordered.zip(ordered.drop(1)).forall { case (a, b) => a <= b })
          assert(ordered.headOption.forall(_ == 0L))
        }
      }
    }
  }

  test("property: chunkTexts reconstructs every random document and conserves tokens") {
    val docsGen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 40).flatMap(len =>
        Gen.listOfN(len, Gen.alphaLowerStr.map(s => s.take(4))))))
    forAll(docsGen, n = 5) { docs =>
      val df = docs.zipWithIndex.map { case (toks, i) =>
        (i.toLong, toks.filter(_.nonEmpty).mkString(" "))
      }.toDF("doc_id", "text")
      val chunks = Packing.chunkTexts(df, "text", budget = 7)
        .select("doc_id", "chunk", "chunk_text", "chunk_tokens")
        .as[(Long, Long, String, Long)].collect()
      val byDoc = chunks.groupBy(_._1)
      docs.zipWithIndex.foreach { case (toks, i) =>
        val clean = toks.filter(_.nonEmpty)
        val mine = byDoc.getOrElse(i.toLong, Array.empty).sortBy(_._2)
        if (clean.isEmpty) assert(mine.isEmpty, s"doc $i: chunks for empty doc")
        else {
          // rebuild == single-spaced token stream; counts conserved; every
          // chunk but the last is exactly the budget
          assert(mine.map(_._3).mkString(" ") == clean.mkString(" "))
          assert(mine.map(_._4).sum == clean.size)
          assert(mine.dropRight(1).forall(_._4 == 7L))
          assert(mine.last._4 == (if (clean.size % 7 == 0) 7L else clean.size % 7))
        }
      }
    }
  }

  test("property: OHLC buffer merge is order- and split-invariant") {
    // the TypedImperativeAggregate contract: any grouping of the rows
    // into partial buffers, merged in any order, equals the single-pass
    // candle — proven here directly on the Buf algebra with random
    // splits (the Spark-level version is OhlcSpec's repartition test)
    val rowsGen = Gen.chooseNum(1, 50).flatMap(n =>
      Gen.listOfN(n, Gen.zip(
        Gen.chooseNum(0L, 1000L), Gen.chooseNum(0L, 9L),
        Gen.chooseNum(1.0, 500.0))))
    forAll(rowsGen, n = 8) { raw =>
      // ordinal tuples must be unique per the operator contract
      val rows = raw.zipWithIndex
        .map { case ((o1, _, p), i) => (o1, i.toLong, math.rint(p * 100) / 100) }
      whenever(rows.nonEmpty) {
        import graft.functions.OhlcAggExpr.Buf
        def observeAll(rs: Seq[(Long, Long, Double)]): Buf = {
          val b = new Buf()
          rs.foreach { case (o1, o2, p) => b.observe(o1, o2, p) }
          b
        }
        val single = observeAll(rows)
        val rng = new scala.util.Random(rows.length * 31 + 7)
        val shuffled = rng.shuffle(rows)
        val k = 1 + rng.nextInt(math.min(5, rows.length))
        val parts = shuffled.grouped(
          math.max(1, (rows.length + k - 1) / k)).map(observeAll).toSeq
        val merged = parts.reduce { (a, b) => a.mergeFrom(b); a }
        assert((merged.open, merged.high, merged.low, merged.close,
          merged.n) ==
          ((single.open, single.high, single.low, single.close, single.n)))
      }
    }
  }

  test("property: stripMarkup removes every tag; idempotent off entities") {
    // entity-free alphabet: unescaping is deliberately single-pass (the
    // "&amp;lt;" -> "&lt;" case is pinned non-idempotent in the unit
    // spec), so the idempotence property holds on tag/word soup only
    val fragGen: Gen[String] = {
      val word = Gen.oneOf("alpha", "beta", "gamma", "x1", "q-2")
      val tag = Gen.oneOf("<b>", "</b>", "<p class=\"z\">", "</p>",
        "<!-- c -->", "<script>v=1;</script>", "<br/>",
        "<style>p{}</style>")
      Gen.chooseNum(1, 20).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(word, tag)).map(_.mkString(" ")))
    }
    forAll(fragGen, n = 8) { html =>
      val out = Seq(Tuple1(html)).toDF("t")
        .select(
          graft.operators.TextAnalysis.stripMarkup($"t").as("once"))
        .withColumn("twice",
          graft.operators.TextAnalysis.stripMarkup($"once"))
        .withColumn("nfc1", graft.functions.NormalizeExprs.nfc($"once"))
        .withColumn("nfc2", graft.functions.NormalizeExprs.nfc($"nfc1"))
        .as[(String, String, String, String)].head()
      val (once, twice, nfc1, nfc2) = out
      assert(!once.contains("<") && !once.contains(">"), once)
      assert(twice == once, "strip not idempotent on entity-free input")
      assert(nfc1 == nfc2, "nfc not idempotent")
    }
  }

  test("property: tokenBudgetCut equals the global-window prefix for random corpora") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docsGen = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 8L), Gen.chooseNum(1L, 30L))))
    forAll(docsGen, n = 6) { raw =>
      val rows = raw.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      whenever(rows.nonEmpty) {
        val df = rows.toDF("doc_id", "qkey", "nt")
        val total = rows.map(_._3).sum
        val budget = (total * (rows.length % 3 + 1)) / 4 // 25/50/75%
        val ref = df.withColumn("cum", sum($"nt").over(
            Window.orderBy($"qkey".desc, $"doc_id")))
          .filter($"cum" <= budget).select("doc_id")
          .as[Long].collect().toSet
        val got = graft.operators.Sampling
          .tokenBudgetCut(df.repartition(3), "doc_id", "qkey", "nt", budget)
          .select("doc_id").as[Long].collect().toSet
        assert(got == ref, s"budget=$budget rows=$rows")
      }
    }
  }

  test("property: polyDigestPair equals the per-mult polyDigest folds") {
    import org.apache.spark.unsafe.types.UTF8String
    // ASCII, empty, and non-ASCII (BMP + astral) inputs: the byte fast
    // path and the UTF-16 fallback must both reproduce polyDigest exactly
    // (the SQL oracle replicates the UTF-16 fold, so any drift here breaks
    // the q24/q25 hash oracles)
    val strGen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.listOf(Gen.chooseNum(32, 126)).map(_.map(_.toChar).mkString),
      Gen.const(""),
      Gen.const("café touché"),
      Gen.const("日本語 😀 mixed ascii"),
      Gen.listOf(Gen.chooseNum(0x20, 0x2fff)).map(_.map(_.toChar).mkString))
    val out = new Array[Long](2)
    forAll(strGen, n = 40) { s =>
      val u = UTF8String.fromString(s)
      graft.functions.HashExprs.polyDigestPair(u, out)
      assert(out(0) == graft.functions.HashExprs.polyDigest(u, 257L), s"h1 for ${s.take(40)}")
      assert(out(1) == graft.functions.HashExprs.polyDigest(u, 263L), s"h2 for ${s.take(40)}")
    }
  }

  test("property: bm25Delete equals a rebuild on the surviving corpus") {
    // random corpora (including empty texts and repeated tokens) and
    // random doomed subsets: after delete, EVERY index table must match
    // what buildBm25Index would produce from the anti-joined corpus —
    // postings as a set, terms with exact df, the registry, and stats
    val word = Gen.oneOf("ax", "bx", "cx", "dx", "ex", "fx", "gx")
    val doc = Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, word))
    val gen = for {
      n <- Gen.chooseNum(2, 12)
      texts <- Gen.listOfN(n, doc)
      doomedMask <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield (texts, doomedMask)
    forAll(gen, n = 5) { case (texts, doomedMask) =>
      val docs = texts.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val doomedIds = doomedMask.zipWithIndex.collect { case (true, i) => i.toLong }
      whenever(doomedIds.nonEmpty) {
        val dir = java.nio.file.Files.createTempDirectory("prop-del").toString
        graft.operators.Retrieval.buildBm25Index(
          docs, "doc_id", "text", dir, buckets = 5)
        val nDel = graft.operators.Retrieval.bm25Delete(
          spark, dir, doomedIds.toDF("doc_id"), "doc_id")
        assert(nDel === doomedIds.size.toLong)
        val rebuilt = java.nio.file.Files.createTempDirectory("prop-del-rb").toString
        graft.operators.Retrieval.buildBm25Index(
          docs.filter(!org.apache.spark.sql.functions.col("doc_id")
            .isin(doomedIds: _*)),
          "doc_id", "text", rebuilt, buckets = 5)
        def table(root: String, name: String, cols: Seq[String]): Set[String] =
          spark.read.parquet(s"$root/$name")
            .select(cols.map(c =>
              org.apache.spark.sql.functions.col(c).cast("string")): _*)
            .collect().map(_.toString).toSet
        for ((name, cols) <- Seq(
            ("postings", Seq("id", "term", "tf", "bucket")),
            ("terms", Seq("term", "df", "bucket")),
            ("doclen", Seq("id", "dl")),
            ("stats", Seq("n_docs", "total_tokens", "buckets"))))
          assert(table(dir, name, cols) === table(rebuilt, name, cols),
            s"$name diverged from the rebuild (doomed=$doomedIds)")
      }
    }
  }

  test("property: connectedComponents labels are closed under the pair relation") {
    val edgesGen = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 40L), Gen.chooseNum(0L, 40L))))
    forAll(edgesGen, n = 5) { raw =>
      val pairs = raw.filter(p => p._1 != p._2)
      whenever(pairs.nonEmpty) {
        val df = pairs.toDF("a", "b")
        val comp = Dedup.connectedComponents(df, "a", "b")
          .as[(Long, Long)].collect().toMap
        // endpoints of every pair share a component, and each component
        // label is the min id of its member set
        pairs.foreach { case (a, b) => assert(comp(a) == comp(b)) }
        comp.groupBy(_._2).foreach { case (label, members) =>
          assert(label == members.keys.min)
        }
      }
    }
  }
}
