package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling and dataset splitting for
  * training-data pipelines.
  *
  * Everything keys off a uniform double in [0, 1) derived from md5 of a
  * stable row key — NOT Spark's `rand()`/`sample()`: the assignment is then
  * (a) reproducible across runs, cluster sizes and partitionings, (b)
  * portable across engines (the DuckDB oracles replicate it bit-for-bit),
  * and (c) stable under data re-ordering — the properties a 100 TB corpus
  * split must have, where "re-run the pipeline" must not reshuffle which
  * documents landed in the eval set.
  *
  * Scale: pure per-row projections (md5 + arithmetic, all codegen'd) — no
  * shuffle, no state; filters push down to the scan's partition columns when
  * the key is one.
  */
object Sampling {

  /** Uniform double in [0, 1): the top 32 bits of md5(salt:key), divided by
    * 2^32. Exactly replicated in SQL as
    * `CAST(concat('0x', substr(md5(concat('salt:', CAST(key AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0`.
    */
  def uniformKey(key: Column, salt: String): Column =
    uniformKeyInt(key, salt) / lit(4294967296.0)

  /** The raw integer form of [[uniformKey]] (which derives from THIS, so
    * the two can never desynchronize): uniform BIGINT in [0, 2^32) —
    * same md5 draw, no division. Ranking or bucketing on this is pure
    * integer comparison, removing even the (exact, but conceptually
    * float) dyadic-rational step from paths that don't need a [0,1)
    * semantic. SQL replication:
    * `CAST(concat('0x', substr(md5(concat('salt:', CAST(key AS VARCHAR))), 1, 8)) AS BIGINT)`.
    */
  def uniformKeyInt(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 8), 16, 10)
      .cast("bigint")

  /** Adds a `split` column assigning each row to one of the named fractions
    * (e.g. Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)) by cumulative
    * threshold over the uniform key. Fractions must sum to 1 (±1e-9); the
    * last split takes the remainder so no row is unassigned.
    *
    * NULL keys land in the LAST split (a null uniform key nulls every
    * `u < cum` test, falling through to the otherwise branch) — the same
    * answer a SQL CASE gives, which keeps the DuckDB oracle bit-compatible.
    * Spec-pinned; pre-filter nulls if the key can be null and the tail
    * split is an eval set you care about.
    */
  def assignSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val u = uniformKey(col(keyCol), salt)
    val cumulative = splits.init.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.init.zip(cumulative).foldRight(
      lit(splits.last._1): Column) { case (((name, _), cum), rest) =>
      when(u < cum, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Leakage-safe train/val/test split: near-duplicate documents must
    * never straddle a split boundary (a test document with a train-set
    * near-copy is contamination measured as generalization), so the split
    * key is the near-dup CLUSTER, not the document — every member of a
    * connected component of `pairs` draws the SAME uniform key (from the
    * component's min-id label via Dedup.connectedComponents); singletons
    * fall back to their own id, which IS their component label, so the
    * assignment is one uniform rule over coalesce(component, id).
    *
    * Scale: one id-equi-join against the component frame (pair-graph
    * nodes only — near-dup members, a small fraction of the corpus) on
    * top of connectedComponents' own documented hybrid path; the
    * assignment itself stays the pure per-row md5 projection of
    * [[assignSplit]].
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      splits: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .select(col("id").as("__lsid"), col("component").as("__comp"))
    // Guard the id cast: a null or non-numeric id would otherwise yield a
    // null split key and route the row nondeterministically (same
    // fail-fast contract as editDistancePairs).
    val idCast = col(idCol).try_cast("long")
    val keyed = df
      .withColumn("__lskey",
        when(idCast.isNull,
          raise_error(lit(s"leakageSafeSplit: null or non-numeric $idCol row")))
          .otherwise(idCast))
      .join(comp, col("__lskey") === col("__lsid"), "left")
      .withColumn("__splitkey", coalesce(col("__comp"), col("__lskey")))
      .drop("__lsid", "__comp", "__lskey")
    assignSplit(keyed, "__splitkey", splits, salt).drop("__splitkey")
  }

  /** Deterministic weighted mixture of corpora: each source is thinned to
    * its rate (in [0, 1]) by an independently-salted uniform key, then
    * union'd by name — the "mix web at 60%, books at 90%, code at 100%"
    * step of a training-data pipeline, reproducible row-for-row across
    * runs. Sources must share a schema (unionByName). Rates are per-source
    * keep-probabilities; to hit target mixture PROPORTIONS, derive rates
    * from the source sizes first (rate_i = target_i * N_total / n_i).
    */
  def mixture(
      sources: Seq[(DataFrame, Double)],
      keyCol: String,
      salt: String = "mix"): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    require(sources.forall { case (_, r) => r >= 0 && r <= 1 },
      "rates must be in [0, 1]")
    sources.zipWithIndex.map { case ((df, rate), i) =>
      df.filter(uniformKey(col(keyCol), s"$salt:$i") < rate)
    }.reduce(_.unionByName(_))
  }

  /** Keeps a deterministic per-stratum fraction of rows: row survives iff
    * uniformKey < fractions(stratum). Strata absent from the map fall back
    * to `defaultFraction`. The scaled analogue of DataFrameStatFunctions
    * .sampleBy, minus the RNG nondeterminism.
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      salt: String = "strat"): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val u = uniformKey(col(keyCol), salt)
    val frac = fractions.foldRight(lit(defaultFraction): Column) {
      case ((stratum, f), rest) =>
        when(col(strataCol) === stratum, f).otherwise(rest)
    }
    df.filter(u < frac)
  }

  /** Keeps the best keepNum/keepDen fraction of each group under the total
    * order (scoreCol desc, tieCol asc) — the "keep the top 75% of documents
    * by quality within each language" curation stage. The cut is exact
    * integer cross-multiplication (`rank * keepDen <= n * keepNum`): no
    * float threshold, so the kept set is bit-identical in any engine that
    * agrees on the ordering (pair with an integer score such as
    * TextAnalysis.qualityKeyInt for full portability).
    *
    * Plan: one exchange on the group key feeding two window functions
    * (row_number over (group, score, tie); count over group). Exact and
    * right up to very large groups; when a single group is a whole
    * language slice of a 100 TB corpus, the full in-group sort is the
    * bottleneck — switch to [[approxThresholdCut]], which never sorts or
    * shuffles the data rows.
    */
  def topFractionPerGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      tieCol: String,
      keepNum: Int,
      keepDen: Int): DataFrame = {
    require(keepDen > 0 && keepNum >= 0 && keepNum <= keepDen,
      s"keep fraction must be in [0,1]: $keepNum/$keepDen")
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(col(groupCol))
    val ordered = byGroup.orderBy(col(scoreCol).desc, col(tieCol))
    // row_number is IntegerType: the multiply must widen to long FIRST or
    // a group past Int.MaxValue/keepDen rows (one language of a 100 TB
    // corpus) overflows — ANSI aborts, legacy mode silently keeps rows
    df.withColumn("__rk", row_number().over(ordered).cast("long"))
      .withColumn("__n", count(lit(1)).over(byGroup))
      .filter(col("__rk") * keepDen <= col("__n") * keepNum)
      .drop("__rk", "__n")
  }

  /** Deterministic exactly-k-per-group sample: rank rows within each
    * group by the engine-independent uniform key (ties broken by the key
    * itself) and keep the first k — "pick exactly 100 eval documents per
    * language, reproducibly". Unlike a fraction-based thin, the output
    * size is exact; unlike orderBy(rand()) it is stable across runs,
    * partitionings and engines (the uniform key is an integer/2^32 dyadic
    * rational — bit-exact in any IEEE engine, so the oracle can replicate
    * the ranking). One exchange on the group key; groups larger than
    * executor memory sort externally, and when even that is too hot, thin
    * FIRST with [[stratifiedSample]] at ~2k/n then rank the survivors —
    * the composition is deterministic end-to-end.
    */
  def sampleExactKPerGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      k: Int,
      salt: String = "exactk"): DataFrame =
    // the random-key special case of the general per-group cap: rank by
    // the engine-portable uniform key instead of a quality order
    capPerGroup(df, Seq(groupCol),
      Seq(uniformKey(col(keyCol), salt), col(keyCol)), k)

  /** Per-group cap — "at most `cap` documents per domain, best first":
    * rank within each group by `orderCols` and keep the first `cap`. The
    * domain-balancing stage of a training-data pipeline (a crawl's hot
    * hosts would otherwise dominate the mixture). Differs from
    * [[sampleExactKPerGroup]] (random-key ranking, for eval sampling) in
    * ranking by QUALITY, and from [[topFractionPerGroup]] in cutting at
    * an absolute count rather than a fraction of the group.
    *
    * Plan/scale: a row_number<=k filter plans with WindowGroupLimit
    * (partial + final): each map partition keeps at most `cap` rows per
    * group BEFORE the exchange, so a hot domain ships `cap` rows per
    * input partition instead of its whole slice — the property that
    * makes an absolute cap safe on a 100 TB crawl (pinned in
    * PlanShapeSpec). `orderCols` must be a total order (include a unique
    * tiebreaker) or the kept set is nondeterministic.
    */
  def capPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      cap: Int): DataFrame = {
    require(cap >= 0, s"cap must be >= 0, got $cap")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** The 100 TB form of [[topFractionPerGroup]]: per-group score threshold
    * from `percentile_approx` (partial-aggregated sketches — only sketches
    * cross the exchange), broadcast back, rows kept by a map-side filter.
    * The data rows are never sorted and never shuffled. Approximate at the
    * cut boundary only (documents far from the threshold are classified
    * identically; `accuracy` trades sketch size for boundary precision,
    * and at accuracy >= group size the sketch — hence the cut — is exact,
    * which is what the agreement spec pins).
    */
  def approxThresholdCut(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      keepFrac: Double,
      accuracy: Int = 10000): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, s"keepFrac must be in (0,1]: $keepFrac")
    val thresholds = df.groupBy(col(groupCol))
      .agg(percentile_approx(
        col(scoreCol), lit(1.0 - keepFrac), lit(accuracy)).as("__thr"))
    df.join(broadcast(thresholds), Seq(groupCol))
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }

  /** Token-budget corpus cut: keep the best documents (by an INTEGER
    * quality key, ties by id) until the token budget is exhausted — "give
    * me the top B tokens of this corpus", the final sizing step before a
    * training run. A row is kept iff its inclusive running token total in
    * (key desc, id asc) order is <= budget, i.e. the maximal prefix of
    * the quality ordering that fits.
    *
    * Scale: this is deliberately NOT one global running-sum window (a
    * total order through a single partition). Phase 1 aggregates tokens
    * per quality key (the per-key frame is bounded by the key range —
    * ~1001 rows for qualityKeyInt — so ITS prefix window is a no-op to
    * sort) and broadcasts back each key's tokens-before-this-key. Phase
    * 2: keys that fit entirely keep map-side with no ranking; only the
    * ONE key straddling the budget line ranks its own rows (a window
    * partitioned by key — never global). So the data-row cost is one
    * broadcast-join + filter, plus an in-key sort for the straddling
    * key only. All arithmetic is integer-exact.
    */
  def tokenBudgetCut(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      tokenCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    // fail fast on null keys/tokens (the packSequences contract): the
    // broadcast equi-join below would otherwise silently DROP null-key
    // rows — a data loss, not an ordering choice
    val checked = df.withColumn(keyCol,
      when(col(keyCol).isNull || col(tokenCol).isNull,
        raise_error(lit(s"tokenBudgetCut: null $keyCol/$tokenCol row")))
        .otherwise(col(keyCol)))
    // per-key totals; the desc-prefix window runs over this bounded frame
    val wKeys = Window.orderBy(col(keyCol).desc)
    val pref = checked.groupBy(col(keyCol))
      .agg(sum(col(tokenCol)).as("__kt"))
      .withColumn("__before",
        coalesce(sum(col("__kt")).over(wKeys) - col("__kt"), lit(0L)))
    val tagged = checked.join(broadcast(pref), Seq(keyCol))
    val fullKeep = tagged.filter(col("__before") + col("__kt") <= budget)
    val wIn = Window.partitionBy(col(keyCol)).orderBy(col(idCol))
    val straddle = tagged
      .filter(col("__before") < budget &&
        col("__before") + col("__kt") > budget)
      .withColumn("__in", sum(col(tokenCol)).over(wIn))
      .filter(col("__before") + col("__in") <= budget)
      .drop("__in")
    fullKeep.unionByName(straddle).drop("__kt", "__before")
  }

  /** Per-group token-budget mixing — the executor of a data-mixing
    * recipe: each group (domain/source/language) gets its own token
    * quota, filled by that group's best documents first. Within a group
    * the keep rule is [[tokenBudgetCut]]'s exactly — whole quality keys
    * (desc) while the prefix fits, then the straddling key's
    * ascending-id row prefix — which collapses to the per-row rule
    * `sum(tokens) over (partition by group order by key desc, id) <=
    * budget`, so a SQL oracle replicates the cut with one window.
    * Groups absent from the recipe are dropped (a mixture lists its
    * domains); a zero budget keeps nothing for that group.
    *
    * Scale: same two-phase shape as [[tokenBudgetCut]], with every
    * window gaining the group as a partition prefix — per-(group, key)
    * totals aggregate map-side and broadcast back, whole keys keep with
    * a map-side filter, and only each group's ONE straddling key ranks
    * its rows. The recipe itself broadcasts (a mixture table is tiny by
    * construction). Groups parallelize; no global sort anywhere.
    */
  def tokenBudgetPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      keyCol: String,
      tokenCol: String,
      budgets: Seq[(String, Long)]): DataFrame = {
    require(budgets.nonEmpty, "budgets must list at least one group")
    require(budgets.forall(_._2 >= 0), s"budgets must be >= 0: $budgets")
    require(budgets.map(_._1).distinct.size == budgets.size,
      s"duplicate group in budgets: $budgets")
    import org.apache.spark.sql.expressions.Window
    val checked = df.withColumn(keyCol,
      when(col(groupCol).isNull || col(keyCol).isNull || col(tokenCol).isNull,
        raise_error(lit(s"tokenBudgetPerGroup: null $groupCol/$keyCol/$tokenCol row")))
        .otherwise(col(keyCol)))
    val bdf = df.sparkSession.createDataFrame(budgets)
      .toDF(groupCol, "__budget")
    val scoped = checked.join(broadcast(bdf), Seq(groupCol))
    val wKeys = Window.partitionBy(col(groupCol)).orderBy(col(keyCol).desc)
    val pref = scoped.groupBy(col(groupCol), col(keyCol))
      .agg(sum(col(tokenCol)).as("__kt"))
      .withColumn("__before",
        coalesce(sum(col("__kt")).over(wKeys) - col("__kt"), lit(0L)))
    val tagged = scoped.join(broadcast(pref), Seq(groupCol, keyCol))
    val fullKeep = tagged.filter(col("__before") + col("__kt") <= col("__budget"))
    val wIn = Window.partitionBy(col(groupCol), col(keyCol)).orderBy(col(idCol))
    val straddle = tagged
      .filter(col("__before") < col("__budget") &&
        col("__before") + col("__kt") > col("__budget"))
      .withColumn("__in", sum(col(tokenCol)).over(wIn))
      .filter(col("__before") + col("__in") <= col("__budget"))
      .drop("__in")
    fullKeep.unionByName(straddle).drop("__kt", "__before", "__budget")
  }

  /** Multi-epoch mixture replication — the "web × 1, books × 3, code
    * × 2" recipe step: each group's documents are replicated its whole
    * number of epochs, tagged with an `epoch` column (0-based) so
    * downstream shuffling/packing can interleave epochs rather than
    * concatenate them. Groups absent from the recipe drop; a zero
    * epoch count keeps nothing. Integer counts only — fractional
    * "epochs" belong to [[temperatureResample]]/[[mixture]], which
    * thin rather than replicate.
    *
    * Scale: one broadcast join + a map-side explode of a ≤max(epochs)
    * sequence — no shuffle at all; output volume is the recipe's
    * weighted sum by construction.
    */
  def epochReplicate(
      df: DataFrame, groupCol: String,
      epochs: Seq[(String, Int)]): DataFrame = {
    require(epochs.nonEmpty, "epochs must list at least one group")
    require(epochs.forall(_._2 >= 0), s"epoch counts must be >= 0: $epochs")
    require(epochs.map(_._1).distinct.size == epochs.size,
      s"duplicate group in epochs: $epochs")
    val edf = df.sparkSession.createDataFrame(epochs)
      .toDF(groupCol, "__epochs")
    df.join(broadcast(edf), Seq(groupCol))
      .filter(col("__epochs") > 0) // sequence(0, -1) would count DOWN
      .withColumn("epoch",
        explode(sequence(lit(0), col("__epochs") - 1)))
      .drop("__epochs")
  }

  /** Deterministic global corpus shuffle — the "randomize example order
    * before training" step, as (shard, pos) coordinates: shard =
    * u32 * numShards div 2^32 (an exact integer range split of the
    * uniform key — NOT u32 % numShards, so shard is a prefix of the same
    * order pos extends), pos = dense 0-based rank within the shard by
    * (u32, key). Reading shards in order, each sorted by pos, visits the
    * corpus in a uniform pseudorandom permutation that is reproducible
    * across runs, engines and partitionings — which is what makes
    * training runs repeatable and resumable at a byte offset.
    *
    * Scale: this is deliberately NOT a single global row_number (a total
    * order through one partition). The only exchange is the hash
    * repartition on shard; each shard ranks independently (external sort
    * within executor), so parallelism = numShards. Shard sizes are
    * binomial around N/numShards — pick numShards >> executors at 100 TB
    * and skew is noise. All arithmetic is integer (u32 < 2^32 and
    * numShards <= 2^20 keep the product under 2^52).
    */
  def deterministicShuffle(
      df: DataFrame,
      keyCol: String,
      numShards: Int,
      salt: String = "shuffle"): DataFrame = {
    require(numShards > 0 && numShards <= (1 << 20),
      s"numShards must be in [1, 2^20], got $numShards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("__u"), col(keyCol))
    df.withColumn("__u", uniformKeyInt(col(keyCol), salt))
      .withColumn("shard",
        call_function("div", col("__u") * numShards, lit(4294967296L)))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .drop("__u")
  }

  /** Temperature-weighted mixture targets (alpha = 0.5): per-group sample
    * counts k_g = totalTarget * w_g div sum(w), w_g = floor(sqrt(n_g)),
    * capped at n_g. Sampling proportional to n^alpha (the multilingual /
    * multi-domain re-balancing rule from the published LM data recipes)
    * upweights small groups relative to proportional sampling without
    * letting any one group dominate. Integer end-to-end after the sqrt:
    * floor(sqrt(n)) on an IEEE double is exact for n < 2^52 up to the
    * correctly-rounded-sqrt boundary (documented; group counts beyond
    * ~2^26 could land one off — harmless for a target count), and the
    * final division is integral — so a SQL oracle reproduces every target
    * bit-for-bit.
    *
    * Plan: one count aggregation, then a single-partition window over the
    * GROUP-COUNT frame only (one row per group — never the data rows) for
    * the weight total.
    */
  def temperatureTargets(
      df: DataFrame, groupCol: String, totalTarget: Long): DataFrame = {
    require(totalTarget > 0, s"totalTarget must be > 0, got $totalTarget")
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .withColumn("weight", floor(sqrt(col("n").cast("double"))).cast("long"))
      .withColumn("target_n",
        least(col("n"), call_function("div",
          lit(totalTarget) * col("weight"),
          sum(col("weight")).over(Window.partitionBy()))))
  }

  /** Exact weighted sampling WITHOUT replacement for integer weights —
    * Efraimidis–Spirakis A-ES made engine-exact: A-ES ranks rows by
    * u^(1/w) (float pow — the one step two engines can disagree on in
    * the last ulp, which flips a rank). But u^(1/w) is distributed as
    * the MAX of w independent uniforms, so for integer w the key can be
    * drawn literally: key_i = max over j in [1, w_i] of u32(salt:key:j),
    * all integer arithmetic, bit-identical in any engine. Top-k by
    * (key desc, id) is then a faithful weighted sample without
    * replacement: P(row i first) = w_i / sum(w).
    *
    * Cost: explodes w rows per input row before the max-aggregation
    * (map-side combined). Right for the common curation case (small
    * integer weights: upsample factors, dup counts, quality tiers);
    * for large or fractional weights, quantize — or accept the float
    * A-ES, losing oracle-exactness but not correctness. Top-k plans as
    * TakeOrderedAndProject.
    */
  def weightedSampleK(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int,
      maxWeight: Long = 1024L,
      salt: String = "wsample"): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    require(maxWeight >= 1, s"maxWeight must be >= 1, got $maxWeight")
    val checked = df.withColumn(weightCol,
      when(col(weightCol).isNull || col(weightCol) < 1 ||
        col(weightCol) > maxWeight,
        raise_error(lit(s"weightedSampleK: $weightCol outside [1, $maxWeight]")))
        .otherwise(col(weightCol)))
    // draws reduce to (id, max-draw) BEFORE anything joins back, so the
    // exchanges carry two longs per row, never the payload columns.
    // keyCol must uniquely identify rows (it keys the draws).
    val keys = checked
      .select(col(keyCol), explode(sequence(lit(1L), col(weightCol))).as("__j"))
      .select(col(keyCol), uniformKeyInt(
        concat(col(keyCol).cast("string"), lit(":"), col("__j")), salt)
        .as("__draw"))
      .groupBy(col(keyCol))
      .agg(max(col("__draw")).as("__key"))
    df.join(keys, Seq(keyCol))
      .orderBy(col("__key").desc, col(keyCol))
      .limit(k)
      .drop("__key")
  }

  /** Draws the [[temperatureTargets]] mixture deterministically: exactly
    * target_n rows per group, ranked by the integer uniform key (ties by
    * the key column). The variable-k generalization of
    * [[sampleExactKPerGroup]]; the targets frame is group-cardinality
    * sized and broadcast. One exchange on the group key.
    */
  def temperatureResample(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      totalTarget: Long,
      salt: String = "temp"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val targets = temperatureTargets(df, groupCol, totalTarget)
      .select(col(groupCol), col("target_n"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(uniformKeyInt(col(keyCol), salt), col(keyCol))
    df.join(broadcast(targets), Seq(groupCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("target_n"))
      .drop("__rk", "target_n")
  }
}
