package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PolyHash64

/** Deterministic sampling for training-data mixing: per-stratum rates
  * decided by a content hash of the row key, not an RNG. The hash makes
  * the sample a pure function of the data — identical across runs,
  * executors, partitionings, and stage retries (the SPARK-23207 class
  * of resample-on-retry bugs cannot happen), and it is reproducible in
  * the DuckDB oracle through the same portable PolyHash64.
  */
object Sampling {

  val Buckets = 10000

  /** Keep a row iff hash(key) mod 10000 falls under its stratum's
    * fraction. Map-side only — at scale this is a free filter pushed
    * against the scan, never a shuffle. */
  def stratifiedSample(df: DataFrame, strataCol: String, key: Column,
                       fractions: Map[String, Double],
                       defaultFraction: Double): DataFrame = {
    val bucket = PolyHash64.polyHash64(key) % Buckets
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(
      lit((defaultFraction * Buckets).toInt)) { case (acc, (s, f)) =>
        when(col(strataCol) === s, lit((f * Buckets).toInt)).otherwise(acc)
    }
    df.where(bucket < threshold)
  }

  /** DuckDB twin of the bucket predicate for stratum column `strata`
    * and key expression `keySql`. */
  def stratifiedSampleSql(strata: String, keySql: String,
                          fractions: Map[String, Double],
                          defaultFraction: Double): String = {
    val cases = fractions.toSeq.sortBy(_._1).map { case (s, f) =>
      s"WHEN $strata = '$s' THEN ${(f * Buckets).toInt}"
    }.mkString(" ")
    s"(${PolyHash64.sql(keySql)}) % $Buckets < " +
      s"(CASE $cases ELSE ${(defaultFraction * Buckets).toInt} END)"
  }

  /** Importance sampling: keep each row with probability equal to its
    * OWN (clamped to [0,1]) weight — per-document quality-weighted
    * corpus selection, the DSIR-style refinement of per-stratum rates:
    * the weight can come from any scoring pipeline (quality model,
    * perplexity, dedup score). Same hash-decision machinery as
    * [[stratifiedSample]], so it is deterministic, retry-stable,
    * map-side only, and exactly reproducible in the oracle. */
  def importanceSample(df: DataFrame, weight: Column, key: Column): DataFrame =
    df.where(PolyHash64.polyHash64(key) % Buckets <
      least(greatest(weight.cast("double"), lit(0.0)), lit(1.0)) * Buckets)

  /** DuckDB twin of the [[importanceSample]] keep-predicate. */
  def importanceSampleSql(weightSql: String, keySql: String): String =
    s"(${PolyHash64.sql(keySql)}) % $Buckets < " +
      s"least(greatest(CAST($weightSql AS DOUBLE), 0.0), 1.0) * $Buckets"

  // ------------------------------------- temperature source rebalancing

  /** Integer bucket cutoffs for √-temperature source rebalancing (the
    * multilingual `n_i^α` mix at α = 0.5): source i is kept at a rate
    * ∝ sqrt(n_i)/n_i, normalized so the expected total is
    * total/targetDenom rows — dominant sources are downsampled hardest,
    * tail sources kept (rate clamps at 1). Rates are DERIVED FROM THE
    * DATA by one tiny aggregate (|sources| rows collected) and applied
    * as a map-side hash predicate — the two-phase shape that holds at
    * 100 TB.
    *
    * All cutoff arithmetic is INTEGER on purpose: IEEE sqrt is
    * correctly rounded, so floor(sqrt(n)) is engine-portable for
    * n < 2^52, and everything after is exact integer math — the cutoff
    * products run in driver-side BigInt (they are |sources| tiny
    * multiplications; T·s_i·Buckets would wrap a Long at ~2.4e10 rows
    * with targetDenom=4), mirroring DuckDB's HUGEINT, so the oracle
    * reproduces every cutoff bit-exactly at ANY corpus size with no
    * cross-engine pow() last-ulp hazard. */
  def sqrtTemperatureCutoffs(df: DataFrame, strataCol: String,
                             targetDenom: Long): Map[String, Long] = {
    require(targetDenom >= 1, s"targetDenom must be >= 1, got $targetDenom")
    require(df.schema(strataCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"strata column '$strataCol' must be a string (cutoff lookup and " +
        "the SQL twin both compare string keys) — cast it first")
    // null strata are excluded from the derivation and dropped by the
    // filter (the fold's default cutoff is 0) — same posture as a null
    // group key anywhere else in the curation pipeline
    val counts = df.where(col(strataCol).isNotNull)
      .groupBy(col(strataCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val isqrt = counts.map { case (s, n) => s -> math.sqrt(n.toDouble).toLong }.toMap
    val bigN = counts.map(_._2).sum
    val bigS = isqrt.values.sum
    val t = BigInt(bigN / targetDenom)
    counts.map { case (s, n) =>
      s -> (t * isqrt(s) * Buckets / (BigInt(bigS) * n))
        .min(BigInt(Buckets)).toLong
    }.toMap
  }

  /** Keep-filter applying [[sqrtTemperatureCutoffs]]: the same
    * deterministic content-hash decision as [[stratifiedSample]], with
    * the fractions computed from the observed source distribution
    * instead of caller-supplied constants.
    *
    * The strata column is assumed LOW-cardinality (data sources,
    * languages, domains — tens, not thousands): the per-source counts
    * collect to the driver and the cutoff lookup inlines as a
    * when/otherwise chain, a pure map-side filter with zero joins. Past
    * `maxExprCutoffs` distinct strata the chain form stops being the
    * right plan (expression-tree depth, codegen's 64 KB method limit),
    * so the lookup switches to a broadcast hash join of the cutoff map
    * — still no shuffle of `df`, one broadcast of a |strata|-row table.
    * Row semantics are identical either way: a null stratum never
    * matches the chain (default cutoff 0) and never matches the join. */
  def temperatureMix(df: DataFrame, strataCol: String, key: Column,
                     targetDenom: Long, maxExprCutoffs: Int = 64): DataFrame = {
    val cutoffs = sqrtTemperatureCutoffs(df, strataCol, targetDenom)
    if (cutoffs.size <= maxExprCutoffs) {
      val cutoff = cutoffs.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
        case (acc, (s, c)) => when(col(strataCol) === s, lit(c)).otherwise(acc)
      }
      df.where(PolyHash64.polyHash64(key) % Buckets < cutoff)
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val cdf = cutoffs.toSeq.sortBy(_._1).toDF(strataCol, "_tm_cutoff")
      df.join(broadcast(cdf), Seq(strataCol))
        .where(PolyHash64.polyHash64(key) % Buckets < col("_tm_cutoff"))
        // restore the caller's column ORDER (the USING join moves the
        // strata column to position 0) so the two lookup paths are
        // schema-identical, not just row-identical — a positional
        // consumer must not break the day the corpus crosses the
        // cardinality threshold
        .select(df.columns.map(col).toSeq: _*)
    }
  }

  /** DuckDB twin of the whole derivation: CTEs computing the identical
    * integer cutoffs from the same table, usable as
    * `WITH $sql SELECT ... FROM documents d JOIN _tm_rates r ...`. */
  def temperatureMixRatesSql(table: String, strata: String,
                             targetDenom: Long): String =
    s"""_tm_counts AS (
       |  SELECT $strata AS _tm_s, COUNT(*) AS n FROM $table
       |  WHERE $strata IS NOT NULL GROUP BY 1),
       |_tm_sqrts AS (
       |  SELECT _tm_s, n, CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS s
       |  FROM _tm_counts),
       |_tm_tot AS (SELECT SUM(n) AS big_n, SUM(s) AS big_s FROM _tm_sqrts),
       |_tm_rates AS (
       |  SELECT _tm_s, LEAST($Buckets,
       |           ((t.big_n // $targetDenom) * q.s * $Buckets) // (t.big_s * q.n))
       |         AS cutoff
       |  FROM _tm_sqrts q, _tm_tot t)""".stripMargin

  // --------------------------------------------- epoch-weighted mixing

  private def baseOf(w: Double): Int = math.floor(w).toInt
  private def fracOf(w: Double): Int = math.round((w - math.floor(w)) * Buckets).toInt

  /** Epoch-weighted mixture replication: each row is emitted
    * floor(weight) times, plus one extra copy iff hash(key) mod 10000
    * falls under the fractional part — the deterministic version of
    * "repeat the high-quality source 2.3×, downsample the noisy one to
    * 0.4×" that training-data mixing needs. Weight < 1 keeps only the
    * fractional-copy chance; hash-derived, so the decision is a pure
    * function of the data (stable across runs, retries, partitionings).
    *
    * Map-side only (a per-row explode over ≤ ceil(weight) copies — no
    * shuffle), with an `epoch_copy` index column distinguishing the
    * replicas downstream. */
  def epochMix(df: DataFrame, strataCol: String, key: Column,
               weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    def perStratum(f: Double => Int) =
      weights.toSeq.sortBy(_._1).foldLeft(lit(f(defaultWeight))) {
        case (acc, (s, w)) => when(col(strataCol) === s, lit(f(w))).otherwise(acc)
      }
    val copies = perStratum(baseOf) +
      when(PolyHash64.polyHash64(key) % Buckets < perStratum(fracOf), 1).otherwise(0)
    // copies = 0 → empty array → explode drops the row (the downsample
    // path); sequence is never called with an inverted (1, 0) range
    df.withColumn("epoch_copy", explode(
      when(copies >= 1, sequence(lit(1), copies))
        .otherwise(array().cast("array<int>"))))
  }

  // ------------------------------------------- leakage-safe splits

  /** Leakage-safe train/val/test assignment: every near-duplicate
    * CLUSTER lands in one split, so no held-out example has a near-dup
    * in train (the contamination [[Quality.splitLeakage]] audits —
    * this is the operator that PRODUCES splits passing that audit).
    *
    * `items` is the id universe (one column `id`); `pairs` the
    * near-dup graph (`id1`,`id2`, e.g. LSH candidates post-verify).
    * Clusters come from [[Dedup.connectedComponents]]; unpaired items
    * are their own singleton component. The split is a pure function
    * of the component id via the portable PolyHash64 (stable across
    * runs/retries/engines, reproducible in the DuckDB oracle), bucketed
    * mod 100 against `cuts` — ascending (name, upperBound) thresholds,
    * last bound must be 100, e.g. ("train",80),("val",90),("test",100).
    *
    * Scale posture (100 TB): components over the pair graph (pairs are
    * Θ(true dups), never all-pairs), then ONE left join items⋈labels on
    * id — both sides shuffle on id once; the label side is |paired
    * docs| ≪ corpus. The hash-bucket assignment itself is map-side. */
  def componentSplits(items: DataFrame, pairs: DataFrame,
                      cuts: Seq[(String, Int)] = Seq(
                        "train" -> 80, "val" -> 90, "test" -> 100),
                      assumeDistinctPairs: Boolean = false): DataFrame = {
    // validate BEFORE the components fixpoint: connectedComponents is
    // eager (checkpointed rounds), so a bad `cuts` must fail here, not
    // after hours of label propagation over the pair graph
    validateCuts(cuts)
    componentSplitsFromComponents(items,
      Dedup.connectedComponents(pairs.select(col("id1"), col("id2")),
        assumeDistinctPairs = assumeDistinctPairs), cuts)
  }

  private def validateCuts(cuts: Seq[(String, Int)]): Unit =
    require(cuts.nonEmpty && cuts.last._2 == 100 && cuts.head._2 > 0 &&
      cuts.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      "cuts must be STRICTLY ascending upper bounds in (0, 100] ending " +
        s"at 100 (a bound <= 0 or a tie makes a split unreachable), got $cuts")

  /** [[componentSplits]] over ALREADY-COMPUTED component labels
    * (`id`, `comp`) — for pipelines that ran
    * [[Dedup.connectedComponents]] for other reasons (survivor picks,
    * rollups) and must not pay the fixpoint twice. Items absent from
    * `comps` are their own singleton component. */
  def componentSplitsFromComponents(items: DataFrame, comps: DataFrame,
                                    cuts: Seq[(String, Int)] = Seq(
                                      "train" -> 80, "val" -> 90, "test" -> 100)): DataFrame = {
    validateCuts(cuts)
    val labeled = items.select(col("id"))
      .join(comps, Seq("id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("id")))
    val bucket = pmod(PolyHash64.polyHash64(col("comp").cast("string")), lit(100))
    val split = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, cut), e) => when(bucket < cut, name).otherwise(e)
    }
    labeled.withColumn("split", split)
  }

  /** DuckDB twin of [[componentSplits]]'s bucket→split expression;
    * the caller supplies the component column SQL (cast to VARCHAR to
    * match Spark's string-of-bigint hash input). The rolling hash is
    * hoisted into a correlated derived table so it is computed ONCE
    * per row, not once per CASE branch; split names are quote-escaped
    * so the twin accepts exactly the names the Spark side does. */
  def componentSplitSql(compSql: String,
                        cuts: Seq[(String, Int)] = Seq(
                          "train" -> 80, "val" -> 90, "test" -> 100)): String = {
    def esc(n: String) = n.replace("'", "''")
    val whens = cuts.init.map { case (n, c) =>
      s"WHEN _b.b < $c THEN '${esc(n)}'" }.mkString(" ")
    val hash = PolyHash64.sql(s"CAST($compSql AS VARCHAR)")
    s"(SELECT CASE $whens ELSE '${esc(cuts.last._1)}' END " +
      s"FROM (SELECT ($hash) % 100 AS b) _b)"
  }

  // ------------------------------------------- per-group hard caps

  /** Per-group hard cap (the RefinedWeb-style per-domain quota): keep
    * at most `cap` rows per value of `groupCol`, the kept subset
    * chosen deterministically as the `cap` smallest
    * (PolyHash64(key), id) pairs — a pure function of the data, stable
    * across runs, retries, partitionings, and engines (the DuckDB twin
    * [[groupCapSql]] replays it). Groups at or under the cap pass
    * through whole. Complements the rate-based operators
    * ([[stratifiedSample]] keeps a FRACTION per stratum;
    * [[temperatureMix]] derives the fractions) with the absolute
    * ceiling a boilerplate-heavy domain needs regardless of its share.
    *
    * Scale posture (100 TB): the selection is a grouped bottom-k via
    * the bounded-heap [[Ranking.TopKLongPairs]] aggregate, NOT a
    * `row_number() OVER (PARTITION BY group)` window — the window form
    * shuffles and SORTS every row of every group, while the heap keeps
    * `cap` pairs per buffer and rides map-side partial aggregation
    * (a25's measured 2.26x at 40M rows). The kept-id side is at most
    * `cap` rows per group — a small fraction of the input, but NOT
    * forcibly broadcast: with millions of domains the kept set can
    * exceed broadcast size, so the join back is left to AQE, which
    * broadcasts it when it fits and shuffles on the id when not.
    *
    * `idCol` must be a unique Long row key (hash ties break by id, so
    * duplicate ids would make the boundary pick ambiguous) — which is
    * also why the semi join back is on the id ALONE: a composite
    * (group, id) key would drop every NULL-group row to null-unsafe
    * equality. A NULL group is capped as its own group (exactly the
    * twin's `PARTITION BY`), and a NULL `key` orders AFTER every real
    * hash (the twin's default NULLS LAST), ties broken by id. */
  def groupCap(df: DataFrame, groupCol: String, idCol: String, key: Column,
               cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val topk = udaf(new Ranking.TopKLongPairs(cap))
    // TopKLongPairs keeps the k LARGEST keys; negating the hash keeps
    // the k smallest — (hash ASC, id ASC), the documented order. A
    // NULL key (e.g. a concat through a NULL group) becomes
    // Long.MaxValue BEFORE negation — outside PolyHash64's [0, p)
    // range, so it sorts strictly after every real hash, never ties
    // one, and keeps the udaf's non-nullable Long input satisfied.
    val kept = df
      .select(col(groupCol).as("_g"),
        (-coalesce(PolyHash64.polyHash64(key), lit(Long.MaxValue))).as("_k"),
        col(idCol).as("_id"))
      .groupBy(col("_g"))
      .agg(topk(col("_k"), col("_id")).as("_top"))
      .select(explode(col("_top")).as("_p"))
      .select(col("_p._2").as(idCol))
    // the Seq-key join hoists the key column first — restore the
    // caller's column order
    df.join(kept, Seq(idCol), "left_semi").select(df.columns.map(col): _*)
  }

  /** DuckDB twin of [[groupCap]]'s selection as a QUALIFY fragment to
    * append to a SELECT over the same rows. */
  def groupCapSql(group: String, idCol: String, keySql: String,
                  cap: Int): String =
    // NULLS LAST spelled out: the Spark side pins NULL keys strictly
    // after every real hash, and DuckDB's default_null_order is a
    // session setting — don't depend on it
    s"QUALIFY ROW_NUMBER() OVER (PARTITION BY $group " +
      s"ORDER BY (${PolyHash64.sql(keySql)}) NULLS LAST, $idCol) <= $cap"

  /** DuckDB twin of the per-row copy count [[epochMix]] materializes. */
  def epochMixCopiesSql(strata: String, keySql: String,
                        weights: Map[String, Double],
                        defaultWeight: Double): String = {
    def cases(f: Double => Int) = {
      val ws = weights.toSeq.sortBy(_._1).map { case (s, w) =>
        s"WHEN $strata = '$s' THEN ${f(w)}"
      }.mkString(" ")
      s"(CASE $ws ELSE ${f(defaultWeight)} END)"
    }
    s"(${cases(baseOf)} + CASE WHEN (${PolyHash64.sql(keySql)}) % $Buckets < " +
      s"${cases(fracOf)} THEN 1 ELSE 0 END)"
  }
}
