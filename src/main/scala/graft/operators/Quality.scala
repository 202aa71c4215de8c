package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (Deequ-style constraint suite): each
  * check reduces a table to one (check, n_violations) row, and a suite
  * is the union of its checks. A check list is plain data — Column
  * expressions and table NAMES, no bound DataFrames — so the same list
  * drives both the Spark plan ([[report]]) and the DuckDB twin
  * ([[reportSql]]), the gopherRules pattern applied to DQ contracts.
  *
  * Scale posture: every check is a full-scan aggregate with a 1-row
  * output — the union becomes ONE job whose repeated scans Catalyst
  * de-duplicates (exchange reuse), and only the checks that must
  * shuffle do: uniqueness on its audited key, orphans as an anti
  * semi-join on the audited FK (broadcast when the parent key set is
  * small). Everything else is map-side partial aggregation.
  */
object Quality {

  /** A named constraint producing a violation COUNT over one table. */
  sealed trait Check { def name: String }
  /** Rows where the predicate is false or null. `pred` drives Spark,
    * `sql` is its DuckDB spelling. */
  final case class PredCheck(name: String, pred: Column, sql: String) extends Check
  /** Key values appearing more than once (counts every row in a
    * duplicated group). */
  final case class UniqueCheck(name: String, key: String) extends Check
  /** Child keys with no matching parent key (FK orphans). */
  final case class OrphanCheck(name: String, childKey: String,
                               parentTable: String, parentKey: String) extends Check

  /** One (check, n_violations) row per check, unioned and name-sorted.
    * `parents` resolves each OrphanCheck's parentTable name.
    *
    * ALL PredChecks share a single aggregate pass — one scan of the
    * audited table no matter how many row-level constraints the suite
    * carries (the design that keeps a 50-check contract a one-pass job
    * at 100 TB); only Unique/Orphan checks, which need their own
    * key shuffles, scan separately. */
  def report(table: DataFrame, checks: Seq[Check],
             parents: Map[String, DataFrame] = Map.empty): DataFrame = {
    require(checks.nonEmpty, "Quality.report needs at least one check")
    checks.foreach {
      case OrphanCheck(n, _, parentTable, _) =>
        require(parents.contains(parentTable),
          s"OrphanCheck '$n' references parent table '$parentTable' " +
            s"but parents only has ${parents.keys.mkString("[", ", ", "]")}")
      case _ =>
    }
    val preds = checks.collect { case p: PredCheck => p }
    val predReport: Option[DataFrame] =
      if (preds.isEmpty) None
      else {
        val aggs = preds.map(p =>
          coalesce(sum(when(p.pred, 0L).otherwise(1L)), lit(0L)).as(p.name))
        Some(table.agg(aggs.head, aggs.tail: _*)
          .unpivot(Array.empty[Column], preds.map(p => col(p.name)).toArray,
            "check", "n_violations"))
      }
    val rest = checks.collect {
      case UniqueCheck(n, key) =>
        table.groupBy(col(key)).agg(count(lit(1)).as("c"))
          .where(col("c") > 1)
          .agg(coalesce(sum(col("c")), lit(0L)).as("n_violations"))
          .select(lit(n).as("check"), col("n_violations"))
      case OrphanCheck(n, childKey, parentTable, parentKey) =>
        table.join(parents(parentTable).select(col(parentKey)).distinct(),
            col(childKey) === col(parentKey), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(n).as("check"), col("n_violations"))
    }
    (predReport.toSeq ++ rest).reduce(_.unionByName(_)).orderBy(col("check"))
  }

  /** Train/val/test leakage audit: pairs of rows sharing the same
    * content digest but assigned DIFFERENT splits — the contamination
    * a held-out set must not have. One shuffle on the digest; the pair
    * count per split-combination comes off a per-digest-per-split
    * count (n_a × n_b per digest), never a materialized pair join —
    * at 100 TB the digest groups, not the pairs, cross the wire.
    * Output: (split_a, split_b, n_leaked_pairs), split_a < split_b. */
  def splitLeakage(rows: DataFrame, split: Column, digest: Column): DataFrame = {
    val perSplit = rows.select(digest.as("h"), split.as("s"))
      .groupBy(col("h"), col("s")).agg(count(lit(1)).as("n"))
    perSplit.as("a").join(perSplit.as("b"),
        col("a.h") === col("b.h") && col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("split_a"), col("b.s").as("split_b"))
      .agg(sum(col("a.n") * col("b.n")).as("n_leaked_pairs"))
      .orderBy(col("split_a"), col("split_b"))
  }

  /** Robust per-group outlier detection over an INTEGRAL value column:
    * modified z-score `0.6745·(x − median)/MAD` (Iglewicz–Hoaglin),
    * flagging rows with |z| above the threshold. Median/MAD — not
    * mean/stddev — so a contaminated tail cannot mask itself by
    * inflating the spread: the breakdown point is 50%, the property
    * that makes this the standard DQ screen for corpus length/score
    * columns.
    *
    * The scale problem is EXACT median at 100 TB: Spark's `percentile`
    * aggregate buffers every group value in one task's memory, and a
    * `Window.partitionBy(group)` rank sends each group to a single
    * partition — both die when one group has billions of rows. For an
    * integral domain the answer is a VALUE HISTOGRAM: `groupBy(group,
    * v).count` shuffles at most |groups|·|distinct v| rows (bounded by
    * the domain, not the corpus), the per-group cumulative walk runs on
    * that tiny frame, and the rank-r order statistic is
    * `min(v | cum(v) ≥ r)`. Even-count groups interpolate the two
    * middle ranks exactly like DuckDB's `median` — halves stay exact in
    * doubles, so the twin hash-matches bit-for-bit. MAD reuses the same
    * trick on the deviation histogram (|v − med| carries the original
    * counts — the raw rows are NOT re-scanned for it). Raw data is
    * touched exactly twice: histogram build and the final broadcast-
    * joined scoring scan.
    *
    * Output: input columns + med, mad, z for flagged rows, mad = 0
    * groups excluded (every value identical — no spread to score
    * against). */
  def robustOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
      zThreshold: Double = 3.5): DataFrame = {
    require(groupCols.nonEmpty, "robustOutliers needs at least one group column")
    val gs = groupCols.map(col)
    def histMedian(hist: DataFrame, v: String): DataFrame = {
      // hist: groupCols, v, cnt — all per-group work on histogram rows
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(gs: _*).orderBy(col(v))
      val cum = hist.withColumn("_cum", sum(col("cnt")).over(w))
        .withColumn("_n", sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(gs: _*)))
      val r1 = ((col("_n") + 1) / 2).cast("long") // 1-indexed lower middle
      val r2 = ((col("_n") + 2) / 2).cast("long") // upper middle (== r1 when odd)
      cum.groupBy(gs: _*)
        .agg(((min(when(col("_cum") >= r1, col(v))) +
               min(when(col("_cum") >= r2, col(v)))) / 2.0).as("_m"))
    }
    // NULL values must not enter the histogram: DuckDB's median/MAD
    // ignore them, and an ascending window would rank them FIRST,
    // shifting every order statistic on a nullable column. (Null-value
    // rows still appear in the scored join below, where their null z
    // is filtered — same as the SQL twin.)
    val hist = df.where(col(valueCol).isNotNull)
      .groupBy((gs :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("cnt"))
    val med = histMedian(hist, valueCol).withColumnRenamed("_m", "med")
    val devHist = hist.join(broadcast(med), groupCols)
      .groupBy((gs :+ abs(col(valueCol) - col("med")).as("_dev")): _*)
      .agg(sum(col("cnt")).as("cnt"))
    val mad = histMedian(devHist, "_dev").withColumnRenamed("_m", "mad")
    df.join(broadcast(med), groupCols).join(broadcast(mad), groupCols)
      .withColumn("z", lit(0.6745) * (col(valueCol) - col("med")) / col("mad"))
      .where(col("mad") > 0 && abs(col("z")) > zThreshold)
  }

  /** DuckDB twin of [[robustOutliers]]: the engine's exact `median`
    * (same two-middle interpolation) + the same left-associated double
    * arithmetic, so z hashes bit-identically. */
  def robustOutliersSql(table: String, valueCol: String,
      groupCols: Seq[String], zThreshold: Double, selectCols: Seq[String],
      orderBy: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    val on = groupCols.map(c => s"t.$c = m.$c").mkString(" AND ")
    val on2 = groupCols.map(c => s"t.$c = d.$c").mkString(" AND ")
    s"""WITH m AS (
       |  SELECT $g, median($valueCol) AS med FROM $table GROUP BY $g),
       |d AS (
       |  SELECT ${groupCols.map(c => "t." + c).mkString(", ")},
       |         median(abs(t.$valueCol - m.med)) AS mad
       |  FROM $table t JOIN m ON $on GROUP BY ${groupCols.map(c => "t." + c).mkString(", ")}),
       |scored AS (
       |  SELECT ${selectCols.map(c => "t." + c).mkString(", ")}, m.med, d.mad,
       |         0.6745 * (t.$valueCol - m.med) / d.mad AS z
       |  FROM $table t JOIN m ON $on JOIN d ON $on2)
       |SELECT * FROM scored WHERE mad > 0 AND abs(z) > $zThreshold
       |ORDER BY ${orderBy.mkString(", ")}""".stripMargin
  }

  /** Exact per-group quantile profile (data-profiling at corpus scale):
    * for each group, `n` plus the exact interpolated quantile of
    * `valueCol` at every requested fraction — the p25/p50/p75/p95 table
    * a dataset card reports.
    *
    * Same scale stance as [[robustOutliers]]: the value distribution is
    * first collapsed to a `(group, value, cnt)` histogram (bounded by
    * the value domain, not the row count), then ORDER STATISTICS are
    * read off cumulative counts under a per-group window — no per-group
    * sort of raw rows, no single-partition stage, and adding quantiles
    * costs extra aggregates, not extra passes.
    *
    * Interpolation replicates DuckDB's `quantile_cont` bit for bit
    * (empirically pinned, 1200/1200 random cases): with
    * `p = q·(n−1)`, `frac = p − ⌊p⌋`, the result is
    * `lo·(1−frac) + hi·frac` on the order statistics at ranks
    * `⌊p⌋+1, ⌊p⌋+2` — evaluated in exactly that double association so
    * the oracle hash-matches.
    *
    * NULL values are ignored (DuckDB semantics): `n` counts non-null
    * values, and a group whose values are ALL null is absent from the
    * output (the SQL twin would emit it with n=0 — don't profile a
    * column that can be entirely null within a group). */
  def quantileProfile(df: DataFrame, valueCol: String, groupCols: Seq[String],
      qs: Seq[(String, Double)]): DataFrame = {
    require(groupCols.nonEmpty, "quantileProfile needs at least one group column")
    require(qs.nonEmpty, "quantileProfile needs at least one quantile")
    require(qs.forall { case (_, q) => q >= 0.0 && q <= 1.0 },
      s"quantile fractions must be in [0,1]: $qs")
    val gs = groupCols.map(col)
    val v = col(valueCol).cast("double")
    // NULLs stay out of the histogram (quantile_cont ignores them;
    // ranked ascending they would shift every order statistic), and
    // out of `n` — the twin counts the VALUE column, not rows
    val hist = df.where(v.isNotNull)
      .groupBy((gs :+ v.as("_v")): _*).agg(count(lit(1)).as("cnt"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(col("_v"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(gs: _*)
    val cum = hist.withColumn("_cum", sum(col("cnt")).over(wOrd))
      .withColumn("_n", sum(col("cnt")).over(wAll))
    // rank k (1-indexed) order statistic = min value with _cum >= k;
    // _n is constant within the group, so k1 is a row-level expression
    val aggs = qs.flatMap { case (name, q) =>
      val p = lit(q) * (col("_n") - 1).cast("double")
      val k1 = floor(p).cast("long") + 1
      Seq(min(when(col("_cum") >= k1, col("_v"))).as(s"_lo_$name"),
          min(when(col("_cum") >= k1 + 1, col("_v"))).as(s"_hi_$name"))
    }
    val agged = cum.groupBy(gs: _*)
      .agg(max(col("_n")).as("n"), aggs: _*)
    val withQ = qs.foldLeft(agged) { case (d, (name, q)) =>
      val p = lit(q) * (col("n") - 1).cast("double")
      val frac = p - floor(p)
      // frac = 0 → the rank-k1 statistic itself (hi may not exist at q=1)
      d.withColumn(name, when(frac === 0.0, col(s"_lo_$name"))
        .otherwise(col(s"_lo_$name") * (lit(1.0) - frac) +
                   col(s"_hi_$name") * frac))
    }
    withQ.select((gs :+ col("n")) ++ qs.map { case (name, _) => col(name) }: _*)
  }

  /** DuckDB twin of [[quantileProfile]]: the engine's own
    * `quantile_cont` — the Spark side replays its exact arithmetic. */
  def quantileProfileSql(table: String, valueCol: String,
      groupCols: Seq[String], qs: Seq[(String, Double)],
      orderBy: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    val qCols = qs.map { case (name, q) =>
      s"quantile_cont(CAST($valueCol AS DOUBLE), $q) AS $name" }
    s"""SELECT $g, CAST(COUNT($valueCol) AS BIGINT) AS n,
       |       ${qCols.mkString(",\n       ")}
       |FROM $table GROUP BY $g ORDER BY ${orderBy.mkString(", ")}"""
      .stripMargin
  }

  /** DuckDB twin of [[splitLeakage]] given SQL for the digest/split of
    * a `rows` CTE (bound by the caller's WITH clause). */
  def splitLeakageSql(rowsCte: String, digestSql: String, splitSql: String): String =
    s"""per_split AS (
       |  SELECT $digestSql AS h, $splitSql AS s, COUNT(*) AS n
       |  FROM $rowsCte GROUP BY 1, 2)
       |SELECT a.s AS split_a, b.s AS split_b,
       |       CAST(SUM(a.n * b.n) AS BIGINT) AS n_leaked_pairs
       |FROM per_split a JOIN per_split b ON a.h = b.h AND a.s < b.s
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** DuckDB twin: the same checks as a UNION ALL of one-row aggregates.
    * `tableSql` is the audited table's name in the oracle schema. */
  def reportSql(tableSql: String, checks: Seq[Check]): String =
    checks.map {
      case PredCheck(n, _, sql) =>
        s"""SELECT '$n' AS "check",
           |  CAST(COALESCE(SUM(CASE WHEN ($sql) THEN 0 ELSE 1 END), 0) AS BIGINT) AS n_violations
           |FROM $tableSql""".stripMargin
      case UniqueCheck(n, key) =>
        s"""SELECT '$n' AS "check",
           |  CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_violations
           |FROM (SELECT COUNT(*) AS c FROM $tableSql GROUP BY $key
           |      HAVING COUNT(*) > 1) t""".stripMargin
      case OrphanCheck(n, childKey, parentTable, parentKey) =>
        s"""SELECT '$n' AS "check", COUNT(*) AS n_violations
           |FROM $tableSql c
           |WHERE NOT EXISTS (SELECT 1 FROM $parentTable p
           |                  WHERE p.$parentKey = c.$childKey)""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) r ORDER BY \"check\"")

  // ------------------------------------ cross-snapshot drift (q4)

  /** Column-stats drift report between two snapshots of the same table
    * — the DQ gate a pipeline runs before PROMOTING a new dataset
    * version (q1 audits one snapshot against static rules; this audits
    * a new snapshot against the previous one, where the rule is "looks
    * like yesterday"). One aggregate pass per side regardless of how
    * many columns are profiled (all per-column stats ride the same
    * job — the q1 one-scan discipline), a 1-row × 1-row join, and a
    * row per profiled column out.
    *
    * Stats per column: row counts, null counts, exact-decimal mean
    * (Num.avgExact's arithmetic — order-independent, so the report is
    * retry-stable), min/max. `mean_shift` = (new−old)/|old| and
    * `drifted` = |mean_shift| > threshold — the promotion tripwire.
    * Degenerate old means can't hide a real shift: a zero old mean
    * drifts whenever the new mean is nonzero (the relative shift is
    * undefined — mean_shift is null there, never NaN/∞), and a column
    * flipping between all-null and non-null drifts in both directions;
    * all-null on both sides is no drift. Columns must be castable to
    * DECIMAL(18,2). */
  def driftReport(oldDf: DataFrame, newDf: DataFrame, cols: Seq[String],
                  meanShiftThreshold: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "driftReport needs at least one column")
    def side(df: DataFrame, p: String): DataFrame = {
      val aggs = count(lit(1)).as(s"${p}_n") +: cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${p}_nulls_$c"),
        (sum(graft.functions.Num.dec(col(c))).cast("double") / count(col(c)))
          .as(s"${p}_mean_$c"),
        graft.functions.Num.dec(min(col(c))).cast("double").as(s"${p}_min_$c"),
        graft.functions.Num.dec(max(col(c))).cast("double").as(s"${p}_max_$c")))
      df.agg(aggs.head, aggs.tail: _*)
    }
    side(oldDf, "o").crossJoin(side(newDf, "w")) // 1 row × 1 row
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("o_n").as("old_n"), col("w_n").as("new_n"),
        col(s"o_nulls_$c").as("old_nulls"), col(s"w_nulls_$c").as("new_nulls"),
        col(s"o_mean_$c").as("old_mean"), col(s"w_mean_$c").as("new_mean"),
        col(s"o_min_$c").as("old_min"), col(s"w_min_$c").as("new_min"),
        col(s"o_max_$c").as("old_max"), col(s"w_max_$c").as("new_max"))): _*))
        .as("s"))
      .select(col("s.*"))
      .withColumn("mean_shift",
        when(col("old_mean") =!= 0d,
          (col("new_mean") - col("old_mean")) / abs(col("old_mean"))))
      .withColumn("drifted",
        when(col("old_mean").isNull && col("new_mean").isNull, lit(false))
          .when(col("old_mean").isNull || col("new_mean").isNull, lit(true))
          .when(col("old_mean") === 0d, col("new_mean") =!= 0d)
          .otherwise(abs(col("mean_shift")) > meanShiftThreshold))
      .orderBy(col("column"))
  }

  /** DuckDB twin of [[driftReport]]: same one-pass per-side aggregates
    * (as CTEs), same per-column row expansion, same double tree for
    * mean/shift. `oldSql`/`newSql` are full SELECTs producing the two
    * snapshots. */
  def driftReportSql(oldSql: String, newSql: String, cols: Seq[String],
                     meanShiftThreshold: Double = 0.05): String = {
    def sideSel(p: String) =
      (s"COUNT(*) AS ${p}_n" +: cols.flatMap(c => Seq(
        s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${p}_nulls_$c",
        s"${graft.functions.Num.sqlAvgExact(c)} AS ${p}_mean_$c",
        s"CAST(CAST(MIN($c) AS DECIMAL(18,2)) AS DOUBLE) AS ${p}_min_$c",
        s"CAST(CAST(MAX($c) AS DECIMAL(18,2)) AS DOUBLE) AS ${p}_max_$c")))
        .mkString(", ")
    val perCol = cols.map(c =>
      s"""SELECT '$c' AS "column", o_n AS old_n, w_n AS new_n,
         |  o_nulls_$c AS old_nulls, w_nulls_$c AS new_nulls,
         |  o_mean_$c AS old_mean, w_mean_$c AS new_mean,
         |  o_min_$c AS old_min, w_min_$c AS new_min,
         |  o_max_$c AS old_max, w_max_$c AS new_max
         |FROM o CROSS JOIN w""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH o AS (SELECT ${sideSel("o")} FROM ($oldSql) t),
       |w AS (SELECT ${sideSel("w")} FROM ($newSql) t)
       |SELECT r.*,
       |  CASE WHEN old_mean <> 0
       |       THEN (new_mean - old_mean) / ABS(old_mean) END AS mean_shift,
       |  CASE WHEN old_mean IS NULL AND new_mean IS NULL THEN FALSE
       |       WHEN old_mean IS NULL OR new_mean IS NULL THEN TRUE
       |       WHEN old_mean = 0 THEN new_mean <> 0
       |       ELSE ABS((new_mean - old_mean) / ABS(old_mean)) > $meanShiftThreshold
       |  END AS drifted
       |FROM (
       |$perCol
       |) r ORDER BY "column"""".stripMargin
  }
}
