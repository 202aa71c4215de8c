package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{PolyHash64, TextFunctions => TF}

/** N-gram language-model quality scoring — the CCNet/KenLM stage the
  * reference pipeline lacks (its quality gates are rule-based; see
  * SURVEY §2.10): train a bigram LM on a reference slice, score every
  * document by average per-token surprisal, and bucket each language's
  * documents into head/middle/tail thirds (CCNet's split) for curation.
  * Also implements DSIR-style hashed-n-gram importance weights (target
  * vs raw log-likelihood ratio) for importance resampling.
  *
  * Relation to t9/t11 (TextQueries): those likelihood scores stay in
  * LINEAR fixed-point space precisely to dodge ln()'s cross-engine ulp
  * drift, at the cost of not being the actual LM quantity (a product of
  * probabilities collapses to its largest terms in linear space). This
  * operator pays the log-domain piper once, with quantization:
  *
  * Engine-exactness design (the part that makes these oracle-gateable):
  * `ln` is the one operation here with no cross-engine bit guarantee
  * (libm vs JVM intrinsics may differ in the last ulp), so every
  * log-probability is quantized ONCE to integer micro-nats —
  * `floor(ln(num/den)*1e6 + 0.5)` — and all downstream aggregation is
  * BIGINT sums (associative, order-independent; a float sum over an
  * arbitrary shuffle order would not hash-match any single-node oracle).
  * An ulp disagreement changes the quantized value only when
  * ln(p)*1e6 lands within ~1e-10 of a rounding boundary; the division
  * num/den itself is IEEE-exact in both engines.
  *
  * Scale shape (100 TB): bigram extraction is map-side (slice+zip, no
  * join); counting is one hash-agg shuffle on (w1,w2) with map-side
  * combine; the unigram totals re-aggregate the (much smaller) bigram
  * COUNT table, not the corpus. Scoring is two shuffle joins (bigram
  * table, then unigram backoff) that AQE turns into broadcasts whenever
  * the vocabulary fits — no collected LM, no driver loop. Bucketing
  * reuses [[Ranking.globalRank]] with `lang` as the leading sort key, so
  * per-language ranks come out of ONE global range-partitioned rank
  * (rank − per-lang offset) with no per-language single partition.
  */
object LmScore {

  /** Stream of adjacent token pairs per document: map-side only.
    * Documents with <2 tokens contribute nothing (a bigram model has no
    * estimate for them; callers LEFT-join scores back when needed). */
  def bigrams(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        explode(graft.functions.Registry.wordGrams(col(textCol), 2)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** DuckDB twin of [[bigrams]] as a CTE body over `from`. */
  def bigramsSql(from: String, textExpr: String = "text"): String = {
    val toks = TF.wsTokensSql(s"lower($textExpr)")
    s"""SELECT doc_id, t[i] AS w1, t[i+1] AS w2
       |FROM (SELECT doc_id, $toks AS t FROM $from) d,
       |     LATERAL (SELECT unnest(range(1, len(t))) AS i) g
       |WHERE len(t) >= 2""".stripMargin.replace("\n", " ")
  }

  /** log((num)/(den)) in integer micro-nats. floor(x+0.5) rather than
    * round(): floor is exact on doubles in both engines, while ROUND's
    * half-away-from-zero vs half-up convention differs for negatives. */
  def lpMicro(num: Column, den: Column): Column =
    floor(log(num / den) * lit(1e6) + lit(0.5)).cast("long")

  def lpMicroSql(num: String, den: String): String =
    s"CAST(floor(ln(($num)/($den)) * 1000000 + 0.5) AS BIGINT)"

  /** Add-1/2-smoothed bigram model of `train`:
    * (bigram logp table, unigram-backoff table, vocab-size scalar frame).
    * P(w2|w1) = (c12 + ½) / (c1 + ½·V); unseen w2 under a seen w1 gets
    * the same formula with c12 = 0; V = distinct continuations + 1 (UNK).
    */
  def trainBigram(train: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame, DataFrame) = {
    // localCheckpoint the count table: it feeds FIVE downstream branches
    // (lm join, c1 re-agg, vocab scalar, and through them the scorer) —
    // without materialization none of them share (AQE's broadcast
    // conversions defeat ReusedExchange) and the plan re-reads the
    // whole training corpus once per branch (measured: 14 parquet scans
    // for q5). Checkpointed, the corpus is read ONCE to build the
    // vocab^2-bounded count table and every branch reads that.
    val c12 = bigrams(train, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    // unigram totals from the count table (vocab-sized, not corpus-sized)
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val v = c12.agg((countDistinct(col("w2")) + 1).cast("double").as("v"))
    val lm = c12.join(c1, "w1").crossJoin(broadcast(v))
      .select(col("w1"), col("w2"),
        lpMicro(col("c12") + lit(0.5), col("c1") + lit(0.5) * col("v")).as("lp"))
    val unk = c1.crossJoin(broadcast(v))
      .select(col("w1"),
        lpMicro(lit(0.5), col("c1") + lit(0.5) * col("v")).as("lp_unk"))
    (lm, unk, v)
  }

  /** Per-document total log-probability of `docs` under the model of
    * `train`: (doc_id, n_bigrams, logp_micro BIGINT, surprisal DOUBLE =
    * −logp_micro/n_bigrams, i.e. mean micro-nats per transition; lower
    * is more fluent). Out-of-vocabulary transitions back off to the
    * per-w1 UNK mass; a fully unseen w1 gets the uniform 1/V. */
  def surprisal(train: DataFrame, docs: DataFrame,
                textCol: String = "text"): DataFrame = {
    val (lm, unk, v) = trainBigram(train, textCol)
    val meta = v.select(col("v"), lpMicro(lit(1.0), col("v")).as("lp_unseen"))
    lpRows(docs, lm, unk, meta, textCol)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("logp_micro"))
      .withColumn("surprisal",
        -col("logp_micro").cast("double") / col("n_bigrams"))
  }

  /** DuckDB twin of [[surprisal]] (train = score = `from`), as a CTE
    * chain ending in relation `scored`. */
  def surprisalSql(from: String, textExpr: String = "text"): String =
    s"""bg AS (${bigramsSql(from, textExpr)}),
       |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
       |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
       |vv AS (SELECT CAST(count(DISTINCT w2) + 1 AS DOUBLE) AS v FROM c12),
       |lm AS (SELECT w1, w2,
       |         ${lpMicroSql("c12 + 0.5", "c1 + 0.5*v")} AS lp
       |       FROM c12 JOIN c1 USING (w1) CROSS JOIN vv),
       |unk AS (SELECT w1, ${lpMicroSql("0.5", "c1 + 0.5*v")} AS lp_unk
       |        FROM c1 CROSS JOIN vv),
       |scored AS (
       |  SELECT doc_id, count(*) AS n_bigrams,
       |         CAST(sum(lp2) AS BIGINT) AS logp_micro,
       |         -CAST(sum(lp2) AS DOUBLE) / count(*) AS surprisal
       |  FROM (SELECT bg.doc_id,
       |          COALESCE(lm.lp, unk.lp_unk,
       |                   ${lpMicroSql("1.0", "v")}) AS lp2
       |        FROM bg LEFT JOIN lm USING (w1, w2)
       |                LEFT JOIN unk USING (w1) CROSS JOIN vv) s
       |  GROUP BY doc_id)""".stripMargin.replace("\n", " ")

  /** Per-(doc, lang) bigram stream — [[bigrams]] with `lang` riding
    * the map-side explode (no id→lang join shuffle). Input needs
    * (doc_id, lang, textCol). */
  private def bigramsPerLang(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.Registry.wordGrams(col(textCol), 2)).as("b"))
      .select(col("doc_id"), col("lang"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** |langs| add-½-smoothed bigram models in ONE pass: the language
    * key simply JOINS the aggregation keys — counts are (lang, w1,
    * w2), backoff totals (lang, w1), vocab sizes a #langs-row table —
    * so "train |langs| models" is the SAME two hash-agg shuffles as
    * one model, no per-language loop, no per-language hot partition.
    * Returns (bigram table, unigram-backoff table, vocab-size table),
    * all lang-keyed — the per-language twin of [[trainBigram]]. */
  def trainBigramPerLang(train: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame, DataFrame) = {
    // same five-consumer pathology as trainBigram's c12: checkpoint the
    // vocab²-bounded count table so the corpus is read once
    val c12 = bigramsPerLang(train, textCol)
      .groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val c1 = c12.groupBy(col("lang"), col("w1")).agg(sum(col("c12")).as("c1"))
    val v = c12.groupBy(col("lang"))
      .agg((countDistinct(col("w2")) + 1).cast("double").as("v"))
    val lm = c12.join(c1, Seq("lang", "w1")).join(broadcast(v), Seq("lang"))
      .select(col("lang"), col("w1"), col("w2"),
        lpMicro(col("c12") + lit(0.5), col("c1") + lit(0.5) * col("v")).as("lp"))
    val unk = c1.join(broadcast(v), Seq("lang"))
      .select(col("lang"), col("w1"),
        lpMicro(lit(0.5), col("c1") + lit(0.5) * col("v")).as("lp_unk"))
    (lm, unk, v)
  }

  /** Shared per-language scoring tail: bigram stream ⋈ model ⋈ backoff
    * ⋈ #langs-row uniform table, then the per-(doc, lang) BIGINT sum.
    * The trailing 0L arm fires when a document's language has NO model
    * at all — reachable only in the train/score split
    * ([[surprisalAgainstLmPerLang]], where a language can appear on
    * the scoring side alone): lp 0 per transition, i.e. "no opinion"
    * rather than a NULL-poisoned sum. In the self-trained form every
    * scoring language has model rows by construction. The SQL twins
    * carry the same COALESCE arm. */
  private def scorePerLang(bg: DataFrame, lm: DataFrame, unk: DataFrame,
                           uni: DataFrame): DataFrame =
    lpRowsPerLangOf(bg, lm, unk, uni)
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp2")).as("logp_micro"))
      .withColumn("surprisal",
        -col("logp_micro").cast("double") / col("n_bigrams"))

  /** Per-transition (doc_id, lang, lp2) stream — the per-language twin
    * of [[lpRows]], shared by the batch scorer above and the streaming
    * enrich (graft.streaming.DocStreams.lmScoreEnrichPerLang) so the
    * two cannot drift: on a stream the final per-(doc, lang) sum runs
    * in a stateless group shell instead of groupBy, but every lp2 this
    * emits is identical. */
  private def lpRowsPerLangOf(bg: DataFrame, lm: DataFrame, unk: DataFrame,
                              uni: DataFrame): DataFrame =
    bg
      .join(lm, Seq("lang", "w1", "w2"), "left")
      .join(unk, Seq("lang", "w1"), "left")
      .join(broadcast(uni), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("lp"), col("lp_unk"), col("lp_unseen"), lit(0L)).as("lp2"))

  /** [[lpRowsPerLangOf]] against the persisted per-language models at
    * `path` — the loaded-artifact form the streaming enrich consumes. */
  def lpRowsPerLang(docs: DataFrame,
                    spark: org.apache.spark.sql.SparkSession,
                    path: String, textCol: String = "text"): DataFrame = {
    val (lm, unk, meta) = loadLmPerLang(spark, path)
    lpRowsPerLangOf(bigramsPerLang(docs, textCol), lm, unk,
      meta.select(col("lang"), col("lp_unseen")))
  }

  /** Adjacent token TRIPLES per document: map-side, same shape as
    * [[bigrams]] one order up. Documents with <3 tokens contribute
    * nothing (the trigram analog of the <2 bigram rule). */
  private def trigrams(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("doc_id"),
        explode(graft.functions.Registry.wordGrams(col(textCol), 3)).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"),
        col("g.w2").as("w2"), col("g.w3").as("w3"))

  /** Stupid-backoff penalty in integer micro-nats: ln(0.4)·10⁶,
    * quantized with the same floor(x+0.5) rule as [[lpMicro]]. Brants
    * et al. 2007's α≈0.4 — a transition scored by a lower-order tier
    * pays this fixed cost relative to one the top tier covered, so
    * falling out of the trigram table is never free (without it the
    * surprisal spread the CCNet gate buckets on is compressed). A pure
    * integer add, so the BIGINT-sum discipline is untouched. */
  val BackoffPenaltyMicro: Long = -916291L

  /** TRIGRAM surprisal with bigram→unigram backoff (q10) — one order
    * closer to the 5-gram KenLM CCNet actually runs than [[surprisal]]:
    * P(w3|w1w2) add-½-smoothed for trigrams OBSERVED in training
    * (the table has rows only for seen (w1,w2,w3); any unseen trigram
    * — even under a seen context — backs off), falling back to the
    * BIGRAM estimate P(w3|w2) (the same add-½ table [[trainBigram]]
    * builds), then to the per-w2 UNK mass, then to uniform 1/V — each
    * transition scored by the HIGHEST-order model with an opinion,
    * with every backed-off tier paying the fixed
    * [[BackoffPenaltyMicro]] (stupid backoff's α=0.4; one level of
    * backoff here, since the bigram/UNK/uniform arms are all "the
    * bigram model's opinion"). Exact integer micro-nats at every tier
    * (one ln per model row, BIGINT sums everywhere — the whole
    * cascade hash-matches DuckDB). For the principled estimator fix
    * (discounted mass moved to CONTINUATION counts rather than a flat
    * penalty) see [[surprisalKn]].
    * Scale shape: one extra hash-agg shuffle for the trigram count
    * table (context totals re-aggregate THAT table, not the corpus;
    * checkpointed like c12), the scoring join keyed (w1,w2,w3) —
    * broadcast-able at saturated vocab exactly like [[lpRows]], with
    * the same documented shuffle fallback. Output: (doc_id,
    * n_trigrams, logp_micro, surprisal). */
  def surprisalTrigram(train: DataFrame, docs: DataFrame,
                       textCol: String = "text"): DataFrame = {
    val c123 = trigrams(train, textCol)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c123"))
      .localCheckpoint()
    val c12t = c123.groupBy(col("w1"), col("w2")).agg(sum(col("c123")).as("ctx"))
    val v3 = c123.agg((countDistinct(col("w3")) + 1).cast("double").as("v3"))
    val lm3 = c123.join(c12t, Seq("w1", "w2")).crossJoin(broadcast(v3))
      .select(col("w1"), col("w2"), col("w3"),
        lpMicro(col("c123") + lit(0.5), col("ctx") + lit(0.5) * col("v3"))
          .as("lp3"))
    val (lm2, unk2, v2) = trainBigram(train, textCol)
    val uni = v2.select(lpMicro(lit(1.0), col("v")).as("lp_unseen"))
    trigrams(docs, textCol)
      .join(lm3, Seq("w1", "w2", "w3"), "left")
      .join(lm2.select(col("w1").as("w2"), col("w2").as("w3"),
        col("lp").as("lp2")), Seq("w2", "w3"), "left")
      .join(unk2.select(col("w1").as("w2"), col("lp_unk")), Seq("w2"), "left")
      .crossJoin(broadcast(uni))
      .select(col("doc_id"),
        coalesce(col("lp3"), col("lp2") + lit(BackoffPenaltyMicro),
          col("lp_unk") + lit(BackoffPenaltyMicro),
          col("lp_unseen") + lit(BackoffPenaltyMicro)).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("lp")).as("logp_micro"))
      .withColumn("surprisal",
        -col("logp_micro").cast("double") / col("n_trigrams"))
  }

  /** DuckDB twin of [[surprisalTrigram]] with DISTINCT train and score
    * relations (the form that actually exercises every backoff tier —
    * self-trained, the top tier always hits), ending in `scored3`. */
  def surprisalTrigramSql(trainFrom: String, scoreFrom: String,
                          textExpr: String = "text"): String = {
    val toks = TF.wsTokensSql(s"lower($textExpr)")
    def tgOf(alias: String, from: String) =
      s"""$alias AS (
         |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
         |  FROM (SELECT doc_id, $toks AS t FROM $from) d,
         |       LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) g
         |  WHERE len(t) >= 3)""".stripMargin
    s"""${tgOf("tgt", trainFrom)},
       |c123 AS (SELECT w1, w2, w3, count(*) AS c123 FROM tgt GROUP BY 1, 2, 3),
       |c12t AS (SELECT w1, w2, sum(c123) AS ctx FROM c123 GROUP BY 1, 2),
       |v3 AS (SELECT CAST(count(DISTINCT w3) + 1 AS DOUBLE) AS v3 FROM c123),
       |lm3 AS (SELECT w1, w2, w3,
       |          ${lpMicroSql("c123 + 0.5", "ctx + 0.5*v3")} AS lp3
       |        FROM c123 JOIN c12t USING (w1, w2) CROSS JOIN v3),
       |bg AS (${bigramsSql(trainFrom, textExpr)}),
       |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
       |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
       |vv AS (SELECT CAST(count(DISTINCT w2) + 1 AS DOUBLE) AS v FROM c12),
       |lm2 AS (SELECT w1 AS w2, w2 AS w3,
       |          ${lpMicroSql("c12 + 0.5", "c1 + 0.5*v")} AS lp2
       |        FROM c12 JOIN c1 USING (w1) CROSS JOIN vv),
       |unk2 AS (SELECT w1 AS w2, ${lpMicroSql("0.5", "c1 + 0.5*v")} AS lp_unk
       |         FROM c1 CROSS JOIN vv),
       |${tgOf("tgs", scoreFrom)},
       |scored3 AS (
       |  SELECT doc_id, count(*) AS n_trigrams,
       |         CAST(sum(lp) AS BIGINT) AS logp_micro,
       |         -CAST(sum(lp) AS DOUBLE) / count(*) AS surprisal
       |  FROM (SELECT tgs.doc_id,
       |          COALESCE(lm3.lp3, lm2.lp2 + ($BackoffPenaltyMicro),
       |                   unk2.lp_unk + ($BackoffPenaltyMicro),
       |                   ${lpMicroSql("1.0", "v")} + ($BackoffPenaltyMicro)) AS lp
       |        FROM tgs LEFT JOIN lm3 USING (w1, w2, w3)
       |                LEFT JOIN lm2 USING (w2, w3)
       |                LEFT JOIN unk2 USING (w2) CROSS JOIN vv) s
       |  GROUP BY doc_id)""".stripMargin.replace("\n", " ")
  }

  // ------------------------------------------------ Kneser-Ney (q11/c15)

  /** Interpolated KNESER-NEY bigram estimator — the KenLM estimator
    * CCNet actually runs (modified KN at order 5; this is the exact
    * interpolated-KN recurrence at order 2 with a single discount).
    * The add-½ family ([[trainBigram]]) gives a word seen 1000× in ONE
    * document the same backoff mass as one spread over 1000 documents;
    * KN's continuation counts fix exactly that: the discounted mass
    * redistributes by HOW MANY DISTINCT CONTEXTS a word follows, not
    * how often it occurs (Kneser & Ney 1995; Chen & Goodman 1999).
    *
    *   P(w2|w1) = max(c(w1,w2) − d, 0)/c(w1) + d·N1+(w1,·)/c(w1) · Pc(w2)
    *   Pc(w2)   = max(N1+(·,w2) − d, 0)/T + d·Du/T · 1/V
    *
    * with d = 3/4 (the classic discount, chosen RATIONAL so every
    * probability is a ratio of exact integer-valued terms), N1+ the
    * distinct-continuation / distinct-context counts, T the distinct
    * bigram-type total, Du = distinct continuation words, V = Du + 1
    * (UNK — the same vocab convention as [[trainBigram]]). An unseen
    * w1 scores Pc(w2) directly; an unseen w2 gets the d·Du/(T·V) UNK
    * share of the continuation distribution — every transition has
    * positive mass, no separate backoff cascade and no flat penalty
    * (interpolation is the principled form of what
    * [[BackoffPenaltyMicro]] approximates for q10).
    *
    * Engine-exactness: probabilities are evaluated as ×4-scaled
    * integer-valued numerators/denominators promoted to DOUBLE with
    * identical association on both engines (each promotion and product
    * is IEEE round-to-nearest — deterministic), then quantized once
    * through [[lpMicro]]'s floor rule; all aggregation stays BIGINT.
    * Scale shape identical to [[trainBigram]]+[[lpRows]]: the count
    * table is the one corpus-keyed shuffle (checkpointed — it feeds
    * five branches); u1/cont/meta re-aggregate THAT table; scoring is
    * three left joins that AQE broadcasts at saturated vocab.
    *
    * Returns (lm: (w1,w2,lp) seen-bigram micro-nats,
    *          u1: (w1,c1,n1p), cont: (w2,pcnum), meta 1-row
    *          (t,du,v,pcden,pcnum_unk)). */
  def trainKnBigram(train: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val c12 = bigrams(train, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val u1 = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
    val cont0 = c12.groupBy(col("w2")).agg(count(lit(1)).as("nc"))
    val meta = c12
      .agg(count(lit(1)).cast("double").as("t"),
        countDistinct(col("w2")).cast("double").as("du"))
      .select(col("t"), col("du"), (col("du") + lit(1.0)).as("v"),
        (lit(4.0) * col("t") * (col("du") + lit(1.0))).as("pcden"),
        (lit(3) * col("du")).as("pcnum_unk"))
    // ×4·T·V-scaled continuation numerator — precomputed per w2 so the
    // scorer's per-row arithmetic is one multiply-add
    val cont = cont0.crossJoin(broadcast(meta.select(col("v"), col("du"))))
      .select(col("w2"),
        ((lit(4) * col("nc") - lit(3)) * col("v") + lit(3) * col("du"))
          .as("pcnum"))
    val lm = c12.join(u1, "w1").join(cont, "w2").crossJoin(broadcast(meta))
      .select(col("w1"), col("w2"),
        lpMicro(
          (lit(4) * col("c12") - lit(3)) * col("pcden") +
            lit(3) * col("n1p") * col("pcnum"),
          lit(4) * col("c1") * col("pcden")).as("lp"))
    (lm, u1, cont, meta)
  }

  /** Per-document KN surprisal of `docs` under the model of `train`
    * — the q11 form of [[surprisal]]: (doc_id, n_bigrams, logp_micro,
    * surprisal). Every transition is scored by the INTERPOLATED
    * estimate (seen bigram → precomputed lp; seen w1 → the
    * continuation-weighted backoff; unseen w1 → the continuation
    * distribution itself), so there is no tier cliff to penalize. */
  def surprisalKn(train: DataFrame, docs: DataFrame,
                  textCol: String = "text"): DataFrame = {
    val (lm, u1, cont, meta) = trainKnBigram(train, textCol)
    knLpRows(bigrams(docs, textCol), lm, u1, cont, meta)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("logp_micro"))
      .withColumn("surprisal",
        -col("logp_micro").cast("double") / col("n_bigrams"))
  }

  /** Shared per-transition KN scorer: (doc_id [, lang], lp). The
    * trailing 0L arm mirrors [[scorePerLang]]'s no-model rule and is
    * reachable only in lang-keyed train/score splits. */
  private def knLpRows(bg: DataFrame, lm: DataFrame, u1: DataFrame,
                       cont: DataFrame, meta: DataFrame,
                       langKeyed: Boolean = false): DataFrame = {
    val keys = if (langKeyed) Seq("lang") else Seq.empty[String]
    val joined =
      if (langKeyed)
        bg.join(lm, keys ++ Seq("w1", "w2"), "left")
          .join(u1, keys :+ "w1", "left")
          .join(cont, keys :+ "w2", "left")
          .join(broadcast(meta), keys, "left")
      else
        bg.join(lm, Seq("w1", "w2"), "left")
          .join(u1, Seq("w1"), "left")
          .join(cont, Seq("w2"), "left")
          .crossJoin(broadcast(meta))
    val pcnumC = coalesce(col("pcnum"), col("pcnum_unk"))
    val outCols = (Seq(col("doc_id")) ++
      (if (langKeyed) Seq(col("lang")) else Nil)) :+
      coalesce(
        when(col("lp").isNotNull, col("lp"))
          .when(col("c1").isNotNull,
            lpMicro(lit(3) * col("n1p") * pcnumC,
              lit(4) * col("c1") * col("pcden")))
          .otherwise(lpMicro(pcnumC, col("pcden"))),
        lit(0L)).as("lp")
    joined.select(outCols: _*)
  }

  /** DuckDB twin of [[surprisalKn]] with distinct train/score
    * relations, ending in CTE `kscored`. Expression association
    * mirrors the Spark side term for term (see [[trainKnBigram]]'s
    * engine-exactness note). */
  def surprisalKnSql(trainFrom: String, scoreFrom: String,
                     textExpr: String = "text"): String =
    s"""kbt AS (${bigramsSql(trainFrom, textExpr)}),
       |kc12 AS (SELECT w1, w2, count(*) AS c12 FROM kbt GROUP BY 1, 2),
       |ku1 AS (SELECT w1, sum(c12) AS c1, count(*) AS n1p
       |        FROM kc12 GROUP BY 1),
       |kmeta AS (SELECT t, du, du + 1.0 AS v, 4.0 * t * (du + 1.0) AS pcden,
       |                 3 * du AS pcnum_unk
       |          FROM (SELECT CAST(count(*) AS DOUBLE) AS t,
       |                       CAST(count(DISTINCT w2) AS DOUBLE) AS du
       |                FROM kc12)),
       |kcont AS (SELECT w2, (4 * nc - 3) * v + 3 * du AS pcnum
       |          FROM (SELECT w2, count(*) AS nc FROM kc12 GROUP BY 1)
       |          CROSS JOIN kmeta),
       |klm AS (SELECT kc12.w1, kc12.w2,
       |          ${lpMicroSql(
               "(4 * c12 - 3) * pcden + 3 * n1p * pcnum",
               "4 * c1 * pcden")} AS lp
       |        FROM kc12 JOIN ku1 USING (w1) JOIN kcont USING (w2)
       |        CROSS JOIN kmeta),
       |kbs AS (${bigramsSql(scoreFrom, textExpr)}),
       |kscored AS (
       |  SELECT doc_id, count(*) AS n_bigrams,
       |         CAST(sum(lp) AS BIGINT) AS logp_micro,
       |         -CAST(sum(lp) AS DOUBLE) / count(*) AS surprisal
       |  FROM (SELECT kbs.doc_id,
       |          CASE WHEN klm.lp IS NOT NULL THEN klm.lp
       |               WHEN ku1.c1 IS NOT NULL THEN
       |                 ${lpMicroSql(
               "3 * n1p * COALESCE(pcnum, pcnum_unk)",
               "4 * c1 * pcden")}
       |               ELSE ${lpMicroSql(
               "COALESCE(pcnum, pcnum_unk)", "pcden")} END AS lp
       |        FROM kbs LEFT JOIN klm USING (w1, w2)
       |                 LEFT JOIN ku1 USING (w1)
       |                 LEFT JOIN kcont USING (w2)
       |                 CROSS JOIN kmeta) s
       |  GROUP BY doc_id)""".stripMargin.replace("\n", " ")

  // ------------------------------------------------ modified KN (q13)

  /** MODIFIED Kneser-Ney bigram trainer — KenLM's default estimator
    * configuration at the bigram level: instead of [[trainKnBigram]]'s
    * single rational discount d = ¾, three discounts D₁/D₂/D₃₊ are
    * DERIVED FROM THE CORPUS's count-of-counts (Chen & Goodman 1998;
    * nₖ = |{(w1,w2) : c(w1,w2) = k}|):
    *
    *   Y  = n₁ / (n₁ + 2·n₂)
    *   D₁ = 1 − 2·Y·n₂/n₁,  D₂ = 2 − 3·Y·n₃/n₂,  D₃₊ = 3 − 4·Y·n₄/n₃
    *
    * and each seen bigram is discounted by the D of ITS OWN count
    * tier, with the redistributed mass γ(w1) = D₁·N₁(w1) + D₂·N₂(w1)
    * + D₃₊·N₃₊(w1) (Nₖ(w1) = distinct continuations of w1 with count
    * k). The continuation LOWER level is [[trainKnBigram]]'s
    * unchanged (d = ¾ over continuation counts, uniform base) — the
    * modification is a top-level estimator refinement.
    *
    * Exactness: the discounts are RATIONALS of integer count-of-counts
    * evaluated in double arithmetic with identical association on both
    * engines (the q11 discipline: hash-exactness needs identical IEEE
    * evaluation order, not integer representability). A corpus whose
    * count-of-counts cannot estimate valid discounts (any nₖ = 0, or a
    * derived Dⱼ outside [0, j] — degenerate discounts would produce
    * negative probabilities) takes KenLM's documented
    * `--discount_fallback` escape hatch: fixed D₁/D₂/D₃₊ = 0.5/1/1.5,
    * lmplz's default fallback values. Divisions are GREATEST-guarded so
    * the fallback arm never divides by zero (Spark yields Infinity
    * there, DuckDB NULL — the guard keeps both engines off that path;
    * under valid counts GREATEST(nₖ, 1) = nₖ exactly).
    *
    * Same scale shape as [[trainKnBigram]]: one corpus-keyed shuffle
    * into the checkpointed count table; u1/cont/meta re-aggregate it;
    * scoring is three vocab-bounded left joins + a one-row broadcast.
    * Returns (lm: (w1,w2,lp), u1: (w1,c1,g), cont: (w2,pcnum),
    * meta 1-row). */
  def trainMknBigram(train: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val c12 = bigrams(train, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val meta = c12
      .agg(count(lit(1)).cast("double").as("t"),
        countDistinct(col("w2")).cast("double").as("du"),
        sum(when(col("c12") === 1, lit(1L)).otherwise(lit(0L))).as("n1"),
        sum(when(col("c12") === 2, lit(1L)).otherwise(lit(0L))).as("n2"),
        sum(when(col("c12") === 3, lit(1L)).otherwise(lit(0L))).as("n3"),
        sum(when(col("c12") === 4, lit(1L)).otherwise(lit(0L))).as("n4"))
      .withColumn("y",
        col("n1") / greatest(col("n1") + lit(2.0) * col("n2"), lit(1.0)))
      .withColumn("d1r", lit(1.0) -
        lit(2.0) * col("y") * col("n2") / greatest(col("n1"), lit(1L)))
      .withColumn("d2r", lit(2.0) -
        lit(3.0) * col("y") * col("n3") / greatest(col("n2"), lit(1L)))
      .withColumn("d3r", lit(3.0) -
        lit(4.0) * col("y") * col("n4") / greatest(col("n3"), lit(1L)))
      .withColumn("ok",
        col("n1") > 0 && col("n2") > 0 && col("n3") > 0 && col("n4") > 0 &&
          col("d1r") >= 0 && col("d1r") <= 1 &&
          col("d2r") >= 0 && col("d2r") <= 2 &&
          col("d3r") >= 0 && col("d3r") <= 3)
      .select(col("t"), col("du"), (col("du") + lit(1.0)).as("v"),
        (lit(4.0) * col("t") * (col("du") + lit(1.0))).as("pcden"),
        (lit(3) * col("du")).as("pcnum_unk"),
        when(col("ok"), col("d1r")).otherwise(lit(0.5)).as("d1"),
        when(col("ok"), col("d2r")).otherwise(lit(1.0)).as("d2"),
        when(col("ok"), col("d3r")).otherwise(lit(1.5)).as("d3"),
        col("ok").as("estimated"))
    val u1 = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"),
        sum(when(col("c12") === 1, lit(1L)).otherwise(lit(0L))).as("nn1"),
        sum(when(col("c12") === 2, lit(1L)).otherwise(lit(0L))).as("nn2"),
        sum(when(col("c12") >= 3, lit(1L)).otherwise(lit(0L))).as("nn3"))
      .crossJoin(broadcast(meta.select(col("d1"), col("d2"), col("d3"))))
      .select(col("w1"), col("c1"),
        (col("d1") * col("nn1") + col("d2") * col("nn2") +
          col("d3") * col("nn3")).as("g"))
    val cont = c12.groupBy(col("w2")).agg(count(lit(1)).as("nc"))
      .crossJoin(broadcast(meta.select(col("v"), col("du"))))
      .select(col("w2"),
        ((lit(4) * col("nc") - lit(3)) * col("v") + lit(3) * col("du"))
          .as("pcnum"))
    val lm = c12.join(u1, "w1").join(cont, "w2").crossJoin(broadcast(meta))
      .select(col("w1"), col("w2"),
        lpMicro(
          (col("c12") - when(col("c12") === 1, col("d1"))
            .when(col("c12") === 2, col("d2"))
            .otherwise(col("d3"))) * col("pcden") +
            col("g") * col("pcnum"),
          col("c1") * col("pcden")).as("lp"))
    (lm, u1, cont, meta)
  }

  /** Per-document MODIFIED-KN surprisal of `docs` under the model of
    * `train` — q13's form of [[surprisalKn]], same output columns.
    * Interpolation arms: seen bigram → tier-discounted estimate; seen
    * w1 → γ(w1)-weighted continuation backoff; unseen w1 → the
    * continuation distribution itself. */
  def surprisalMkn(train: DataFrame, docs: DataFrame,
                   textCol: String = "text"): DataFrame = {
    val (lm, u1, cont, meta) = trainMknBigram(train, textCol)
    bigrams(docs, textCol)
      .join(lm, Seq("w1", "w2"), "left")
      .join(u1, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(meta))
      .select(col("doc_id"),
        when(col("lp").isNotNull, col("lp"))
          .when(col("c1").isNotNull,
            lpMicro(col("g") * coalesce(col("pcnum"), col("pcnum_unk")),
              col("c1") * col("pcden")))
          .otherwise(lpMicro(coalesce(col("pcnum"), col("pcnum_unk")),
            col("pcden"))).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("logp_micro"))
      .withColumn("surprisal",
        -col("logp_micro").cast("double") / col("n_bigrams"))
  }

  /** DuckDB twin of [[surprisalMkn]] with distinct train/score
    * relations, ending in CTE `mscored`. Discount arithmetic mirrors
    * the Spark side's association term for term (left-assoc products,
    * integer operands promoted to double at the same nodes). */
  def surprisalMknSql(trainFrom: String, scoreFrom: String,
                      textExpr: String = "text"): String =
    s"""mbt AS (${bigramsSql(trainFrom, textExpr)}),
       |mc12 AS (SELECT w1, w2, count(*) AS c12 FROM mbt GROUP BY 1, 2),
       |mmeta AS (
       |  SELECT t, du, du + 1.0 AS v, 4.0 * t * (du + 1.0) AS pcden,
       |         3 * du AS pcnum_unk,
       |         CASE WHEN ok THEN d1r ELSE 0.5 END AS d1,
       |         CASE WHEN ok THEN d2r ELSE 1.0 END AS d2,
       |         CASE WHEN ok THEN d3r ELSE 1.5 END AS d3
       |  FROM (SELECT t, du, d1r, d2r, d3r,
       |               n1 > 0 AND n2 > 0 AND n3 > 0 AND n4 > 0
       |               AND d1r >= 0 AND d1r <= 1 AND d2r >= 0 AND d2r <= 2
       |               AND d3r >= 0 AND d3r <= 3 AS ok
       |        FROM (SELECT t, du, n1, n2, n3, n4,
       |                     1.0 - 2.0 * y * n2 / GREATEST(n1, 1) AS d1r,
       |                     2.0 - 3.0 * y * n3 / GREATEST(n2, 1) AS d2r,
       |                     3.0 - 4.0 * y * n4 / GREATEST(n3, 1) AS d3r
       |              FROM (SELECT t, du, n1, n2, n3, n4,
       |                           n1 / GREATEST(n1 + 2.0 * n2, 1.0) AS y
       |                    FROM (SELECT CAST(count(*) AS DOUBLE) AS t,
       |                                 CAST(count(DISTINCT w2) AS DOUBLE) AS du,
       |                                 CAST(sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |                                 CAST(sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |                                 CAST(sum(CASE WHEN c12 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |                                 CAST(sum(CASE WHEN c12 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
       |                          FROM mc12))))),
       |mu1 AS (
       |  SELECT w1, c1, d1 * nn1 + d2 * nn2 + d3 * nn3 AS g
       |  FROM (SELECT w1, sum(c12) AS c1,
       |               CAST(sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nn1,
       |               CAST(sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS nn2,
       |               CAST(sum(CASE WHEN c12 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS nn3
       |        FROM mc12 GROUP BY 1)
       |  CROSS JOIN mmeta),
       |mcont AS (SELECT w2, (4 * nc - 3) * v + 3 * du AS pcnum
       |          FROM (SELECT w2, count(*) AS nc FROM mc12 GROUP BY 1)
       |          CROSS JOIN mmeta),
       |mlm AS (SELECT mc12.w1, mc12.w2,
       |          ${lpMicroSql(
             "(c12 - CASE WHEN c12 = 1 THEN d1 WHEN c12 = 2 THEN d2 " +
               "ELSE d3 END) * pcden + g * pcnum",
             "c1 * pcden")} AS lp
       |        FROM mc12 JOIN mu1 USING (w1) JOIN mcont USING (w2)
       |        CROSS JOIN mmeta),
       |mbs AS (${bigramsSql(scoreFrom, textExpr)}),
       |mscored AS (
       |  SELECT doc_id, count(*) AS n_bigrams,
       |         CAST(sum(lp) AS BIGINT) AS logp_micro,
       |         -CAST(sum(lp) AS DOUBLE) / count(*) AS surprisal
       |  FROM (SELECT mbs.doc_id,
       |          CASE WHEN mlm.lp IS NOT NULL THEN mlm.lp
       |               WHEN mu1.c1 IS NOT NULL THEN
       |                 ${lpMicroSql(
             "g * COALESCE(pcnum, pcnum_unk)", "c1 * pcden")}
       |               ELSE ${lpMicroSql(
             "COALESCE(pcnum, pcnum_unk)", "pcden")} END AS lp
       |        FROM mbs LEFT JOIN mlm USING (w1, w2)
       |                 LEFT JOIN mu1 USING (w1)
       |                 LEFT JOIN mcont USING (w2)
       |                 CROSS JOIN mmeta) s
       |  GROUP BY doc_id)""".stripMargin.replace("\n", " ")

  /** |langs| KN models in ONE pass — the per-language twin of
    * [[trainKnBigram]]/[[surprisalKn]] for the c15 gate, built the
    * [[trainBigramPerLang]] way: `lang` simply joins every aggregation
    * and join key, so training all models is the SAME shuffles as one
    * and scoring stays one corpus-keyed pass (meta/cont/u1 re-aggregate
    * the checkpointed count table; the meta join is a #langs-row
    * broadcast). Train = score = `docs` (doc_id, lang, textCol);
    * output (doc_id, lang, n_bigrams, logp_micro, surprisal). */
  def surprisalKnPerLang(docs: DataFrame,
                         textCol: String = "text"): DataFrame = {
    val (lm, u1, cont, meta) = trainKnBigramPerLang(docs, textCol)
    scoreKnPerLang(bigramsPerLang(docs, textCol), lm, u1, cont, meta)
  }

  /** The |langs|-models-in-one-pass KN trainer behind
    * [[surprisalKnPerLang]] and [[saveKnLmPerLang]]: returns
    * (lm, u1, cont, meta), every table lang-keyed. */
  def trainKnBigramPerLang(train: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val c12 = bigramsPerLang(train, textCol)
      .groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val u1 = c12.groupBy(col("lang"), col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
    val cont0 = c12.groupBy(col("lang"), col("w2"))
      .agg(count(lit(1)).as("nc"))
    val meta = c12.groupBy(col("lang"))
      .agg(count(lit(1)).cast("double").as("t"),
        countDistinct(col("w2")).cast("double").as("du"))
      .select(col("lang"), col("t"), col("du"),
        (col("du") + lit(1.0)).as("v"),
        (lit(4.0) * col("t") * (col("du") + lit(1.0))).as("pcden"),
        (lit(3) * col("du")).as("pcnum_unk"))
    val cont = cont0
      .join(broadcast(meta.select(col("lang"), col("v"), col("du"))), "lang")
      .select(col("lang"), col("w2"),
        ((lit(4) * col("nc") - lit(3)) * col("v") + lit(3) * col("du"))
          .as("pcnum"))
    val lm = c12.join(u1, Seq("lang", "w1")).join(cont, Seq("lang", "w2"))
      .join(broadcast(meta), "lang")
      .select(col("lang"), col("w1"), col("w2"),
        lpMicro(
          (lit(4) * col("c12") - lit(3)) * col("pcden") +
            lit(3) * col("n1p") * col("pcnum"),
          lit(4) * col("c1") * col("pcden")).as("lp"))
    (lm, u1, cont, meta)
  }

  /** Shared per-language KN scoring tail ([[knLpRows]] + the per-(doc,
    * lang) BIGINT sum); a scoring language with no model takes the 0L
    * no-opinion arm, [[scorePerLang]]'s rule. */
  private def scoreKnPerLang(bg: DataFrame, lm: DataFrame, u1: DataFrame,
                             cont: DataFrame, meta: DataFrame): DataFrame =
    foldKnPerLang(knLpRows(bg, lm, u1, cont, meta, langKeyed = true))

  /** The per-(doc, lang) fold over a KN transition stream — shared by
    * the batch scorers and (as the batch half of the equality spec) the
    * streaming enrich, which runs the same sum in a stateless group
    * shell instead of groupBy. */
  private def foldKnPerLang(rows: DataFrame): DataFrame =
    rows
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("logp_micro"))
      .withColumn("surprisal",
        -col("logp_micro").cast("double") / col("n_bigrams"))

  /** Per-transition KN (doc_id, lang, lp) against the persisted
    * per-language KN models at `path` — the KN twin of
    * [[lpRowsPerLang]], shared by [[surprisalKnAgainstLmPerLang]] and
    * the streaming enrich
    * (graft.streaming.DocStreams.lmScoreEnrichKnPerLang) so the batch
    * and continuous curation paths gate on the SAME estimator and
    * cannot drift. A scoring language with no model takes the 0L arm. */
  def lpRowsKnPerLang(docs: DataFrame,
                      spark: org.apache.spark.sql.SparkSession,
                      path: String, textCol: String = "text"): DataFrame = {
    val (lm, u1, cont, meta) = loadKnLmPerLang(spark, path)
    knLpRows(bigramsPerLang(docs, textCol), lm, u1, cont, meta,
      langKeyed = true)
  }

  /** Persist PER-LANGUAGE KN models at `path` — [[saveLmPerLang]]'s
    * layout for the KN estimator: `kn_bigrams/`, `kn_u1/`, `kn_cont/`
    * lang-PARTITIONED, `kn_meta/` one row per lang. Same plain-
    * overwrite retrain-not-patch semantics (continuation counts are
    * corpus globals — no partial update preserves them); atomic
    * replacement of a LIVE model rides
    * [[Maintenance.retrainAndSwap]]. */

  /** Stated persisted-model table layouts: every load call skips
    * parquet schema inference (a footer read + driver merge per
    * table), and `lang STRING` in the stated schema does what the old
    * partition-type-inference toggle did — a numeric language code can
    * never load as an integer partition column. */
  private def rd(spark: org.apache.spark.sql.SparkSession, ddl: String,
                 path: String): DataFrame =
    spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
      .parquet(path)

  def saveKnLmPerLang(train: DataFrame, path: String,
                      textCol: String = "text"): Unit = {
    val (lm, u1, cont, meta) = trainKnBigramPerLang(train, textCol)
    lm.write.mode("overwrite").partitionBy("lang").parquet(s"$path/kn_bigrams")
    u1.write.mode("overwrite").partitionBy("lang").parquet(s"$path/kn_u1")
    cont.write.mode("overwrite").partitionBy("lang").parquet(s"$path/kn_cont")
    meta.coalesce(1).write.mode("overwrite").parquet(s"$path/kn_meta")
  }

  /** (lm, u1, cont, meta) at `path`; schemas stated (see [[rd]]), so
    * a numeric lang code still loads as STRING. */
  def loadKnLmPerLang(spark: org.apache.spark.sql.SparkSession, path: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    (rd(spark, "w1 STRING, w2 STRING, lp BIGINT, lang STRING", s"$path/kn_bigrams"),
      rd(spark, "w1 STRING, c1 BIGINT, n1p BIGINT, lang STRING", s"$path/kn_u1"),
      rd(spark, "w2 STRING, pcnum DOUBLE, lang STRING", s"$path/kn_cont"),
      rd(spark, "lang STRING, t DOUBLE, du DOUBLE, v DOUBLE, pcden DOUBLE, " +
        "pcnum_unk DOUBLE", s"$path/kn_meta"))

  /** Score `docs` (doc_id, lang, textCol) against the persisted
    * per-language KN models at `path`; equals [[surprisalKnPerLang]]
    * row for row when the artifact was saved from the same corpus
    * (spec-pinned), with the lp-0 no-opinion arm for model-less
    * languages. */
  def surprisalKnAgainstLmPerLang(docs: DataFrame,
                                  spark: org.apache.spark.sql.SparkSession,
                                  path: String,
                                  textCol: String = "text"): DataFrame =
    foldKnPerLang(lpRowsKnPerLang(docs, spark, path, textCol))

  /** DuckDB twin of [[surprisalKnPerLang]] (train = score = `from`),
    * ending in `kscored_pl` (doc_id, lang, n_bigrams, logp_micro,
    * surprisal). */
  def surprisalKnPerLangSql(from: String, textExpr: String = "text"): String = {
    val toks = TF.wsTokensSql(s"lower($textExpr)")
    s"""kbl AS (
       |  SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
       |  FROM (SELECT doc_id, lang, $toks AS t FROM $from) d,
       |       LATERAL (SELECT unnest(range(1, len(t))) AS i) g
       |  WHERE len(t) >= 2),
       |kc12l AS (SELECT lang, w1, w2, count(*) AS c12
       |          FROM kbl GROUP BY 1, 2, 3),
       |ku1l AS (SELECT lang, w1, sum(c12) AS c1, count(*) AS n1p
       |         FROM kc12l GROUP BY 1, 2),
       |kmetal AS (SELECT lang, t, du, du + 1.0 AS v,
       |                  4.0 * t * (du + 1.0) AS pcden, 3 * du AS pcnum_unk
       |           FROM (SELECT lang, CAST(count(*) AS DOUBLE) AS t,
       |                        CAST(count(DISTINCT w2) AS DOUBLE) AS du
       |                 FROM kc12l GROUP BY 1)),
       |kcontl AS (SELECT lang, w2, (4 * nc - 3) * v + 3 * du AS pcnum
       |           FROM (SELECT lang, w2, count(*) AS nc
       |                 FROM kc12l GROUP BY 1, 2)
       |           JOIN kmetal USING (lang)),
       |klml AS (SELECT kc12l.lang, kc12l.w1, kc12l.w2,
       |           ${lpMicroSql(
             "(4 * c12 - 3) * pcden + 3 * n1p * pcnum",
             "4 * c1 * pcden")} AS lp
       |         FROM kc12l JOIN ku1l USING (lang, w1)
       |                    JOIN kcontl USING (lang, w2)
       |                    JOIN kmetal USING (lang)),
       |kscored_pl AS (
       |  SELECT doc_id, lang, count(*) AS n_bigrams,
       |         CAST(sum(lp) AS BIGINT) AS logp_micro,
       |         -CAST(sum(lp) AS DOUBLE) / count(*) AS surprisal
       |  FROM (SELECT g.doc_id, g.lang,
       |          COALESCE(
       |            CASE WHEN klml.lp IS NOT NULL THEN klml.lp
       |                 WHEN ku1l.c1 IS NOT NULL THEN
       |                   ${lpMicroSql(
             "3 * n1p * COALESCE(pcnum, pcnum_unk)",
             "4 * c1 * pcden")}
       |                 ELSE ${lpMicroSql(
             "COALESCE(pcnum, pcnum_unk)", "pcden")} END,
       |            0) AS lp
       |        FROM kbl g LEFT JOIN klml USING (lang, w1, w2)
       |                   LEFT JOIN ku1l USING (lang, w1)
       |                   LEFT JOIN kcontl USING (lang, w2)
       |                   LEFT JOIN kmetal USING (lang)) s
       |  GROUP BY doc_id, lang)""".stripMargin.replace("\n", " ")
  }

  /** DuckDB twin of [[surprisalKnAgainstLmPerLang]] — per-language KN
    * models trained on `trainFrom`, scored over `scoreFrom` (both need
    * doc_id, lang, textExpr). DuckDB cannot read the persisted model
    * dir, so the twin re-derives the SAME deterministic models from
    * the same train slice (save≡train is LmScoreSpec-pinned — the
    * c9/c12 pattern). Ends in `kscored_pl`; the trailing COALESCE-0
    * arm mirrors the no-model-for-this-language rule. */
  def surprisalKnPerLangTrainScoreSql(trainFrom: String, scoreFrom: String,
                                      textExpr: String = "text"): String = {
    val toks = TF.wsTokensSql(s"lower($textExpr)")
    def bgl(alias: String, from: String) =
      s"""$alias AS (
         |  SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
         |  FROM (SELECT doc_id, lang, $toks AS t FROM $from) d,
         |       LATERAL (SELECT unnest(range(1, len(t))) AS i) g
         |  WHERE len(t) >= 2)""".stripMargin
    s"""${bgl("kblt", trainFrom)},
       |kc12l AS (SELECT lang, w1, w2, count(*) AS c12
       |          FROM kblt GROUP BY 1, 2, 3),
       |ku1l AS (SELECT lang, w1, sum(c12) AS c1, count(*) AS n1p
       |         FROM kc12l GROUP BY 1, 2),
       |kmetal AS (SELECT lang, t, du, du + 1.0 AS v,
       |                  4.0 * t * (du + 1.0) AS pcden, 3 * du AS pcnum_unk
       |           FROM (SELECT lang, CAST(count(*) AS DOUBLE) AS t,
       |                        CAST(count(DISTINCT w2) AS DOUBLE) AS du
       |                 FROM kc12l GROUP BY 1)),
       |kcontl AS (SELECT lang, w2, (4 * nc - 3) * v + 3 * du AS pcnum
       |           FROM (SELECT lang, w2, count(*) AS nc
       |                 FROM kc12l GROUP BY 1, 2)
       |           JOIN kmetal USING (lang)),
       |klml AS (SELECT kc12l.lang, kc12l.w1, kc12l.w2,
       |           ${lpMicroSql(
             "(4 * c12 - 3) * pcden + 3 * n1p * pcnum",
             "4 * c1 * pcden")} AS lp
       |         FROM kc12l JOIN ku1l USING (lang, w1)
       |                    JOIN kcontl USING (lang, w2)
       |                    JOIN kmetal USING (lang)),
       |${bgl("kbls", scoreFrom)},
       |kscored_pl AS (
       |  SELECT doc_id, lang, count(*) AS n_bigrams,
       |         CAST(sum(lp) AS BIGINT) AS logp_micro,
       |         -CAST(sum(lp) AS DOUBLE) / count(*) AS surprisal
       |  FROM (SELECT g.doc_id, g.lang,
       |          COALESCE(
       |            CASE WHEN klml.lp IS NOT NULL THEN klml.lp
       |                 WHEN ku1l.c1 IS NOT NULL THEN
       |                   ${lpMicroSql(
             "3 * n1p * COALESCE(pcnum, pcnum_unk)",
             "4 * c1 * pcden")}
       |                 ELSE ${lpMicroSql(
             "COALESCE(pcnum, pcnum_unk)", "pcden")} END,
       |            0) AS lp
       |        FROM kbls g LEFT JOIN klml USING (lang, w1, w2)
       |                    LEFT JOIN ku1l USING (lang, w1)
       |                    LEFT JOIN kcontl USING (lang, w2)
       |                    LEFT JOIN kmetal USING (lang)) s
       |  GROUP BY doc_id, lang)""".stripMargin.replace("\n", " ")
  }

  // ------------------------------ modified KN, per language (c19)

  /** |langs| MODIFIED-KN models in ONE pass — [[trainMknBigram]] the
    * [[trainKnBigramPerLang]] way: `lang` joins every aggregation and
    * join key, so training all models is the SAME two hash-agg
    * shuffles as one (count-of-counts, tier counts, and discounts are
    * all re-aggregations of the ONE checkpointed count table), and
    * each language derives ITS OWN D₁/D₂/D₃₊ from its own count
    * spectrum — or takes KenLM's `--discount_fallback` 0.5/1/1.5
    * independently (a thin language's degenerate spectrum must not
    * poison a rich one's estimated discounts). Returns (lm, u1, cont,
    * meta), every table lang-keyed; u1 carries the per-context
    * redistributed mass γ(w1) = D₁·N₁(w1) + D₂·N₂(w1) + D₃₊·N₃₊(w1)
    * pre-folded so scoring's per-row arithmetic stays one
    * multiply-add. */
  def trainMknBigramPerLang(train: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val c12 = bigramsPerLang(train, textCol)
      .groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val meta = c12.groupBy(col("lang"))
      .agg(count(lit(1)).cast("double").as("t"),
        countDistinct(col("w2")).cast("double").as("du"),
        sum(when(col("c12") === 1, lit(1L)).otherwise(lit(0L))).as("n1"),
        sum(when(col("c12") === 2, lit(1L)).otherwise(lit(0L))).as("n2"),
        sum(when(col("c12") === 3, lit(1L)).otherwise(lit(0L))).as("n3"),
        sum(when(col("c12") === 4, lit(1L)).otherwise(lit(0L))).as("n4"))
      .withColumn("y",
        col("n1") / greatest(col("n1") + lit(2.0) * col("n2"), lit(1.0)))
      .withColumn("d1r", lit(1.0) -
        lit(2.0) * col("y") * col("n2") / greatest(col("n1"), lit(1L)))
      .withColumn("d2r", lit(2.0) -
        lit(3.0) * col("y") * col("n3") / greatest(col("n2"), lit(1L)))
      .withColumn("d3r", lit(3.0) -
        lit(4.0) * col("y") * col("n4") / greatest(col("n3"), lit(1L)))
      .withColumn("ok",
        col("n1") > 0 && col("n2") > 0 && col("n3") > 0 && col("n4") > 0 &&
          col("d1r") >= 0 && col("d1r") <= 1 &&
          col("d2r") >= 0 && col("d2r") <= 2 &&
          col("d3r") >= 0 && col("d3r") <= 3)
      .select(col("lang"), col("t"), col("du"),
        (col("du") + lit(1.0)).as("v"),
        (lit(4.0) * col("t") * (col("du") + lit(1.0))).as("pcden"),
        (lit(3) * col("du")).as("pcnum_unk"),
        when(col("ok"), col("d1r")).otherwise(lit(0.5)).as("d1"),
        when(col("ok"), col("d2r")).otherwise(lit(1.0)).as("d2"),
        when(col("ok"), col("d3r")).otherwise(lit(1.5)).as("d3"),
        col("ok").as("estimated"))
    val u1 = c12.groupBy(col("lang"), col("w1"))
      .agg(sum(col("c12")).as("c1"),
        sum(when(col("c12") === 1, lit(1L)).otherwise(lit(0L))).as("nn1"),
        sum(when(col("c12") === 2, lit(1L)).otherwise(lit(0L))).as("nn2"),
        sum(when(col("c12") >= 3, lit(1L)).otherwise(lit(0L))).as("nn3"))
      .join(broadcast(
        meta.select(col("lang"), col("d1"), col("d2"), col("d3"))), "lang")
      .select(col("lang"), col("w1"), col("c1"),
        (col("d1") * col("nn1") + col("d2") * col("nn2") +
          col("d3") * col("nn3")).as("g"))
    val cont = c12.groupBy(col("lang"), col("w2"))
      .agg(count(lit(1)).as("nc"))
      .join(broadcast(meta.select(col("lang"), col("v"), col("du"))), "lang")
      .select(col("lang"), col("w2"),
        ((lit(4) * col("nc") - lit(3)) * col("v") + lit(3) * col("du"))
          .as("pcnum"))
    val lm = c12.join(u1, Seq("lang", "w1")).join(cont, Seq("lang", "w2"))
      .join(broadcast(meta), "lang")
      .select(col("lang"), col("w1"), col("w2"),
        lpMicro(
          (col("c12") - when(col("c12") === 1, col("d1"))
            .when(col("c12") === 2, col("d2"))
            .otherwise(col("d3"))) * col("pcden") +
            col("g") * col("pcnum"),
          col("c1") * col("pcden")).as("lp"))
    (lm, u1, cont, meta)
  }

  /** Shared per-transition MODIFIED-KN scorer — [[knLpRows]]'s shape
    * with q13's arms (seen bigram → tier-discounted estimate; seen w1
    * → γ(w1)-weighted continuation backoff; unseen w1 → the
    * continuation distribution itself; trailing 0L no-model arm in
    * lang-keyed splits). [[surprisalMkn]] keeps its own inline twin of
    * the non-keyed arms (its plan predates this helper and is
    * oracle-gated as q13 — identical expressions). */
  private def mknLpRows(bg: DataFrame, lm: DataFrame, u1: DataFrame,
                        cont: DataFrame, meta: DataFrame): DataFrame = {
    val joined = bg.join(lm, Seq("lang", "w1", "w2"), "left")
      .join(u1, Seq("lang", "w1"), "left")
      .join(cont, Seq("lang", "w2"), "left")
      .join(broadcast(meta), Seq("lang"), "left")
    val pcnumC = coalesce(col("pcnum"), col("pcnum_unk"))
    joined.select(col("doc_id"), col("lang"),
      coalesce(
        when(col("lp").isNotNull, col("lp"))
          .when(col("c1").isNotNull,
            lpMicro(col("g") * pcnumC, col("c1") * col("pcden")))
          .otherwise(lpMicro(pcnumC, col("pcden"))),
        lit(0L)).as("lp"))
  }

  /** |langs| modified-KN models trained and scored in one pass —
    * train = score = `docs` (doc_id, lang, textCol); output (doc_id,
    * lang, n_bigrams, logp_micro, surprisal). The c19 gate's
    * self-trained form and the save≡train reference. */
  def surprisalMknPerLang(docs: DataFrame,
                          textCol: String = "text"): DataFrame = {
    val (lm, u1, cont, meta) = trainMknBigramPerLang(docs, textCol)
    foldKnPerLang(mknLpRows(bigramsPerLang(docs, textCol),
      lm, u1, cont, meta))
  }

  /** Persist PER-LANGUAGE MODIFIED-KN models at `path` —
    * [[saveKnLmPerLang]]'s layout for q13's estimator: `mkn_bigrams/`,
    * `mkn_u1/`, `mkn_cont/` lang-PARTITIONED, `mkn_meta/` one row per
    * lang (its per-language D₁/D₂/D₃₊ and the `estimated` flag ride
    * along — an operator can see at a glance which languages fell back
    * to 0.5/1/1.5). Retrain-not-patch like every LM family; atomic
    * replacement of a LIVE model rides [[Maintenance.retrainAndSwap]],
    * whose nightly detects the `mkn_bigrams/` root. */
  def saveMknLmPerLang(train: DataFrame, path: String,
                       textCol: String = "text"): Unit = {
    val (lm, u1, cont, meta) = trainMknBigramPerLang(train, textCol)
    lm.write.mode("overwrite").partitionBy("lang")
      .parquet(s"$path/mkn_bigrams")
    u1.write.mode("overwrite").partitionBy("lang").parquet(s"$path/mkn_u1")
    cont.write.mode("overwrite").partitionBy("lang")
      .parquet(s"$path/mkn_cont")
    meta.coalesce(1).write.mode("overwrite").parquet(s"$path/mkn_meta")
  }

  /** (lm, u1, cont, meta) at `path`; partition-column type inference
    * disabled for the same numeric-lang-code reason as
    * [[loadLmPerLang]]. */
  def loadMknLmPerLang(spark: org.apache.spark.sql.SparkSession,
                       path: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    (rd(spark, "w1 STRING, w2 STRING, lp BIGINT, lang STRING", s"$path/mkn_bigrams"),
      rd(spark, "w1 STRING, c1 BIGINT, g DOUBLE, lang STRING", s"$path/mkn_u1"),
      rd(spark, "w2 STRING, pcnum DOUBLE, lang STRING", s"$path/mkn_cont"),
      rd(spark, "lang STRING, t DOUBLE, du DOUBLE, v DOUBLE, pcden DOUBLE, " +
        "pcnum_unk DOUBLE, d1 DOUBLE, d2 DOUBLE, d3 DOUBLE, estimated BOOLEAN",
        s"$path/mkn_meta"))

  /** Per-transition modified-KN (doc_id, lang, lp) against the
    * persisted per-language models at `path` — shared by
    * [[surprisalMknAgainstLmPerLang]] and the streaming enrich
    * (graft.streaming.DocStreams.lmScoreEnrichMknPerLang) so batch and
    * continuous curation gate on the SAME estimator and cannot drift.
    * A scoring language with no model takes the 0L arm. */
  def lpRowsMknPerLang(docs: DataFrame,
                       spark: org.apache.spark.sql.SparkSession,
                       path: String, textCol: String = "text"): DataFrame = {
    val (lm, u1, cont, meta) = loadMknLmPerLang(spark, path)
    mknLpRows(bigramsPerLang(docs, textCol), lm, u1, cont, meta)
  }

  /** Score `docs` (doc_id, lang, textCol) against the persisted
    * per-language modified-KN models at `path`; equals
    * [[surprisalMknPerLang]] row for row when the artifact was saved
    * from the same corpus (spec-pinned), with the lp-0 no-opinion arm
    * for model-less languages. */
  def surprisalMknAgainstLmPerLang(docs: DataFrame,
                                   spark: org.apache.spark.sql.SparkSession,
                                   path: String,
                                   textCol: String = "text"): DataFrame =
    foldKnPerLang(lpRowsMknPerLang(docs, spark, path, textCol))

  /** DuckDB twin of [[surprisalMknAgainstLmPerLang]] — per-language
    * MODIFIED-KN models trained on `trainFrom`, scored over
    * `scoreFrom` (both need doc_id, lang, textExpr). DuckDB cannot
    * read the persisted model dir, so the twin re-derives the SAME
    * deterministic models from the same train slice (save≡train is
    * LmScoreSpec-pinned — the c12/c17 pattern). Discount arithmetic
    * mirrors [[trainMknBigramPerLang]]'s association term for term,
    * per language; ends in `mscored_pl`; the trailing COALESCE-0 arm
    * mirrors the no-model-for-this-language rule. */
  def surprisalMknPerLangTrainScoreSql(trainFrom: String, scoreFrom: String,
                                       textExpr: String = "text"): String = {
    val toks = TF.wsTokensSql(s"lower($textExpr)")
    def bgl(alias: String, from: String) =
      s"""$alias AS (
         |  SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
         |  FROM (SELECT doc_id, lang, $toks AS t FROM $from) d,
         |       LATERAL (SELECT unnest(range(1, len(t))) AS i) g
         |  WHERE len(t) >= 2)""".stripMargin
    s"""${bgl("mblt", trainFrom)},
       |mc12l AS (SELECT lang, w1, w2, count(*) AS c12
       |          FROM mblt GROUP BY 1, 2, 3),
       |mmetal AS (
       |  SELECT lang, t, du, du + 1.0 AS v, 4.0 * t * (du + 1.0) AS pcden,
       |         3 * du AS pcnum_unk,
       |         CASE WHEN ok THEN d1r ELSE 0.5 END AS d1,
       |         CASE WHEN ok THEN d2r ELSE 1.0 END AS d2,
       |         CASE WHEN ok THEN d3r ELSE 1.5 END AS d3
       |  FROM (SELECT lang, t, du, d1r, d2r, d3r,
       |               n1 > 0 AND n2 > 0 AND n3 > 0 AND n4 > 0
       |               AND d1r >= 0 AND d1r <= 1 AND d2r >= 0 AND d2r <= 2
       |               AND d3r >= 0 AND d3r <= 3 AS ok
       |        FROM (SELECT lang, t, du, n1, n2, n3, n4,
       |                     1.0 - 2.0 * y * n2 / GREATEST(n1, 1) AS d1r,
       |                     2.0 - 3.0 * y * n3 / GREATEST(n2, 1) AS d2r,
       |                     3.0 - 4.0 * y * n4 / GREATEST(n3, 1) AS d3r
       |              FROM (SELECT lang, t, du, n1, n2, n3, n4,
       |                           n1 / GREATEST(n1 + 2.0 * n2, 1.0) AS y
       |                    FROM (SELECT lang,
       |                                 CAST(count(*) AS DOUBLE) AS t,
       |                                 CAST(count(DISTINCT w2) AS DOUBLE) AS du,
       |                                 CAST(sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |                                 CAST(sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       |                                 CAST(sum(CASE WHEN c12 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
       |                                 CAST(sum(CASE WHEN c12 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
       |                          FROM mc12l GROUP BY 1))))),
       |mu1l AS (
       |  SELECT lang, w1, c1, d1 * nn1 + d2 * nn2 + d3 * nn3 AS g
       |  FROM (SELECT lang, w1, sum(c12) AS c1,
       |               CAST(sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nn1,
       |               CAST(sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS nn2,
       |               CAST(sum(CASE WHEN c12 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS nn3
       |        FROM mc12l GROUP BY 1, 2)
       |  JOIN mmetal USING (lang)),
       |mcontl AS (SELECT lang, w2, (4 * nc - 3) * v + 3 * du AS pcnum
       |           FROM (SELECT lang, w2, count(*) AS nc
       |                 FROM mc12l GROUP BY 1, 2)
       |           JOIN mmetal USING (lang)),
       |mlml AS (SELECT mc12l.lang, mc12l.w1, mc12l.w2,
       |           ${lpMicroSql(
             "(c12 - CASE WHEN c12 = 1 THEN d1 WHEN c12 = 2 THEN d2 " +
               "ELSE d3 END) * pcden + g * pcnum",
             "c1 * pcden")} AS lp
       |         FROM mc12l JOIN mu1l USING (lang, w1)
       |                    JOIN mcontl USING (lang, w2)
       |                    JOIN mmetal USING (lang)),
       |${bgl("mbls", scoreFrom)},
       |mscored_pl AS (
       |  SELECT doc_id, lang, count(*) AS n_bigrams,
       |         CAST(sum(lp) AS BIGINT) AS logp_micro,
       |         -CAST(sum(lp) AS DOUBLE) / count(*) AS surprisal
       |  FROM (SELECT sc.doc_id, sc.lang,
       |          COALESCE(
       |            CASE WHEN mlml.lp IS NOT NULL THEN mlml.lp
       |                 WHEN mu1l.c1 IS NOT NULL THEN
       |                   ${lpMicroSql(
             "mu1l.g * COALESCE(pcnum, pcnum_unk)", "c1 * pcden")}
       |                 ELSE ${lpMicroSql(
             "COALESCE(pcnum, pcnum_unk)", "pcden")} END,
       |            0) AS lp
       |        FROM mbls sc LEFT JOIN mlml USING (lang, w1, w2)
       |                     LEFT JOIN mu1l USING (lang, w1)
       |                     LEFT JOIN mcontl USING (lang, w2)
       |                     LEFT JOIN mmetal USING (lang)) s
       |  GROUP BY doc_id, lang)""".stripMargin.replace("\n", " ")
  }

  /** TRIGRAM interpolated Kneser-Ney (q12) — [[surprisalKn]] one order
    * up, i.e. the actual KenLM recurrence shape at order 3 (KenLM runs
    * modified KN at order 5; this is interpolated KN with a single
    * rational discount d = 3/4 at every level):
    *
    *   P(w3|w1w2) = max(c123−d,0)/c12 + d·N1+(w1w2·)/c12 · Pm(w3|w2)
    *   Pm(w3|w2)  = max(cm−d,0)/cm2  + d·N1+(w2·)m/cm2  · Pb(w3)
    *   Pb(w3)     = max(nb−d,0)/TB   + d·DuB/TB · 1/V
    *
    * with the LOWER levels estimated from CONTINUATION counts, the KN
    * signature: cm(w2,w3) = |{w1 : (w1,w2,w3) seen}| (how many distinct
    * contexts the bigram continues, not how often it occurs), and
    * nb(w3) = |{w2 : cm(w2,w3) ≥ 1}|. Unseen (w1,w2) contexts score
    * Pm directly; unseen w2 scores Pb — a seen top context implies a
    * seen mid context (∃w3 ⇒ (w2,w3) in the mid table), so every arm
    * is total. The ×4-scaled numerators telescope exactly like
    * [[trainKnBigram]]'s (per-level sums equal the level denominator —
    * spec-pinned on hand counts), all products mirrored term for term
    * in the SQL twin. Scale shape: the trigram count table is the one
    * corpus-keyed shuffle (checkpointed, five consumers); mid/bot/meta
    * re-aggregate it; scoring is four left joins, broadcast-able at
    * saturated vocab. Output: (doc_id, n_trigrams, logp_micro,
    * surprisal). */
  def surprisalKnTrigram(train: DataFrame, docs: DataFrame,
                         textCol: String = "text"): DataFrame = {
    val kt3 = trigrams(train, textCol)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c123"))
      .localCheckpoint()
    val ktc = kt3.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c123")).as("c12t"), count(lit(1)).as("n1pt"))
    // mid level: continuation counts — distinct contexts per (w2,w3)
    val mid = kt3.groupBy(col("w2"), col("w3"))
      .agg(countDistinct(col("w1")).as("cm"))
    val mc = mid.groupBy(col("w2"))
      .agg(sum(col("cm")).as("cm2"), count(lit(1)).as("n1pm"))
    val metab = mid
      .agg(count(lit(1)).cast("double").as("tb"),
        countDistinct(col("w3")).cast("double").as("dub"))
      .select(col("tb"), col("dub"), (col("dub") + lit(1.0)).as("v"),
        (lit(4.0) * col("tb") * (col("dub") + lit(1.0))).as("pbden"),
        (lit(3) * col("dub")).as("pbnum_unk"))
    val pb = mid.groupBy(col("w3")).agg(count(lit(1)).as("nb"))
      .crossJoin(broadcast(metab.select(col("v"), col("dub"))))
      .select(col("w3"),
        ((lit(4) * col("nb") - lit(3)) * col("v") + lit(3) * col("dub"))
          .as("pbnum"))
    val pmden = mc.crossJoin(broadcast(metab.select(col("pbden"))))
      .select(col("w2"), col("n1pm"),
        (lit(4) * col("cm2") * col("pbden")).as("pmden"))
    val pm2 = mid.join(mc, "w2").join(pb, "w3")
      .crossJoin(broadcast(metab.select(col("pbden"))))
      .select(col("w2"), col("w3"),
        ((lit(4) * col("cm") - lit(3)) * col("pbden") +
          lit(3) * col("n1pm") * col("pbnum")).as("pmnum"))
    val lm3 = kt3.join(ktc, Seq("w1", "w2"))
      .join(pm2, Seq("w2", "w3"))
      .join(pmden.select(col("w2"), col("pmden")), "w2")
      .select(col("w1"), col("w2"), col("w3"),
        lpMicro(
          (lit(4) * col("c123") - lit(3)) * col("pmden") +
            lit(3) * col("n1pt") * col("pmnum"),
          lit(4) * col("c12t") * col("pmden")).as("lp3"))
    val pbnumX = coalesce(col("pbnum"), col("pbnum_unk"))
    val pmnumX = coalesce(col("pmnum"),
      lit(3) * col("n1pm") * pbnumX)
    trigrams(docs, textCol)
      .join(lm3, Seq("w1", "w2", "w3"), "left")
      .join(ktc, Seq("w1", "w2"), "left")
      .join(pm2, Seq("w2", "w3"), "left")
      .join(pmden.select(col("w2"), col("n1pm"), col("pmden")),
        Seq("w2"), "left")
      .join(pb, Seq("w3"), "left")
      .crossJoin(broadcast(metab.select(col("pbden"), col("pbnum_unk"))))
      .select(col("doc_id"),
        when(col("lp3").isNotNull, col("lp3"))
          .when(col("c12t").isNotNull,
            lpMicro(lit(3) * col("n1pt") * pmnumX,
              lit(4) * col("c12t") * col("pmden")))
          .when(col("pmden").isNotNull, lpMicro(pmnumX, col("pmden")))
          .otherwise(lpMicro(pbnumX, col("pbden"))).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("lp")).as("logp_micro"))
      .withColumn("surprisal",
        -col("logp_micro").cast("double") / col("n_trigrams"))
  }

  /** DuckDB twin of [[surprisalKnTrigram]] with distinct train/score
    * relations, ending in `ktscored`; term association mirrored. */
  def surprisalKnTrigramSql(trainFrom: String, scoreFrom: String,
                            textExpr: String = "text"): String = {
    val toks = TF.wsTokensSql(s"lower($textExpr)")
    def tgOf(alias: String, from: String) =
      s"""$alias AS (
         |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
         |  FROM (SELECT doc_id, $toks AS t FROM $from) d,
         |       LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) g
         |  WHERE len(t) >= 3)""".stripMargin
    s"""${tgOf("ktt", trainFrom)},
       |kt3 AS (SELECT w1, w2, w3, count(*) AS c123 FROM ktt GROUP BY 1, 2, 3),
       |ktc AS (SELECT w1, w2, sum(c123) AS c12t, count(*) AS n1pt
       |        FROM kt3 GROUP BY 1, 2),
       |kmid AS (SELECT w2, w3, count(DISTINCT w1) AS cm
       |         FROM kt3 GROUP BY 1, 2),
       |kmc AS (SELECT w2, sum(cm) AS cm2, count(*) AS n1pm
       |        FROM kmid GROUP BY 1),
       |kmetab AS (SELECT tb, dub, dub + 1.0 AS v,
       |                  4.0 * tb * (dub + 1.0) AS pbden,
       |                  3 * dub AS pbnum_unk
       |           FROM (SELECT CAST(count(*) AS DOUBLE) AS tb,
       |                        CAST(count(DISTINCT w3) AS DOUBLE) AS dub
       |                 FROM kmid)),
       |kpb AS (SELECT w3, (4 * nb - 3) * v + 3 * dub AS pbnum
       |        FROM (SELECT w3, count(*) AS nb FROM kmid GROUP BY 1)
       |        CROSS JOIN kmetab),
       |kpmden AS (SELECT w2, n1pm, 4 * cm2 * pbden AS pmden
       |           FROM kmc CROSS JOIN kmetab),
       |kpm AS (SELECT kmid.w2, kmid.w3,
       |          (4 * cm - 3) * pbden + 3 * n1pm * pbnum AS pmnum
       |        FROM kmid JOIN kmc USING (w2) JOIN kpb USING (w3)
       |        CROSS JOIN kmetab),
       |klm3 AS (SELECT kt3.w1, kt3.w2, kt3.w3,
       |           ${lpMicroSql(
             "(4 * c123 - 3) * pmden + 3 * n1pt * pmnum",
             "4 * c12t * pmden")} AS lp3
       |         FROM kt3 JOIN ktc USING (w1, w2)
       |                  JOIN kpm USING (w2, w3)
       |                  JOIN kpmden USING (w2)),
       |${tgOf("kts", scoreFrom)},
       |ktscored AS (
       |  SELECT doc_id, count(*) AS n_trigrams,
       |         CAST(sum(lp) AS BIGINT) AS logp_micro,
       |         -CAST(sum(lp) AS DOUBLE) / count(*) AS surprisal
       |  FROM (SELECT kts.doc_id,
       |          CASE WHEN klm3.lp3 IS NOT NULL THEN klm3.lp3
       |               WHEN ktc.c12t IS NOT NULL THEN
       |                 ${lpMicroSql(
             "3 * n1pt * COALESCE(pmnum, " +
               "3 * n1pm * COALESCE(pbnum, pbnum_unk))",
             "4 * c12t * pmden")}
       |               WHEN kpmden.pmden IS NOT NULL THEN
       |                 ${lpMicroSql(
             "COALESCE(pmnum, 3 * n1pm * COALESCE(pbnum, pbnum_unk))",
             "pmden")}
       |               ELSE ${lpMicroSql(
             "COALESCE(pbnum, pbnum_unk)", "pbden")} END AS lp
       |        FROM kts LEFT JOIN klm3 USING (w1, w2, w3)
       |                 LEFT JOIN ktc USING (w1, w2)
       |                 LEFT JOIN kpm USING (w2, w3)
       |                 LEFT JOIN kpmden USING (w2)
       |                 LEFT JOIN kpb USING (w3)
       |                 CROSS JOIN kmetab) s
       |  GROUP BY doc_id)""".stripMargin.replace("\n", " ")
  }

  /** PER-LANGUAGE bigram LMs in ONE pass (q7) — CCNet proper: one
    * model per language, each document scored under ITS OWN
    * language's model ([[surprisal]]/q6 train a single cross-language
    * model, which lets a dominant language's phrasing set the scale
    * for every other language's scores). Train = score = `docs`
    * ([[trainBigramPerLang]] + [[scorePerLang]]); the persisted
    * target-domain form is [[saveLmPerLang]] →
    * [[surprisalAgainstLmPerLang]]. Input needs (doc_id, lang,
    * textCol). Same micro-nat quantization, same BIGINT-sum
    * discipline as [[surprisal]]. */
  def surprisalPerLang(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val (lm, unk, v) = trainBigramPerLang(docs, textCol)
    val uni = v.select(col("lang"), lpMicro(lit(1.0), col("v")).as("lp_unseen"))
    scorePerLang(bigramsPerLang(docs, textCol), lm, unk, uni)
  }

  /** Persist PER-LANGUAGE target-domain models at `path` — the CCNet
    * prescription proper (one Wikipedia-style target LM per language):
    * `bigrams/` and `unigrams/` lang-PARTITIONED (a scorer for one
    * language prunes to its own partition), `meta/` one row per lang.
    * Same plain-overwrite, retrain-not-patch semantics as [[saveLm]];
    * atomic replacement of a LIVE model dir rides
    * [[Maintenance.retrainAndSwap]]. */
  def saveLmPerLang(train: DataFrame, path: String,
                    textCol: String = "text"): Unit = {
    val (lm, unk, v) = trainBigramPerLang(train, textCol)
    lm.write.mode("overwrite").partitionBy("lang").parquet(s"$path/bigrams")
    unk.write.mode("overwrite").partitionBy("lang").parquet(s"$path/unigrams")
    v.select(col("lang"), col("v"),
        lpMicro(lit(1.0), col("v")).as("lp_unseen"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** (bigram table, unigram-backoff table, per-lang meta) at `path`.
    * Schemas stated ([[rd]]): `lang STRING` keeps a numeric-looking
    * language code (e.g. "001") from loading as an integer partition
    * column, which would make the scorer's string-keyed `lang` join
    * silently match nothing. */
  def loadLmPerLang(spark: org.apache.spark.sql.SparkSession, path: String)
      : (DataFrame, DataFrame, DataFrame) = {
    (rd(spark, "w1 STRING, w2 STRING, lp BIGINT, lang STRING", s"$path/bigrams"),
      rd(spark, "w1 STRING, lp_unk BIGINT, lang STRING", s"$path/unigrams"),
      rd(spark, "lang STRING, v DOUBLE, lp_unseen BIGINT", s"$path/meta"))
  }

  /** Score `docs` (doc_id, lang, textCol) against the persisted
    * per-language models at `path` — the train/score split form the
    * [[scorePerLang]] 0L arm exists for: a scoring language with no
    * model partition gets lp 0 per transition ("no opinion"), never a
    * NULL-poisoned sum. Equals [[surprisalPerLang]] row for row when
    * the model was saved from the same corpus (spec-pinned). */
  def surprisalAgainstLmPerLang(docs: DataFrame,
                                spark: org.apache.spark.sql.SparkSession,
                                path: String,
                                textCol: String = "text"): DataFrame = {
    val (lm, unk, meta) = loadLmPerLang(spark, path)
    scorePerLang(bigramsPerLang(docs, textCol), lm, unk,
      meta.select(col("lang"), col("lp_unseen")))
  }

  /** DuckDB twin of [[surprisalPerLang]]: CTE chain ending in
    * `scored_pl` (doc_id, lang, n_bigrams, logp_micro, surprisal). */
  def surprisalPerLangSql(from: String, textExpr: String = "text"): String = {
    val toks = TF.wsTokensSql(s"lower($textExpr)")
    s"""bgl AS (
       |  SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
       |  FROM (SELECT doc_id, lang, $toks AS t FROM $from) d,
       |       LATERAL (SELECT unnest(range(1, len(t))) AS i) g
       |  WHERE len(t) >= 2),
       |c12l AS (SELECT lang, w1, w2, count(*) AS c12
       |         FROM bgl GROUP BY 1, 2, 3),
       |c1l AS (SELECT lang, w1, sum(c12) AS c1 FROM c12l GROUP BY 1, 2),
       |vl AS (SELECT lang, CAST(count(DISTINCT w2) + 1 AS DOUBLE) AS v
       |       FROM c12l GROUP BY 1),
       |lml AS (SELECT lang, w1, w2,
       |          ${lpMicroSql("c12 + 0.5", "c1 + 0.5*v")} AS lp
       |        FROM c12l JOIN c1l USING (lang, w1) JOIN vl USING (lang)),
       |unkl AS (SELECT lang, w1, ${lpMicroSql("0.5", "c1 + 0.5*v")} AS lp_unk
       |         FROM c1l JOIN vl USING (lang)),
       |unil AS (SELECT lang, ${lpMicroSql("1.0", "v")} AS lp_unseen FROM vl),
       |scored_pl AS (
       |  SELECT doc_id, lang, count(*) AS n_bigrams,
       |         CAST(sum(lp2) AS BIGINT) AS logp_micro,
       |         -CAST(sum(lp2) AS DOUBLE) / count(*) AS surprisal
       |  FROM (SELECT g.doc_id, g.lang,
       |          COALESCE(lml.lp, unkl.lp_unk, unil.lp_unseen, 0) AS lp2
       |        FROM bgl g
       |        LEFT JOIN lml USING (lang, w1, w2)
       |        LEFT JOIN unkl USING (lang, w1)
       |        LEFT JOIN unil USING (lang)) s
       |  GROUP BY doc_id, lang)""".stripMargin.replace("\n", " ")
  }

  /** DuckDB twin of [[surprisalAgainstLmPerLang]] — per-language
    * models trained on `trainFrom`, scored over `scoreFrom` (both
    * need doc_id, lang, textExpr). DuckDB cannot read the persisted
    * model dir, so the twin re-derives the SAME deterministic models
    * from the same train slice (save≡train is LmScoreSpec-pinned —
    * the c9 pattern). Ends in `scored_pl`; the trailing 0 COALESCE
    * arm mirrors [[scorePerLang]]'s no-model-for-this-language rule. */
  def surprisalPerLangTrainScoreSql(trainFrom: String, scoreFrom: String,
                                    textExpr: String = "text"): String = {
    val toks = TF.wsTokensSql(s"lower($textExpr)")
    def bgl(alias: String, from: String) =
      s"""$alias AS (
         |  SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
         |  FROM (SELECT doc_id, lang, $toks AS t FROM $from) d,
         |       LATERAL (SELECT unnest(range(1, len(t))) AS i) g
         |  WHERE len(t) >= 2)""".stripMargin
    s"""${bgl("bglt", trainFrom)},
       |c12l AS (SELECT lang, w1, w2, count(*) AS c12
       |         FROM bglt GROUP BY 1, 2, 3),
       |c1l AS (SELECT lang, w1, sum(c12) AS c1 FROM c12l GROUP BY 1, 2),
       |vl AS (SELECT lang, CAST(count(DISTINCT w2) + 1 AS DOUBLE) AS v
       |       FROM c12l GROUP BY 1),
       |lml AS (SELECT lang, w1, w2,
       |          ${lpMicroSql("c12 + 0.5", "c1 + 0.5*v")} AS lp
       |        FROM c12l JOIN c1l USING (lang, w1) JOIN vl USING (lang)),
       |unkl AS (SELECT lang, w1, ${lpMicroSql("0.5", "c1 + 0.5*v")} AS lp_unk
       |         FROM c1l JOIN vl USING (lang)),
       |unil AS (SELECT lang, ${lpMicroSql("1.0", "v")} AS lp_unseen FROM vl),
       |${bgl("bgls", scoreFrom)},
       |scored_pl AS (
       |  SELECT doc_id, lang, count(*) AS n_bigrams,
       |         CAST(sum(lp2) AS BIGINT) AS logp_micro,
       |         -CAST(sum(lp2) AS DOUBLE) / count(*) AS surprisal
       |  FROM (SELECT g.doc_id, g.lang,
       |          COALESCE(lml.lp, unkl.lp_unk, unil.lp_unseen, 0) AS lp2
       |        FROM bgls g
       |        LEFT JOIN lml USING (lang, w1, w2)
       |        LEFT JOIN unkl USING (lang, w1)
       |        LEFT JOIN unil USING (lang)) s
       |  GROUP BY doc_id, lang)""".stripMargin.replace("\n", " ")
  }

  /** DuckDB twin of [[surprisal]] with DISTINCT train and score
    * relations — the target-domain-LM form (c9): the model's counts
    * come from `trainFrom` (any relation or parenthesized+aliased
    * subquery), the scored stream from `scoreFrom`. Same CTE contract
    * as [[surprisalSql]] (ends in `scored`); that one stays the
    * single-relation emitter so the q5/q6/c8 oracle texts — and their
    * sf1.0 staged-runner cost — don't change. */
  def surprisalTrainScoreSql(trainFrom: String, scoreFrom: String,
                             textExpr: String = "text"): String =
    s"""bgt AS (${bigramsSql(trainFrom, textExpr)}),
       |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bgt GROUP BY 1, 2),
       |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
       |vv AS (SELECT CAST(count(DISTINCT w2) + 1 AS DOUBLE) AS v FROM c12),
       |lm AS (SELECT w1, w2,
       |         ${lpMicroSql("c12 + 0.5", "c1 + 0.5*v")} AS lp
       |       FROM c12 JOIN c1 USING (w1) CROSS JOIN vv),
       |unk AS (SELECT w1, ${lpMicroSql("0.5", "c1 + 0.5*v")} AS lp_unk
       |        FROM c1 CROSS JOIN vv),
       |bgs AS (${bigramsSql(scoreFrom, textExpr)}),
       |scored AS (
       |  SELECT doc_id, count(*) AS n_bigrams,
       |         CAST(sum(lp2) AS BIGINT) AS logp_micro,
       |         -CAST(sum(lp2) AS DOUBLE) / count(*) AS surprisal
       |  FROM (SELECT bgs.doc_id,
       |          COALESCE(lm.lp, unk.lp_unk,
       |                   ${lpMicroSql("1.0", "v")}) AS lp2
       |        FROM bgs LEFT JOIN lm USING (w1, w2)
       |                LEFT JOIN unk USING (w1) CROSS JOIN vv) s
       |  GROUP BY doc_id)""".stripMargin.replace("\n", " ")

  /** Persist the bigram model of `train` at `path` as a build-once
    * serving artifact: `bigrams/` (w1, w2, lp), `unigrams/` (w1,
    * lp_unk) and a one-row `meta/` carrying the vocab size and the
    * precomputed unseen-w1 uniform log-prob. Unlike the incrementally
    * maintained index families (LSH/decon/PQ-IVF/registry) an n-gram
    * LM is retrained, not patched — counts are global, so there is no
    * partial update that preserves the smoothing denominator — hence
    * plain overwrite semantics, no merge log, no nightly hook. */
  def saveLm(train: DataFrame, path: String,
             textCol: String = "text"): Unit = {
    val (lm, unk, v) = trainBigram(train, textCol)
    lm.write.mode("overwrite").parquet(s"$path/bigrams")
    unk.write.mode("overwrite").parquet(s"$path/unigrams")
    v.select(col("v"), lpMicro(lit(1.0), col("v")).as("lp_unseen"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** (bigram table, unigram-backoff table, 1-row meta) at `path`. */
  def loadLm(spark: org.apache.spark.sql.SparkSession, path: String)
      : (DataFrame, DataFrame, DataFrame) =
    (rd(spark, "w1 STRING, w2 STRING, lp BIGINT", s"$path/bigrams"),
      rd(spark, "w1 STRING, lp_unk BIGINT", s"$path/unigrams"),
      rd(spark, "v DOUBLE, lp_unseen BIGINT", s"$path/meta"))

  /** Per-transition log-prob stream of `docs` under a loaded model:
    * (doc_id, lp) with the [[surprisal]] OOV cascade. Shared by the
    * batch scorer below and the streaming enrich
    * (graft.streaming.DocStreams.lmScoreEnrich), so the two cannot
    * drift: on a stream the final per-doc sum runs in a stateless
    * group shell instead of groupBy (append streams cannot aggregate
    * unbounded), but every lp this emits is identical.
    *
    * Join strategy is deliberately left to AQE rather than hinted: a
    * saturated real-corpus vocabulary keeps the model tables far under
    * the broadcast threshold (AQE converts both joins —
    * PlanSpec-pinned at realistic vocab), while the synthetic
    * vocab-grows-with-corpus ramp (PipelineScaleBench's per-token
    * rewrite) legitimately needs the shuffle fallback; a forced
    * broadcast() would OOM exactly there. The fallback shuffles on
    * (w1, w2), whose hottest keys are the most frequent bigrams —
    * functional, and the documented cost of an unsaturated vocab. */
  def lpRows(docs: DataFrame, lm: DataFrame, unk: DataFrame,
             meta: DataFrame, textCol: String = "text"): DataFrame =
    bigrams(docs, textCol)
      .join(lm, Seq("w1", "w2"), "left")
      .join(unk, Seq("w1"), "left")
      .crossJoin(broadcast(meta.select(col("lp_unseen"))))
      .select(col("doc_id"),
        coalesce(col("lp"), col("lp_unk"), col("lp_unseen")).as("lp"))

  /** Batch scoring against a persisted model — equals
    * [[surprisal]](train, docs) for the train the model was saved
    * from, row for row (spec-pinned). */
  def surprisalAgainstLm(docs: DataFrame,
                         spark: org.apache.spark.sql.SparkSession,
                         path: String, textCol: String = "text"): DataFrame = {
    val (lm, unk, meta) = loadLm(spark, path)
    lpRows(docs, lm, unk, meta, textCol)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("logp_micro"))
      .withColumn("surprisal",
        -col("logp_micro").cast("double") / col("n_bigrams"))
  }

  /** CCNet-style per-language head/middle/tail thirds by surprisal.
    * Input must carry (doc_id, lang, surprisal). Per-language rank =
    * ONE global exact rank under (lang, surprisal, doc_id) minus the
    * language's offset (a #langs-row broadcast) — no per-language
    * single-partition window. Boundaries use integer arithmetic
    * (rank·3 vs n, 2n) so the cut is engine-exact. */
  def ccnetBuckets(scored: DataFrame): DataFrame = {
    val ranked = Ranking.globalRank(scored,
      Seq(col("lang"), col("surprisal"), col("doc_id")), "_gr")
    val offs = ranked.groupBy(col("lang"))
      .agg((min(col("_gr")) - 1).as("_off"), count(lit(1)).as("_n"))
    ranked.join(broadcast(offs), "lang")
      .withColumn("_r", col("_gr") - col("_off"))
      .withColumn("bucket",
        when(col("_r") * 3 <= col("_n"), lit("head"))
          .when(col("_r") * 3 <= col("_n") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .drop("_gr", "_off", "_r", "_n")
  }

  /** DuckDB twin of [[ccnetBuckets]] over relation `scored_lang`
    * (doc_id, lang, surprisal), as one SELECT. */
  def ccnetBucketsSql(rel: String = "scored_lang"): String =
    s"""SELECT * EXCLUDE (_r, _n),
       |  CASE WHEN _r * 3 <= _n THEN 'head'
       |       WHEN _r * 3 <= _n * 2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM (SELECT *,
       |        row_number() OVER (PARTITION BY lang
       |                           ORDER BY surprisal, doc_id) AS _r,
       |        count(*) OVER (PARTITION BY lang) AS _n
       |      FROM $rel) t""".stripMargin.replace("\n", " ")

  /** DSIR hashed-bigram importance weights (Xie et al., "Data Selection
    * for Language Models via Importance Resampling"): per-document
    * Σ_features [log P_target(f) − log P_raw(f)] over hashed bigram
    * features, in micro-nats. Positive weight ⇒ the document looks more
    * like `target` than like the raw background. Both feature
    * distributions are add-½-smoothed over `buckets` hash buckets.
    * Returns (doc_id, n_feats, weight_micro) for every raw doc with ≥1
    * bigram. One hash-agg per distribution (bucket-count tables are
    * `buckets`-sized ⇒ broadcast), one join back to the feature stream.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame,
                  textCol: String = "text", buckets: Int = 8192): DataFrame = {
    def feats(d: DataFrame) = bigrams(d, textCol).select(col("doc_id"),
      pmod(PolyHash64.polyHash64(concat(col("w1"), lit(" "), col("w2"))),
        lit(buckets.toLong)).as("f"))
    // checkpoint the two bucket-count tables (<= `buckets` rows each):
    // each feeds both the ratio table and its total scalar — without
    // materialization each consumer re-derives the corpus feature
    // stream (same 14-scan pathology as trainBigram's c12)
    val cr = feats(raw).groupBy(col("f")).agg(count(lit(1)).as("cr"))
      .localCheckpoint()
    val ct = feats(target).groupBy(col("f")).agg(count(lit(1)).as("ct"))
      .localCheckpoint()
    val nr = cr.agg(sum(col("cr")).cast("double").as("nr"))
    val nt = ct.agg(sum(col("ct")).cast("double").as("nt"))
    val b = lit(buckets.toDouble)
    val tbl = cr.join(ct, Seq("f"), "full")
      .na.fill(0L, Seq("cr", "ct"))
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .select(col("f"),
        (lpMicro(col("ct") + lit(0.5), col("nt") + lit(0.5) * b) -
          lpMicro(col("cr") + lit(0.5), col("nr") + lit(0.5) * b)).as("w"))
    feats(raw).join(broadcast(tbl), "f")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("weight_micro"))
  }

  /** DuckDB twin of [[dsirWeights]]: CTE chain ending in `weights`.
    * `targetWhere` selects the target slice out of `from`. */
  def dsirWeightsSql(from: String, targetWhere: String,
                     textExpr: String = "text", buckets: Int = 8192): String = {
    val h = PolyHash64.sql("w1 || ' ' || w2")
    s"""bgr AS (${bigramsSql(from, textExpr)}),
       |fr AS (SELECT doc_id, ($h) % $buckets AS f FROM bgr),
       |ft AS (SELECT fr.doc_id, f FROM fr
       |       JOIN $from tt USING (doc_id) WHERE $targetWhere),
       |cr AS (SELECT f, count(*) AS cr FROM fr GROUP BY 1),
       |ct AS (SELECT f, count(*) AS ct FROM ft GROUP BY 1),
       |nr AS (SELECT CAST(sum(cr) AS DOUBLE) AS nr FROM cr),
       |nt AS (SELECT CAST(sum(ct) AS DOUBLE) AS nt FROM ct),
       |tbl AS (SELECT f,
       |    ${lpMicroSql(s"COALESCE(ct,0) + 0.5", s"nt + 0.5*$buckets")} -
       |    ${lpMicroSql(s"COALESCE(cr,0) + 0.5", s"nr + 0.5*$buckets")} AS w
       |  FROM cr FULL JOIN ct USING (f) CROSS JOIN nr CROSS JOIN nt),
       |weights AS (
       |  SELECT doc_id, count(*) AS n_feats,
       |         CAST(sum(w) AS BIGINT) AS weight_micro
       |  FROM fr JOIN tbl USING (f) GROUP BY doc_id)""".stripMargin
      .replace("\n", " ")
  }
}
