package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, LmScore, Sampling, TextAnalysis}

/** The c7 curation chain's stage builders — ONE definition shared by the
  * declared `c7_curation_pipeline` query and the stage profiler
  * ([[graft.operators.C7Profile]]), so the profiled pipeline can never
  * drift from the benchmarked/oracle-gated one. Stage semantics are
  * documented at the query site (CoverageQueries "C7").
  *
  * The `localCheckpoint()` cuts are part of the contract, not an
  * optimization detail: `synthesized` feeds both the signal subtree and
  * the gate join, `gated` is consumed twice by decontamination, and
  * `decontaminated` three times downstream — without the cuts those
  * subtrees re-execute per consumer (the oracle materializes the same
  * CTEs for the same reason).
  */
private[graft] object CurationStages {

  /** The corpus slice under curation, with repetition synthesized into
    * every 30th doc (12-word head appended twice) so the Gopher gate
    * provably binds. Pinned: feeds the signal subtree AND the gate join. */
  def synthesized(all: DataFrame): DataFrame = {
    val wr = split(col("text"), " ")
    val rep = concat(col("text"), lit(" "),
      array_join(slice(wr, 1, 12), " "), lit(" "),
      array_join(slice(wr, 1, 12), " "))
    all.where(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id"), col("source"),
        when(pmod(col("doc_id"), lit(30)) === 0, rep)
          .otherwise(col("text")).as("text"))
      .localCheckpoint()
  }

  /** The held-out benchmark slice decontamination screens against. */
  def benchSlice(all: DataFrame): DataFrame =
    all.where(pmod(col("doc_id"), lit(3)) === 1)

  /** Gopher repetition gate: keep docs with dup10_char_frac < 0.10.
    * Pinned: decontamination consumes its batch twice. */
  def gated(docs: DataFrame): DataFrame = {
    val sig = TextAnalysis.repetitionSignals(docs,
      topNs = Seq(2), dupNs = Seq(10))
    docs.join(
      sig.where(col("dup10_char_frac") < 0.10).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
      .localCheckpoint()
  }

  /** CCNet-style LM quality gate (c10's extra stage): score the gated
    * docs under PER-LANGUAGE bigram LMs of the gated corpus
    * ([[LmScore.surprisalPerLang]] — CCNet's actual per-language form;
    * |langs| models in the same two hash-agg shuffles as one), then
    * per-language thirds by surprisal ([[LmScore.ccnetBuckets]] — ONE
    * global rank, lang leading the sort key), keep head+middle. Sits
    * between the Gopher rule gate and decontamination — the CCNet
    * recipe's position in a curation chain. Sub-2-token docs have no
    * surprisal row and drop with the tail (the oracle twin replays
    * the same inner join).
    *
    * Train = the gated corpus itself — deliberate, and NOT the c8
    * self-training defect c9 fixes: bucketing keeps the best two
    * RELATIVE thirds per language (rank-based within one corpus), so
    * a corpus-wide shift in absolute surprisal cancels, whereas c8's
    * survivor pick compares absolute scores between near-identical
    * texts where a dup cluster's own mass tips the scale. The
    * defense has a LIMIT, though: a language whose crawl is
    * boilerplate-dominated still ranks boilerplate phrasing as head
    * WITHIN that language under a self-trained model. The
    * target-domain form that fixes it is [[lmGatedAgainstLm]] (c12).
    * Pinned: the decon stage consumes the result twice. The model
    * joins stay broadcast-able (count tables are vocab-bounded per
    * language); everything else in the stage is the corpus-keyed
    * scoring pass + a #langs-row broadcast of bucket offsets. */
  def lmGated(gatedDocs: DataFrame, langs: DataFrame): DataFrame =
    lmKeep(gatedDocs,
      LmScore.surprisalPerLang(gatedDocs.join(langs, "doc_id")))

  /** c12's gate — [[lmGated]] scored under PERSISTED per-language
    * TARGET-domain models ([[LmScore.saveLmPerLang]] at `lmPath`)
    * instead of self-training on the gated corpus: the form
    * [[lmGated]]'s scaladoc names as the principled fix for its
    * boilerplate-dominated-language limit (a language whose crawl is
    * mostly boilerplate still ranks boilerplate phrasing as head
    * under a self-trained model; a target-domain model does not learn
    * that phrasing in the first place). Same thirds, same
    * keep-head+middle rule; only the model the surprisal comes from
    * changes ([[LmScore.surprisalAgainstLmPerLang]] — lang-partitioned
    * pruned reads, broadcast-able when each language's vocab fits). A
    * scoring language absent from the target corpus scores lp 0 per
    * transition (the documented "no opinion" arm) and buckets by rank
    * like any other. */
  def lmGatedAgainstLm(gatedDocs: DataFrame, langs: DataFrame,
                       spark: org.apache.spark.sql.SparkSession,
                       lmPath: String): DataFrame =
    lmKeep(gatedDocs,
      LmScore.surprisalAgainstLmPerLang(gatedDocs.join(langs, "doc_id"),
        spark, lmPath))

  /** Shared bucket-and-keep tail of the two LM gates: per-language
    * thirds by surprisal (ONE global rank), keep head+middle. */
  private def lmKeep(gatedDocs: DataFrame, scored0: DataFrame): DataFrame = {
    val scored = scored0
      .select(col("doc_id"), col("lang"), col("surprisal"))
    val keep = LmScore.ccnetBuckets(scored)
      .where(col("bucket") =!= "tail")
      .select(col("doc_id"))
    gatedDocs.join(keep, Seq("doc_id"), "left_semi").localCheckpoint()
  }

  /** Frame decontamination: drop docs whose k=8 shingle containment in
    * the benchmark reaches 0.5. Pinned: consumed by the LSH subtree,
    * the split items, and the final join. */
  def decontaminated(gatedDocs: DataFrame, bench: DataFrame): DataFrame =
    Dedup.decontaminateFrames(gatedDocs, bench, k = 8, maxContainment = 0.5)
      .localCheckpoint()

  /** MinHash-LSH near-dup candidate pairs over the survivors. */
  def nearDupPairs(kept: DataFrame): DataFrame =
    Dedup.minhashLshPairs(kept, k = 3, bands = 8,
      rowsPerBand = 4, threshold = 0.05).select(col("id1"), col("id2"))

  /** Near-dup components (reused for the splits — no second fixpoint). */
  def components(pairs: DataFrame): DataFrame =
    Dedup.connectedComponents(pairs, assumeDistinctPairs = true)

  /** Leakage-safe whole-component split labels joined back onto the
    * curated corpus. */
  def curated(kept: DataFrame, comps: DataFrame): DataFrame = {
    val labeled = Sampling.componentSplitsFromComponents(
      kept.select(col("doc_id").as("id")), comps)
    kept.join(
      labeled.select(col("id").as("doc_id"), col("split")), Seq("doc_id"))
  }

  /** Per-source hard quota, rolled up per (source, split). */
  def quotaRollup(curatedDocs: DataFrame): DataFrame =
    Sampling.groupCap(curatedDocs, "source", "doc_id",
        key = concat(col("doc_id").cast("string"), lit("/"), col("source")),
        cap = 5)
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("chars"),
        sum(col("doc_id")).cast("long").as("id_checksum"))
      .orderBy(col("source"), col("split"))
}
