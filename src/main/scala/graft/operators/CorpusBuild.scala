package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The composed corpus-build lifecycle (VERDICT r13 #3) — the first
  * thing a real pretraining-pipeline user runs: raw documents through
  * every hygiene stage into a sorted, sharded training corpus, seeding
  * the persisted serving artifacts the streaming ingest sinks
  * ([[graft.sources.IO.nearDupDedupSink]] and friends) then gate
  * against. Each stage is the SAME operator the stage's standalone
  * query id uses — the pipeline is composition, not re-implementation —
  * and ScalePathSpec pins pipeline == sequential-stages equality.
  *
  * Stage order is the cost-correct one for 100 TB: exact dedup first
  * (cheapest per row — one hash shuffle — and the biggest typical row
  * cut), then near-dup (LSH candidates over survivors only), then
  * decontamination (zero-shuffle Bloom predicate over what remains),
  * then the domain mix (narrow deterministic filter), then one
  * range-partitioned write. Nothing re-scans the raw corpus after
  * stage 1; stages 3–4 are ONE observed pass (both predicates fused
  * into the final-corpus materialization the shard write then reads).
  */
object CorpusBuild {

  /** Per-stage row ledger of one composed build — what a pipeline
    * review reads: every dropped row accounted to the stage that
    * dropped it. `afterDecontaminate`/`afterMix` come from
    * [[Analytics.observedFilter]] counters collected ON the shard-write
    * pass itself (`afterWinnow` is that pass's rows_in — free); the
    * dedup-stage counts are read from the stages' materialized (reused)
    * outputs, not extra plan executions. With the winnow stage off,
    * `afterWinnow == afterNearDup` (a no-op stage drops nothing); with
    * the span stage off, `afterSpanRemoval == afterWinnow` and
    * `spanTokensRemoved == 0`. `afterSpanRemoval` counts docs surviving
    * the empty-after-excision drop; `spanTokensRemoved` bills EVERY
    * excised token, including those of the subsequently-dropped empty
    * docs. `afterQuality`/`afterDiversity` are -1 when their stages are
    * off; with both on, `afterQuality` counts DSIR survivors and
    * `afterDiversity` the rows surviving the semantic bucket cap (the
    * observed pass's rows_in). */
  final case class CorpusLedger(raw: Long, afterExactDedup: Long,
                                afterNearDup: Long, afterWinnow: Long,
                                afterDecontaminate: Long,
                                afterMix: Long,
                                afterSpanRemoval: Long = -1L,
                                spanTokensRemoved: Long = 0L,
                                afterQuality: Long = -1L,
                                afterDiversity: Long = -1L)

  /** Run the full build. Writes three artifacts: the exact-dedup
    * fingerprint index (`fpIndexDir` — [[Dedup.writeFingerprintIndex]]
    * over the exact survivors), the near-dup band index (`bandIndexDir`
    * — [[Dedup.writeNearDupIndex]] over the near-dup survivors: both
    * indexes reflect ADMITTED content, the ingest-gate contract), and
    * the quality-sorted shard layout (`shardDir` —
    * [[Sampling.writeSortedShards]] on `sortCol`). Returns the
    * per-stage ledger.
    *
    * The probe relation is the benchmark/eval set for decontamination
    * (Bloom gate — [[Dedup.bloomKeepPredicate]]; false positives
    * over-drop, the conservative direction). `mixRates` is the
    * per-stratum keep policy of [[Sampling.mixSample]] (deterministic
    * md5-cell membership — stable across runs and engines).
    * `winnowIndexDir` enables the optional substring-family stage and
    * names its fourth artifact: the winnow fingerprint index seeded
    * from the stage's survivors, serving
    * [[graft.sources.IO.winnowIngestSink]] from the first micro-batch.
    * `spanRemovalWindowLen` enables the optional exact duplicated-SPAN
    * stage ([[Dedup.removeDuplicatedSpans]] at that window length) —
    * the sub-document treatment that EXCISES shared runs instead of
    * dropping whole docs; emptied docs are dropped. `qualityLm` enables
    * the optional DSIR quality-selection stage ([[Sampling.dsirScore]]
    * against the given ≤4096-row log-ratio LM — train it with
    * [[Sampling.dsirLm]], typically on an external reference corpus):
    * docs whose exact-integer weight clears
    * `qualityThresholdPico`·n_tokens survive; token-less docs are
    * rejected (no content to judge — the
    * [[graft.sources.IO.dsirGateSink]] decision, verbatim). Runs after
    * the dedup family and BEFORE decontamination, so the probe gate
    * still judges exactly the text that ships. `diversityEmb` enables
    * the optional DIVERSITY-CAP stage ([[Sampling.diversityCapSample]]
    * — the q_diversity_sample selection, verbatim): pass the (idCol,
    * embedding) relation and each semantic LSH bucket keeps at most
    * `diversityCap` surviving docs in deterministic md5 order;
    * unembedded docs pass through. Runs after quality and BEFORE
    * decontamination for the same reason quality does — the budget
    * competition should be among quality survivors, and the probe gate
    * judges what ships. `diversityIndexDir` additionally seeds the live
    * gate's bucket-membership index from the stage's surviving embedded
    * docs ([[Sampling.writeBucketMembershipIndex]] — index == admitted
    * content, the fp/band/winnow contract), so
    * [[graft.sources.IO.diversityGateSink]] starts with every bucket
    * billed for what the build admitted. */
  def buildCorpus(docs: DataFrame, probe: DataFrame,
                  idCol: String, textCol: String, stratumCol: String,
                  sortCol: String,
                  fpIndexDir: String, bandIndexDir: String,
                  shardDir: String,
                  nearDupThreshold: Double = 0.7,
                  mixRates: Map[String, Double] = Map.empty,
                  defaultMixRate: Double = 1.0,
                  shingleN: Int = 5,
                  numShards: Int = 16,
                  winnowIndexDir: Option[String] = None,
                  winnowMinShared: Long = 2L,
                  spanRemovalWindowLen: Option[Int] = None,
                  qualityLm: Option[DataFrame] = None,
                  qualityThresholdPico: Long = 0L,
                  diversityEmb: Option[DataFrame] = None,
                  diversityCap: Int = 3,
                  diversityIndexDir: Option[String] = None): CorpusLedger = {
    // stage 1: exact content dedup — min-id keeper per md5 fingerprint
    // (the q_dedup_doc policy), then seed the fingerprint index from
    // the SURVIVORS (index == admitted content). The RAW corpus is
    // deliberately NOT materialized (at 100 TB that would copy the
    // input): it is scanned exactly twice — keeper aggregation and the
    // keeper semi-join — and the raw row count folds off the
    // keeper relation's per-content copy counts (distinct-content-
    // sized), not a third corpus scan.
    val keepers = docs
      .groupBy(Text.fingerprint(col(textCol)).as("__fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("__copies"))
      .localCheckpoint(eager = true) // feeds the raw count + the semi-join
    val rawCount = keepers.agg(sum(col("__copies")).as("n"))
      .head().getLong(0)
    val exact = docs.join(keepers.select(idCol), Seq(idCol), "left_semi")
      .localCheckpoint(eager = true) // feeds the index write + 3 near-dup scans
    Dedup.writeFingerprintIndex(exact, textCol, fpIndexDir)
    // stage 2: near-dup collapse (MinHash+LSH candidates → exact
    // Jaccard confirm → min-id canonical — the q_dedup_cluster_minhash
    // recipe), then seed the band index from the survivors
    val near = Dedup.clusterByMinhash(exact, idCol, textCol, nearDupThreshold)
      .localCheckpoint(eager = true) // feeds the index write + the final pass
    Dedup.writeNearDupIndex(near, idCol, textCol, bandIndexDir)
    // optional stage 2½: winnow (substring-family) collapse — the MOSS
    // local-guarantee pass catching the extract-of relationships
    // Jaccard misses (a 20-token verbatim lift inside an otherwise
    // fresh doc never clears a whole-doc similarity threshold). ONE
    // winnow pass (one positional explode) serves the pair step AND the
    // index seed — the winnowIngestSink discipline; the index reflects
    // SURVIVORS only (admitted content, the ingest-gate contract), so
    // the build hands the streaming gate exactly the state it needs.
    val winnowed = winnowIndexDir match {
      case Some(dir) =>
        val fps = Dedup.winnowFingerprints(near, idCol, textCol)
          .localCheckpoint(eager = true) // feeds pairs (df cap, sizes,
                                         // both join sides) + index seed
        val surv = Dedup.keepCanonical(near,
            Dedup.winnowPairsFromFps(fps, minShared = winnowMinShared),
            idCol)
          .localCheckpoint(eager = true) // feeds the seed + the final pass
        Dedup.writeWinnowFps(
          fps.join(surv.select(col(idCol).as("id")), Seq("id"), "left_semi"),
          dir)
        surv
      case None => near
    }
    // optional stage 2¾: exact duplicated-SPAN removal (Lee et al.
    // 2022's sub-document treatment — the alternative to winnow's
    // doc-level collapse: keep both docs, excise the shared run from
    // every occurrence; [[Dedup.removeDuplicatedSpans]] over the
    // doc-dedup survivors, so spans are measured against ADMITTED
    // content). Docs emptied by the excision (their whole text was
    // duplicated) are dropped. Runs BEFORE decontamination
    // deliberately: the probe gate must judge the text that SHIPS.
    // `spanTokensRemoved` counts every excised token, including those
    // of subsequently-dropped empty docs (the full excision bill).
    val (spanned, spanToks) = spanRemovalWindowLen match {
      case Some(l) =>
        val rewritten = winnowed.drop(textCol)
          .join(Dedup.removeDuplicatedSpans(winnowed, idCol, textCol, l)
            .withColumnRenamed("id", idCol), Seq(idCol))
          .localCheckpoint(eager = true) // feeds the ledger agg + the kept
                                         // filter (and the shard write's
                                         // range sampler downstream)
        val toks = rewritten.agg(sum(col("n_removed")).as("t"))
          .head().getLong(0)
        (rewritten.filter(col("clean_text") =!= "")
          .withColumnRenamed("clean_text", textCol)
          .drop("n_tokens", "n_removed"), toks)
      case None => (winnowed, 0L)
    }
    // optional stage 2⅞: DSIR quality selection — the composed form of
    // the live quality gate (the SAME Sampling.dsirScore fold and the
    // SAME exact-integer threshold comparison as IO.dsirGateSink, so a
    // doc admitted here is the doc the gate would admit). The score
    // pass is one narrow explode + broadcast LM join over the dedup
    // survivors; the keep is a semi-join on the kept ids.
    val qualified = qualityLm match {
      case Some(lm) =>
        val kept = Sampling.dsirScore(spanned, idCol, textCol, lm)
          .filter(col("weight_pico") >=
            lit(qualityThresholdPico) * col("n_tokens"))
          .select(idCol)
        spanned.join(kept, Seq(idCol), "left_semi")
          .localCheckpoint(eager = true) // feeds the observed pass below
      case None => spanned
    }
    // optional stage 2⁹⁄₁₀: the DIVERSITY cap — the composed form of
    // q_diversity_sample (the SAME Sampling.diversityCapRanked
    // selection): each semantic LSH bucket keeps at most `diversityCap`
    // of the surviving docs in deterministic md5 order; docs without an
    // embedding row pass through. The kept-id relation is
    // bucket-bounded (≤ cap·256 rows — broadcast at any corpus size).
    // (no checkpoint: the stage feeds only the single observed pass
    // below, which `pinned` already executes exactly once — EXCEPT when
    // the gate-index seed is requested, which adds its own pass over
    // the stage's embedded survivors)
    val diverse = diversityEmb match {
      case Some(emb) =>
        val surv = Sampling.diversityCapSample(qualified, idCol, emb,
          "embedding", diversityCap)
        diversityIndexDir.foreach { dir =>
          // seed the live gate's BUCKET-MEMBERSHIP index from the
          // stage's surviving EMBEDDED docs (index == admitted content,
          // the fp/band/winnow ingest-gate contract): a gate started on
          // this index bills every bucket for what the build admitted
          Sampling.writeBucketMembershipIndex(
            emb.join(surv.select(idCol), Seq(idCol), "left_semi"),
            idCol, "embedding", dir)
        }
        surv
      case None => qualified
    }
    // stages 3–5, ONE observed pass: Bloom decontamination and the
    // domain mix are bare predicates, so both ride the shard write's
    // scan with observedFilter counters — per-stage accounting at zero
    // extra executions
    val (clean, deconObs) = Analytics.observedFilter(diverse,
      Dedup.bloomKeepPredicate(probe, textCol, shingleN),
      "corpus_decontaminate")
    val (mixed, mixObs) = Analytics.observedFilter(clean,
      Sampling.mixKeepPredicate(stratumCol, idCol, mixRates, defaultMixRate),
      "corpus_mix")
    // pin the final corpus BEFORE the sorted-shard write: the range
    // partitioner runs a sampling pass over its input, which would
    // execute the observed predicates a second time (doubling the
    // counters) and re-run the Bloom/mix work; the checkpoint runs the
    // observed plan exactly once and both write passes read the pinned
    // rows
    val pinned = mixed.localCheckpoint(eager = true)
    Sampling.writeSortedShards(pinned, sortCol, shardDir, numShards)
    val d = deconObs.get; val m = mixObs.get
    def asLong(x: Any): Long = x match {
      case null => 0L
      case l: Long => l
      case n: Number => n.longValue()
    }
    val nearCount = near.count()
    // ledger cascade: the observed pass's rows_in is the row count at
    // the LAST enabled pre-observed stage (free — collected on the one
    // shard-write execution); every earlier optional stage whose count
    // rows_in no longer witnesses reads its own (checkpointed) relation
    val laterOn = Seq(spanRemovalWindowLen.nonEmpty, qualityLm.nonEmpty,
      diversityEmb.nonEmpty)
    val winnowCount =
      if (!laterOn.exists(identity)) asLong(d("rows_in"))
      else if (winnowIndexDir.isEmpty) nearCount
      else winnowed.count()
    val spanCount =
      if (!laterOn.drop(1).exists(identity)) asLong(d("rows_in"))
      else spanned.count()
    val qualityCount =
      if (qualityLm.isEmpty) -1L
      else if (diversityEmb.isEmpty) asLong(d("rows_in"))
      else qualified.count()
    CorpusLedger(
      raw = rawCount,
      afterExactDedup = exact.count(),
      afterNearDup = nearCount,
      afterWinnow = winnowCount,
      afterDecontaminate = asLong(d("rows_kept")),
      afterMix = asLong(m("rows_kept")),
      afterSpanRemoval = spanCount,
      spanTokensRemoved = spanToks,
      afterQuality = qualityCount,
      afterDiversity = if (diversityEmb.isEmpty) -1L else asLong(d("rows_in")))
  }
}
