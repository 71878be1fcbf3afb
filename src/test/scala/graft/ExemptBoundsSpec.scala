package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Quantitative error-bound laws for the oracle-exempt ids at sf0.1
  * (VERDICT r11 #7): the exempt lane (ExemptLaneSpec) pins non-emptiness
  * and determinism at sf0.01; THIS suite gives the soft lane teeth by
  * bounding each sketch/ANN id against its exact twin at the driver's
  * BENCH scale factor — the largest data any per-round harness sees.
  *
  * Every bound is derived from the estimator's published guarantee
  * (HLL/CMS/GK rsd·N forms) or measured on this corpus and pinned with
  * ≥ 3× headroom (ANN recalls, Bloom over-drop) — a genuine estimator
  * regression (wrong seed plumbing, broken band keys, saturated sketch)
  * lands far outside every bound, while noise stays far inside.
  */
class ExemptBoundsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.1"

  test("q_agg_approx_distinct: per-group relative error within 3x the declared rsd (sf0.1)") {
    // approx_count_distinct(user_id, rsd = 0.02): HLL++ standard error
    // 2% of the true cardinality; 3x rsd bounds ~99.7% of estimates and
    // EVERY group must pass (5 event types — a miss is a regression,
    // not a tail event). Measured 2026-08-14 on sf0.1: relErr 0.0040 in
    // every group (1494 est vs 1500 exact) — 15x inside the 0.06 bound.
    val approx = Queries.q_agg_approx_distinct(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, dir)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet, "group sets must agree")
    exact.foreach { case (g, n) =>
      val relErr = math.abs(approx(g) - n).toDouble / n
      info(f"$g: exact $n approx ${approx(g)} relErr $relErr%.4f")
      assert(relErr <= 0.06,
        s"$g: approx ${approx(g)} vs exact $n — relative error $relErr " +
          "exceeds 3x the declared 0.02 rsd")
    }
  }

  test("q_agg_approx_percentile: every estimate between the exact p±0.01 percentiles (sf0.1)") {
    // accuracy 1000 => rank error <= n/1000 = 0.1% of each ~200k-row
    // group; the exact percentiles at p ± 1% bound it with 10x headroom
    // (the sf0.001 twin of this law lives in ScalePathSpec). Measured
    // 2026-08-14 on sf0.1: every estimate sits mid-band (e.g. group A
    // p50 52944 in [51803, 53899]).
    val approx = Queries.q_agg_approx_percentile(spark, dir)
      .as[(String, Double, Double, Double)].collect()
    assert(approx.nonEmpty)
    val li = Tables.lineitem(spark, dir)
    def exactP(p: Double): Map[String, Double] = li.groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(p)).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (p49, p51) = (exactP(0.49), exactP(0.51))
    val (p94, p96) = (exactP(0.94), exactP(0.96))
    val (p98, p100) = (exactP(0.98), exactP(1.0))
    approx.foreach { case (g, ap50, ap95, ap99) =>
      info(f"$g: p50 $ap50 in [${p49(g)}, ${p51(g)}]; p95 $ap95 in [${p94(g)}, ${p96(g)}]; p99 $ap99 in [${p98(g)}, ${p100(g)}]")
      assert(ap50 >= p49(g) && ap50 <= p51(g),
        s"$g p50 $ap50 outside exact [${p49(g)}, ${p51(g)}]")
      assert(ap95 >= p94(g) && ap95 <= p96(g),
        s"$g p95 $ap95 outside exact [${p94(g)}, ${p96(g)}]")
      assert(ap99 >= p98(g) && ap99 <= p100(g),
        s"$g p99 $ap99 outside exact [${p98(g)}, ${p100(g)}]")
    }
  }

  test("q_agg_distinct_hll: merged-sketch estimate within 5% of exact distinct (sf0.1)") {
    // Datasketches HLL at the Spark default lgK=12: rsd ~1.04/sqrt(2^12)
    // = 1.6%; 3x => 5%. Measured 2026-08-14 on sf0.1: est 1488 vs exact
    // 1500, relErr 0.0080 — 6x inside the bound.
    val est = Queries.q_agg_distinct_hll(spark, dir)
      .collect().head.getLong(0)
    val exact = Tables.events(spark, dir)
      .agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    val relErr = math.abs(est - exact).toDouble / exact
    info(f"exact $exact est $est relErr $relErr%.4f")
    assert(relErr <= 0.05, s"HLL union estimate $est vs exact $exact: $relErr")
  }

  test("q_decontaminate_bloom: subset of exact decontamination; over-drop bounded (sf0.1)") {
    // Bloom membership has NO false negatives: every truly-contaminated
    // doc is dropped, so the bloom-kept set ⊆ the exact-kept set — an
    // exact one-sided law. (Since the round-15 hard-oracle conversion
    // the id ALSO replays bit-for-bit in DuckDB; this law remains as the
    // semantic backstop the oracle can't express.) The other side
    // (over-drop of clean docs) is bounded: the md5-positional filter's
    // geometry (k = 7, m = 32·n_probe_shingles) gives per-shingle fpp =
    // (1 − e^(−7/32))^7 ≈ 1.13e-5 under the independent-position model;
    // the Kirsch–Mitzenmacher double-hash positions are an arithmetic
    // progression mod m, which is known to inflate fpp by a small
    // constant over that model (and one FP shingle drops EVERY doc
    // containing it), so the bound carries 10x headroom plus an
    // absolute floor of 20. Measured 2026-08-16 on sf0.1 (portable
    // construction): over-drop 10 of 4986 kept-exact docs vs
    // independence-model expectation 2.8 (mean 50.1 shingles/doc) —
    // a 3.6x correlation factor, inside the 10x headroom; subset law
    // exact (zero false negatives).
    val bloomKept = Queries.q_decontaminate_bloom(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    val exactKept = Queries.q_decontaminate(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(bloomKept.subsetOf(exactKept),
      s"bloom kept ${(bloomKept -- exactKept).take(5)}... that exact dropped " +
        "— a Bloom FALSE NEGATIVE, which the structure makes impossible")
    val corpus = Tables.documents(spark, dir).filter(col("doc_id") >= 10)
    val nCorpus = corpus.count()
    val meanShingles = corpus
      .select((greatest(size(split(col("text"), "\\s+")) - 4, lit(0)))
        .cast("double").as("s"))
      .agg(avg("s")).collect().head.getDouble(0)
    // per-shingle fpp of the k=7 / 32-bits-per-key geometry (see the
    // scaladoc constants in Dedup.BloomK / BloomBitsPerKey)
    val fpp = math.pow(1 - math.exp(-7.0 / 32.0), 7)
    val expectedOverdrop = nCorpus * meanShingles * fpp
    val overdrop = (exactKept -- bloomKept).size
    info(f"exact kept ${exactKept.size}, bloom kept ${bloomKept.size}, " +
      f"over-drop $overdrop, expected <= $expectedOverdrop%.1f (mean shingles $meanShingles%.1f)")
    assert(overdrop <= math.max(20.0, 10 * expectedOverdrop),
      s"over-drop $overdrop far exceeds the fpp union bound $expectedOverdrop")
  }

  test("q_dedup_embed: buckets conserve mass and concentrate similarity (sf0.1)") {
    // lshBuckets is a histogram: (a) EXACT mass conservation — bucket
    // sizes sum to the corpus; (b) quantitative bucketing value — the
    // mean exact cosine WITHIN multi-member buckets beats the corpus's
    // cross-pair mean by a wide margin (sign-LSH agreement on all 16
    // planes is evidence of angular closeness; a broken signature would
    // collapse the gap to ~0)
    val buckets = Queries.q_dedup_embed(spark, dir)
    val total = buckets.agg(sum("n_vecs")).collect().head.getLong(0)
    val nVecs = Tables.embeddings(spark, dir).count()
    assert(total == nVecs, s"bucket mass $total != corpus $nVecs")

    val emb = Tables.embeddings(spark, dir)
    val planes = graft.functions.Vectors.hyperplanes(16, 64)
    val sigs = emb.select(col("vec_id"), col("embedding"),
      graft.functions.Vectors.lshSignature(col("embedding"), planes).as("sig"))
    val within = sigs.as("a").join(sigs.as("b"),
        col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id"))
      .select(graft.functions.Vectors
        .cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .agg(avg("c"), count(lit(1))).collect().head
    // cross-pair baseline on a deterministic 1-in-10 id slice (~200
    // vecs -> ~20k pairs) — same corpus, no bucket constraint
    val sample = emb.filter(col("vec_id") % 10 === 0)
    val cross = sample.as("a").join(sample.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(graft.functions.Vectors
        .cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .agg(avg("c")).collect().head.getDouble(0)
    val withinMean = within.getDouble(0)
    info(f"within-bucket mean cosine $withinMean%.4f over ${within.getLong(1)} pairs; cross-pair mean $cross%.4f")
    assert(within.getLong(1) > 0, "no multi-member buckets at sf0.1")
    // Measured 2026-08-14 on the real sf0.1 fixture (near-uniform 64-d,
    // cross-pair mean ~0.000): registered seed-42 planes give withinMean
    // 0.1376; re-deriving the law across 12 plane seeds spans
    // 0.125–0.174. A broken signature (wrong plane seed plumbing, sign
    // bug, bucket-key corruption) buckets uncorrelated vectors and the
    // mean collapses to the ~0.00 cross baseline, so cross + 0.06 (half
    // the worst seed) separates working from broken with ~2x margin on
    // both sides. The r12 +0.2 margin was asserted unmeasured and is
    // unattainable on an unclustered corpus.
    assert(withinMean >= cross + 0.06,
      f"within-bucket mean $withinMean%.4f does not beat cross mean $cross%.4f by 0.06 " +
        "— the signature is not concentrating similar vectors " +
        "(measured 0.1376 on this fixture, 2026-08-14)")
  }

  test("q_heavy_hitters_approx: superset of exact; CMS estimates one-sided and eps-bounded (sf0.1)") {
    // md5-portable CMS (Sketches.cmsCells: depth 4, width 8192 — eps =
    // e/8192 ≈ 3.32e-4, miss probability e^-4 ≈ 1.8% per key):
    // overestimate only. (Since the round-15 hard-oracle conversion the
    // id ALSO replays bit-for-bit in DuckDB; this law remains as the
    // semantic backstop the oracle can't express.) Laws: (a) the result
    // is NON-EMPTY (the r12 form of this test crashed on `errs.max` of
    // an empty collection because the old fixed 0.8%-of-total cut
    // selects zero keys at sf0.1 — the query uses the scale-invariant
    // >=1.2x-mean cut, 104 exact heavy hitters at sf0.1);
    // (b) every exact heavy hitter appears (overestimates can only ADD
    // keys at the threshold); (c) est >= true for every key;
    // (d) est - true <= 10x eps*N for every key (vanishing miss
    // probability) and <= eps*N for >= 95%. Measured 2026-08-16 on
    // sf0.1 (portable construction): 105 keys, epsN 33.2, max
    // over-estimate 59 (rare all-4-row collisions at 1500 keys /
    // 8192 columns), within-epsN share 0.990.
    val approx = Queries.q_heavy_hitters_approx(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.nonEmpty,
      "q_heavy_hitters_approx returned ZERO rows at sf0.1 — every law " +
        "below would be vacuous; the threshold no longer fits the fixture")
    val ev = Tables.events(spark, dir)
    val n = ev.count()
    val exactCnt = ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nUsers = exactCnt.size
    val exactHH = exactCnt.filter { case (_, c) => c * nUsers * 5 >= n * 6 }.keySet
    assert(exactHH.nonEmpty, "no exact heavy hitters at sf0.1 — the " +
      "superset law would be vacuous")
    assert(exactHH.subsetOf(approx.keySet),
      s"missing exact heavy hitters: ${exactHH -- approx.keySet}")
    val epsN = math.E / graft.functions.Sketches.CmsWidth * n
    val errs = approx.toSeq.map { case (u, est) =>
      val truth = exactCnt.getOrElse(u, 0L)
      assert(est >= truth, s"user $u: CMS UNDER-estimated $est < $truth")
      est - truth
    }
    info(f"keys ${approx.size}, epsN $epsN%.1f, max over-estimate ${errs.max}, " +
      f"within-epsN share ${errs.count(_ <= epsN).toDouble / errs.size}%.3f")
    assert(errs.max <= 10 * epsN,
      s"over-estimate ${errs.max} exceeds 10x eps*N = ${10 * epsN}")
    assert(errs.count(_ <= epsN).toDouble / errs.size >= 0.95,
      "more than 5% of keys exceed the per-query eps*N guarantee")
  }

  test("q_knn_join_pq: ADC recall@3 vs the exact kNN join (sf0.1)") {
    val pq = Queries.q_knn_join_pq(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = Queries.q_knn_join(spark, dir)
      .filter(col("query_id") < 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, ids) =>
      (pq.getOrElse(q, Set.empty) & ids).size.toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    info(f"per-probe recalls ${recalls.map(r => f"$r%.2f").mkString(",")}; mean $mean%.3f")
    // Measured 2026-08-14 on the real sf0.1 fixture: mean recall@3 over
    // the 8 probes = 0.417 (deterministic — seeded train/encode). The
    // fixture is near-uniform random 64-d (cross-pair mean cosine
    // ~0.000), where m=8/kSub=16 ADC is genuinely lossy; the r12 0.5
    // floor cited an "0.8+ measured" that the fixture never produced.
    // A broken ADC (wrong codebook indexing, LUT misalignment, distance
    // sign flip) ranks candidates ~randomly: E[recall@3] ~ 3/2000 per
    // probe ~ 0.002. Floor 0.2 sits 2x under the measured value and
    // 100x over broken.
    assert(mean >= 0.2,
      f"mean PQ recall@3 $mean%.3f below 0.2 — ADC ranking degraded " +
        "(measured 0.417 on this near-uniform fixture, 2026-08-14; " +
        "random ranking gives ~0.002)")
  }

  test("q_similarity_ivf + q_similarity_lsh: ANN recall@5 vs brute force; indexed == unindexed (sf0.1)") {
    val brute = Queries.q_similarity_topk(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Queries.q_similarity_ivf(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    val ivfRecall = (ivf & brute).size.toDouble / brute.size
    // the indexed variant must return the IDENTICAL relation — same
    // seeded centroids, same probes, persisted layout is the only delta
    val unindexed = Queries.q_similarity_ivf(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val indexed = Queries.q_similarity_ivf_indexed(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(indexed == unindexed,
      "persisted-index IVF diverged from the in-memory IVF path")
    val lsh = Queries.q_similarity_lsh(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    val lshRecall = (lsh & brute).size.toDouble / brute.size
    info(f"IVF recall@5 $ivfRecall%.2f; LSH recall@5 $lshRecall%.2f")
    // Measured 2026-08-14 on the real sf0.1 fixture (near-uniform 64-d):
    // the registered query (seed-42 centroids, nprobe=4 of 16) recalls
    // 0.6 for query vec 0 — NOT the 1.0 the r12 comment claimed from a
    // "clustered embeddings" fixture that does not exist; on uniform
    // data nprobe/k=25% list coverage loses true neighbors by
    // construction. Broken probe selection degenerates to the random
    // baseline nprobe/k = 0.25; a single 5-neighbor query quantizes
    // recall in 0.2 steps, so the per-id floor is 0.4 (one step under
    // measured, one step over broken) and the tighter separation comes
    // from the 10-query mean below.
    assert(ivfRecall >= 0.4,
      f"IVF recall@5 $ivfRecall%.2f below 0.4 (measured 0.6 on this " +
        "near-uniform fixture, 2026-08-14; random probes give 0.25)")
    // LSH on this near-uniform corpus: the query vector (vec 0) is IN
    // the corpus, and sign-LSH guarantees identical vector -> identical
    // band signatures -> always a candidate -> always ranked first by
    // the exact re-rank (cos = 1). That self-match is the structural
    // invariant; additional true neighbors (cos ~0.33-0.40, ~8% per-band
    // agreement odds) are luck of the seeded planes. Measured 2026-08-14:
    // recall@5 = 0.2 = exactly the self-match (deterministic, seed 42);
    // the r12 0.6 floor was never run at sf0.1 (the suite failed on an
    // earlier assert). A broken band key/signature loses even the
    // self-match -> 0.0.
    assert(brute.contains(0L) && lsh.contains(0L),
      "banded LSH lost the self-match — identical signatures must always candidate")
    assert(lshRecall >= 0.2,
      f"LSH recall@5 $lshRecall%.2f below 0.2 — banded signature match degraded " +
        "(measured 0.2 on this near-uniform fixture, 2026-08-14)")
    // 10-query mean over the same operators the id composes (shared
    // seed-42 centroids): lower variance than any single 5-neighbor
    // query. Measured 2026-08-14: mean 0.540 across query ids 0..9
    // (deterministic); random probe selection means 0.25. Floor 0.4
    // separates both ways.
    val emb = Tables.embeddings(spark, dir)
    val centroids = Similarity.ivfTrain(emb, "embedding", k = 16)
    val recalls = (0L until 10L).map { qid =>
      val q = Similarity.queryVector(emb, "vec_id", "embedding", qid)
      val b = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
        .select("vec_id").as[Long].collect().toSet
      val a = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 5, centroids, nprobe = 4)
        .select("vec_id").as[Long].collect().toSet
      (a & b).size.toDouble / b.size
    }
    val meanRecall = recalls.sum / recalls.size
    info(f"10-query IVF mean recall@5 $meanRecall%.3f (${recalls.map(r => f"$r%.1f").mkString(",")})")
    assert(meanRecall >= 0.4,
      f"10-query IVF mean recall@5 $meanRecall%.3f below 0.4 — probe " +
        "selection or list assignment degraded (measured 0.540, 2026-08-14; " +
        "random probes give 0.25)")
  }

  test("q_similarity_ivfpq: fused IVFADC recall vs brute force; refine-exhaustive == plain IVF (sf0.1)") {
    // Two laws for the fused path (VERDICT r12 #3):
    //  (a) the registered id (nprobe=4, refine=4, k=5 — ADC picks 20
    //      candidates, exact re-rank picks 5) recalls enough of the
    //      brute-force top-5. The re-rank bounds the fused recall by the
    //      plain-IVF recall for the same probes (0.6 measured); ADC only
    //      loses a true neighbor if it falls outside the 20 ADC-ranked
    //      candidates within the probed lists.
    //  (b) with refine·k >= every probed row, ADC cannot drop anyone, so
    //      fused == plain indexed IVF EXACTLY — the quantization-error-
    //      free contract of the re-rank stage (same law family as
    //      ScalePathSpec's, pinned here at sf0.1 on the registered
    //      lifecycle artifacts).
    // Measured 2026-08-14 on the real sf0.1 fixture (near-uniform 64-d,
    // seed-42 everything, deterministic): registered recall@5 = 0.6 —
    // equal to plain IVF at the same probes, i.e. refine=4 loses
    // nothing here. Floor 0.4: one 0.2-recall-step under measured, well
    // over the 0.25 random-probe baseline; a broken ADC table or
    // desynced codes/ drops true neighbors from the candidate set and
    // lands at or below random.
    val fused = Queries.q_similarity_ivfpq(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    val brute = Queries.q_similarity_topk(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    val recall = (fused & brute).size.toDouble / brute.size
    info(f"fused IVFADC recall@5 $recall%.2f")
    assert(recall >= 0.4,
      f"fused IVFADC recall@5 $recall%.2f below 0.4 (measured 0.6, " +
        "2026-08-14; random probes give 0.25)")
    // (b): exhaustive refine on the index the registered id just built
    val emb = Tables.embeddings(spark, dir)
    val q = Similarity.queryVector(emb, "vec_id", "embedding", 0L)
    val indexDir = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_idx_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val n = emb.count().toInt
    val exhaustive = Similarity.ivfPqTopK(spark, indexDir, "vec_id",
      "embedding", q, 5, nprobe = 4, refine = n)
      .collect().map(_.toString).sorted.toSeq
    val plain = Similarity.ivfTopKIndexed(spark, indexDir, "vec_id",
      "embedding", q, 5, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(exhaustive == plain,
      "refine-exhaustive fused IVFADC diverged from plain indexed IVF — " +
        "the exact re-rank must erase ADC quantization error entirely")
  }

  test("q_topk_approx_sketch: exact equality with the keyed-agg twin below capacity (sf0.1)") {
    // capacity 16384 >> distinct users at sf0.1: the frequent-items
    // sketch never evicts, so the merged estimate is EXACT — equality,
    // not a band. Measured 2026-08-14 on sf0.1: 1500 users (9% of the
    // capacity margin), top-5 equality holds.
    val nUsers = Tables.events(spark, dir)
      .agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(nUsers <= Queries.TopKSketchCapacity / 4,
      s"fixture outgrew the capacity margin: $nUsers users")
    val sk = Queries.q_topk_approx_sketch(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("user_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    info(s"sketch $sk")
    assert(sk == exact, s"sketch top-5 $sk != exact $exact")
  }
}
