package graft

/** The oracle-exempt lane at a NON-TOY scale factor.
  *
  * The driver's DuckDB oracle never sees the exempt ids (sketch / LSH /
  * Bloom-seeded queries aren't SQL-reproducible), so they are exactly
  * the queries where a fixture-cardinality assumption can ship silently:
  * `q_topk_approx_sketch` passed its sf0.001 spec (15 users ≤ the
  * sketch's 32-item capacity) and returned an EMPTY relation at every
  * realistic scale factor. This suite closes that class of gap by
  * executing EVERY registered query that lacks an `oracleSql` entry at
  * sf0.01 (~10× the unit-fixture cardinality — the driver's own
  * correctness SF) and pinning the two properties the oracle would have
  * checked:
  *
  *  1. the query produces rows (no silent saturation/emptiness), and
  *  2. a repeat run returns the identical result (the determinism the
  *     driver's hash compare depends on — all exempt queries are
  *     seeded/RNG-free by design).
  *
  * The exempt set is derived from the SAME predicate the driver uses
  * (`Queries.all` minus `SparkEntry.oracleSql` keys), so a future
  * exempt id is enrolled here automatically — it cannot opt out by
  * being forgotten.
  */
class ExemptLaneSpec extends SparkSpec {

  private val laneDir = "/root/testdata/sf0.01"

  // hoisted: oracleSql is a def that rebuilds the full SQL map per call
  private val oracleIds: Set[String] = SparkEntry.oracleSql.keySet
  private val byName: Map[String, (org.apache.spark.sql.SparkSession, String) =>
    org.apache.spark.sql.DataFrame] = Queries.all.toMap

  private val exemptIds: Seq[String] =
    Queries.all.collect {
      case (name, _) if !oracleIds.contains(name) => name
    }.toSeq

  test("exempt-id census matches the declared contract") {
    // SURVEY §2 declares 28 oracle-exempt ids as of round 10: the 25
    // from round 9 (19 from round 8 + q_graph_sssp / q_graph_kcore /
    // q_graph_closeness / q_graph_betweenness / q_graph_ktruss, each
    // golden-pinned vs a driver-side reference in GraphSpec, +
    // q_bpe_encode, cross-checked in FunctionsSpec) + round 10's
    // q_graph_betweenness_landmark and q_graph_closeness_landmark
    // (GraphSpec: K=n degenerate equality, accuracy bands, state ∝ K)
    // and q_graph_betweenness_weighted (GraphSpec: reroute golden,
    // uniform-weights == hop-count law, driver Dijkstra–Brandes
    // reference, path parity) and q_graph_eccentricity (GraphSpec:
    // driver all-pairs-Dijkstra golden over the shared multi-source
    // distance fixpoint) and q_isotonic_calibration (LawsSpec: PAV
    // monotonicity/ledger/idempotence + driver reference) and
    // q_holt_winters (LawsSpec: exact-fit law on linear+seasonal input
    // + driver recurrence parity) — 31 total; round 11 then CONVERTED
    // q_lang_id (the trigram heuristic proved ANSI-expressible) and
    // q_holt_winters (the recurrence replayed bit-exactly by a
    // recursive CTE), q_isotonic_calibration (the PAV minimax closed
    // form with exact rational pairs), q_pagerank (the fixed 15-round
    // pico-quantized loop unrolled as chained CTEs) and
    // q_graph_communities (the integer-deterministic 10-round label
    // propagation, same unrolling), and the three weighted distance
    // ids q_graph_sssp / q_graph_eccentricity / q_graph_closeness
    // (min-plus is exact cent-long arithmetic and any simple shortest
    // path on the 25-nation graph uses <= 24 edges, so 24 unrolled
    // Bellman-Ford rounds ARE the fixed point) and q_graph_kcore +
    // q_graph_ktruss (integer fixpoint/peel rounds unrolled with
    // self-checking guards), q_graph_betweenness (both Brandes phases
    // unrolled — exact sigma counts, pico-quantized delta folds) and
    // the landmark pair q_graph_betweenness_landmark /
    // q_graph_closeness_landmark (same chains seeded from the
    // md5-picked K sources — DuckDB md5 == Spark md5 — with n/K as
    // one mirrored double multiply) plus q_graph_betweenness_weighted
    // (all three chained fixpoints bounded by |V|-1 and unrolled) to
    // oracle-checked, and finally the BPE pair q_bpe_merges /
    // q_bpe_encode (12 training rounds unrolled over chr(31)-delimited
    // symbol strings — replace() IS mergePair), shrinking the set to
    // 15; round 12 then moved the minhash hash family from xxhash64 to
    // engine-portable md5 double hashing (Text.md5Pair64 ==
    // md5_number_upper/lower, h_k = (a + k·b) mod 2^63) and CONVERTED
    // q_dedup_minhash, q_dedup_cluster_minhash, q_dedup_simhash and
    // q_group_similarity to the hard oracle, shrinking the set to 11 —
    // every remaining exempt id is genuinely engine-specific:
    // probability sketches and float-arithmetic embedding ANN; round 13
    // then DELIBERATELY widened the set to 12 with q_similarity_ivfpq —
    // the fused IVFADC + re-rank path registered end to end (VERDICT
    // r12 #3), float ANN by construction, with its own recall law in
    // ExemptBoundsSpec; round 14 CONVERTED q_topk_approx_sketch (exact
    // below sketch capacity + the query's own deterministic (count, id)
    // cut — see its Scaladoc) back to the hard oracle, shrinking the
    // set to 11, and stamped the weakest remaining exemption
    // (q_dedup_embed) with its no-ANSI-replay proof: JVM-PRNG
    // hyperplane coordinates (VERDICT r13 #8); round 15 CONVERTED
    // q_similarity_lsh (md5-integer hyperplanes × 2^20-quantized
    // vectors — candidate selection is exact integer arithmetic the
    // oracle replays bit-for-bit, re-rank is the oracle-green
    // q_similarity_topk 12-dp cosine discipline), shrinking the set to
    // 10, and then CONVERTED the two remaining non-float sketches:
    // q_heavy_hitters_approx (the count-min sketch re-expressed as its
    // md5-portable RELATIONAL form — Sketches.cmsCells double-hash
    // cells, depth×width counter groupBy, broadcast min-join: exact
    // integer arithmetic end to end) and q_decontaminate_bloom (the
    // Bloom filter as md5-positional bits, k=7 Kirsch–Mitzenmacher
    // positions over m = 32·n_probe_shingles — the oracle replays the
    // bit set INCLUDING false positives), shrinking the set to 8:
    // every remaining exemption is float-arithmetic by construction
    // (HLL/GK probability estimates, embedding ANN). Widen
    // this number deliberately (with a new golden law), never by
    // accident
    assert(exemptIds.nonEmpty, "no exempt ids derived — contract drift")
    assert(exemptIds.size <= 8,
      s"exempt set grew to ${exemptIds.size} — each new exempt id needs " +
        s"its own law spec, not just this lane: $exemptIds")
  }

  for (id <- exemptIds) {
    test(s"$id: non-empty and repeat-deterministic at sf0.01") {
      val fn = byName(id)
      val first = fn(spark, laneDir).collect().map(_.toString).toSeq
      assert(first.nonEmpty,
        s"$id returned an EMPTY relation at sf0.01 — the exempt lane " +
          "exists to catch exactly this (sketch saturation, LSH bucket " +
          "collapse, Bloom over-filtering)")
      val second = fn(spark, laneDir).collect().map(_.toString).toSeq
      assert(first == second,
        s"$id is not repeat-deterministic at sf0.01 — the driver's hash " +
          "compare (and any cached materialization) requires it")
    }
  }
}
