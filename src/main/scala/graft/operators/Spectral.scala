package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-exact spectral analytics over embedding columns: the dominant
  * principal direction of the (quantized, mean-centered) embedding cloud
  * via power iteration, and per-vector projections onto it.
  *
  * Why integers: a float covariance fold's value depends on partition
  * reduction order, so it can never hash-match an ANSI replay. Every
  * step here is closed over BIGINT arithmetic and therefore
  * order-independent and engine-portable:
  *
  *  1. quantize x → ⌊x·256⌋ (·2⁵⁶ is a power-of-two float scale — exact
  *     in IEEE, so both engines floor the SAME double);
  *  2. one data scan accumulates the integer raw moments n, S_j = Σq_j,
  *     QQ_jk = Σq_j·q_k (partial-aggregated map-side — the shuffle is
  *     dim²+dim+1 cells per partition, never the rows);
  *  3. the centered covariance is the EXACT integer identity
  *     C_jk = QQ_jk − m_j·S_k − S_j·m_k + n·m_j·m_k with m = S tdiv n —
  *     a Gram matrix of (q − m), hence PSD for ANY integer m;
  *  4. C is rescaled to ≤ ~10⁶ by one truncating division (keeps every
  *     later product inside BIGINT at any corpus size n — C' entries are
  *     magnitude-bounded regardless of n);
  *  5. power iteration runs on the dim²-cell relation only: v₀ = 1000,
  *     v_{t+1} = tdiv(C'v_t · 1000, max|C'v_t|) — re-normalized to the
  *     ±1000 integer grid each step, 8 steps.
  *
  * tdiv is truncate-toward-zero division spelled sign·(|a| div b) on both
  * engines (Spark `div` and DuckDB `//` disagree on negative operands —
  * floor vs truncate — so neither is used bare on signed values).
  *
  * Scale shape: the only pass over the data is step 2 (and one more scan
  * for projections); everything after runs on ≤ dim²+dim+1 rows
  * (4,161 at dim 64), localCheckpoint-pinned so the 8 iteration joins
  * never re-read the corpus. Overflow budget (dim 64, |q| ≤ 256):
  * C' ≤ 2·10⁶ ⇒ |C'v| ≤ 64·2·10⁶·1000 ≈ 1.3·10¹¹, ·1000 ≈ 1.3·10¹⁴;
  * the Rayleigh numerator ·1000 stays < 2⁶³ — all inside BIGINT. */
object Spectral {

  /** Truncate-toward-zero integral division as a SQL fragment (b > 0). */
  private def tdiv(a: String, b: String): String =
    s"(CASE WHEN ($a) >= 0 THEN ($a) div ($b) ELSE -((-($a)) div ($b)) END)"

  /** ⌊x·256⌋ integer quantization of a float/double vector column. */
  def quantCol(vecCol: String): Column =
    expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 256.0) AS BIGINT))")

  /** ONE-scan raw-moment cells over the quantized vectors:
    * (j≥0, k≥0)  → QQ_jk = Σ q_j·q_k   (dim² cells)
    * (j≥0, k=−1) → S_j   = Σ q_j       (dim cells)
    * (j=−1,k=−1) → n                   (1 cell)
    * The per-row generator emits dim²+dim+1 structs that are consumed by
    * the in-stage partial hash aggregate — the shuffle carries only the
    * per-partition cell sums, so the pass is a single codegen scan at any
    * corpus size. */
  def momentCells(emb: DataFrame, vecCol: String): DataFrame = {
    val qa = emb.select(quantCol(vecCol).as("qa"))
    qa.select(explode(expr(
      """concat(
        |  flatten(transform(qa, (qj, j) -> transform(qa, (qk, k) ->
        |    named_struct('j', j, 'k', k, 'p', qj * qk)))),
        |  transform(qa, (qj, j) -> named_struct('j', j, 'k', -1, 'p', qj)),
        |  array(named_struct('j', -1, 'k', -1, 'p', CAST(1 AS BIGINT))))""".stripMargin))
        .as("c"))
      .select(col("c.j"), col("c.k"), col("c.p"))
      .groupBy("j", "k").agg(sum("p").as("moment"))
  }

  /** (j, m) truncated per-dimension means off the moment cells. */
  def means(cells: DataFrame): DataFrame = {
    val n = cells.filter(col("j") === -1 && col("k") === -1)
      .select(col("moment").as("n"))
    cells.filter(col("j") >= 0 && col("k") === -1)
      .select(col("j"), col("moment").as("sq"))
      .crossJoin(broadcast(n))
      .select(col("j"), expr(tdiv("sq", "n")).as("m"))
  }

  /** Normalized integer covariance cells C'(j,k) via the exact moment
    * identity, rescaled so |C'| ≤ ~10⁶ (n-independent overflow budget). */
  def covCells(cells: DataFrame): DataFrame = {
    val n = cells.filter(col("j") === -1 && col("k") === -1)
      .select(col("moment").as("n"))
    val sq = cells.filter(col("j") >= 0 && col("k") === -1)
      .select(col("j"), col("moment").as("sq"))
    val m = sq.crossJoin(broadcast(n))
      .select(col("j"), col("sq"), col("n"), expr(tdiv("sq", "n")).as("m"))
    val cov = cells.filter(col("j") >= 0 && col("k") >= 0)
      .select(col("j"), col("k"), col("moment").as("qq"))
      .join(m.select(col("j"), col("m").as("mj"), col("sq").as("sqj"),
        col("n")), Seq("j"))
      .join(m.select(col("j").as("k"), col("m").as("mk"),
        col("sq").as("sqk")), Seq("k"))
      .select(col("j"), col("k"),
        (col("qq") - col("mj") * col("sqk") - col("sqj") * col("mk")
          + col("n") * col("mj") * col("mk")).as("c"))
    val dn = cov.agg(
      expr(s"greatest(CAST(1 AS BIGINT), ${tdiv("max(abs(c))", "1000000")})")
        .as("dn"))
    cov.crossJoin(broadcast(dn)).select(col("j"), col("k"), expr(tdiv("c", "dn")).as("c"))
  }

  /** `iters` rounds of integer-grid power iteration on the covariance
    * cell relation; returns (k, v) with v on the ±1000 grid. Every round
    * is a join+agg over the dim²-row relation — pass a checkpointed `cp`
    * so the lineage never re-reads the corpus. */
  def powerIteration(cp: DataFrame, iters: Int): DataFrame = {
    var v = cp.filter(col("k") === col("j"))
      .select(col("j").as("k"), lit(1000L).as("v"))
    for (_ <- 1 to iters) {
      val w = cp.join(v, Seq("k"))
        .groupBy("j").agg(sum(col("c") * col("v")).as("w"))
      val mx = w.agg(
        expr("greatest(CAST(1 AS BIGINT), max(abs(w)))").as("mxw"))
      v = w.crossJoin(broadcast(mx))
        .select(col("j").as("k"), expr(tdiv("w * 1000", "mxw")).as("v"))
    }
    v
  }

  /** Dominant principal direction of the embedding cloud: one row per
    * dimension (dim, loading on the ±1000 grid) plus the constant
    * ev_permille — the Rayleigh share tdiv(vᵀC'v·1000, vᵀv·tr(C')), the
    * integer read of "how much variance PC1 explains". C PSD ⇒ the exact
    * share ∈ [0, 1000]; the C→C' truncation can wobble it by a few ‰. */
  def pc1(emb: DataFrame, vecCol: String, iters: Int = 8): DataFrame = {
    val cells = momentCells(emb, vecCol).localCheckpoint(true)
    val cp = covCells(cells).localCheckpoint(true)
    val v = powerIteration(cp, iters)
    val w = cp.join(v, Seq("k")).groupBy("j").agg(sum(col("c") * col("v")).as("w"))
    val num = v.join(w, col("k") === col("j"))
      .agg(sum(col("v") * col("w")).as("num"))
    val vtv = v.agg(sum(col("v") * col("v")).as("vtv"))
    val tr = cp.filter(col("j") === col("k")).agg(sum("c").as("tr"))
    val ev = num.crossJoin(broadcast(vtv)).crossJoin(broadcast(tr))
      .select(expr(tdiv("num * 1000", "greatest(CAST(1 AS BIGINT), vtv * tr)"))
        .as("ev_permille"))
    v.crossJoin(broadcast(ev))
      .select(col("k").cast("long").as("dim"), col("v").as("loading"),
        col("ev_permille"))
      .orderBy("dim")
  }

  /** Histogram of per-vector projections onto PC1: bucket = tdiv(proj, w)
    * with proj_i = Σ_j (q_ij − m_j)·v_j — the corpus's shape along its
    * own dominant axis (drift/diversity readout). The mean and direction
    * vectors ride along as ONE broadcast-size single-row array each, so
    * the projection pass is a second single scan with no per-element
    * shuffle. */
  def pc1Projection(emb: DataFrame, vecCol: String,
                    bucketWidth: Long = 50000L, iters: Int = 8): DataFrame = {
    val cells = momentCells(emb, vecCol).localCheckpoint(true)
    val marr = means(cells)
      .agg(expr("transform(array_sort(collect_list(struct(j, m))), s -> s.m)")
        .as("marr"))
    val varr = powerIteration(covCells(cells).localCheckpoint(true), iters)
      .agg(expr("transform(array_sort(collect_list(struct(k, v))), s -> s.v)")
        .as("varr"))
    emb.select(quantCol(vecCol).as("qa"))
      .crossJoin(broadcast(marr)).crossJoin(broadcast(varr))
      .select(expr(
        """aggregate(sequence(0, size(qa) - 1), CAST(0 AS BIGINT),
          |  (acc, i) -> acc + (qa[i] - marr[i]) * varr[i])""".stripMargin)
        .as("proj"))
      .select(expr(tdiv("proj", bucketWidth.toString)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_vecs"))
      .orderBy("bucket")
  }
}
