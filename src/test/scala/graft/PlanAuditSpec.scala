package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Static plan audit across EVERY registered query: the scale-killer
  * checklist (cartesian products, unbounded nested-loop joins, lost
  * pushdown / pruning) as pinned plan properties instead of review
  * comments. Uses `sparkPlan` (pre-AQE physical plan) — AQE only ever
  * specializes these plans further at runtime, never introduces a
  * cartesian or widens a scan.
  */
class PlanAuditSpec extends SparkSpec {

  private lazy val plans: Seq[(String, SparkPlan)] =
    Queries.all.map { case (n, q) =>
      n -> q(spark, sfDir).queryExecution.sparkPlan
    }

  test("no registered query plans a cartesian product") {
    val offenders = plans.collect {
      case (n, p) if p.collect { case c: CartesianProductExec => c }.nonEmpty => n
    }
    assert(offenders.isEmpty, s"cartesian product in: $offenders")
  }

  test("nested-loop joins only with a bounded broadcast side") {
    // BNLJ is legitimate exactly where the broadcast side is provably
    // tiny: a scalar aggregate (q_tfidf's doc count), a dim-bounded
    // range table (interval/theta joins over the small side), a
    // grouped-by-category relation (q_group_similarity's lang pairs),
    // a 1-row broadcast scalar (q_composite_cold_customers' average),
    // or a bounded probe set (q_knn_join's 20 query vectors)
    val allowed =
      Set("q_tfidf", "q_join_interval", "q_heavy_hitters",
        "q_heavy_hitters_approx", "q_group_similarity", "q_pmi_bigrams",
        "q_composite_cold_customers", "q_knn_join",
        // 1-row broadcast grand totals (the windowless replacement for
        // `sum(...) OVER ()`)
        "q_chisq", "q_concentration", "q_lm_score", "q_class_weights",
        // q_rfm: 1-row reference-date + 1-row customer-count broadcasts
        "q_rfm",
        // q_basket_affinity: 1-row order-count broadcast
        "q_basket_affinity",
        // q_rolling_active: date-dimension broadcast (≤ days-elapsed
        // rows) into the bounded trailing-window fan-out join
        "q_rolling_active",
        // q_benford: 1-row total broadcast
        "q_benford",
        // q_bm25: 1-row (n_docs, avgdl) corpus-stats broadcast
        "q_bm25",
        // q_token_budget: 1-row corpus-token-total broadcast
        "q_token_budget",
        // q_survival: duration-domain-sized KM time-grid broadcasts
        // (at-risk fan-out + triangular cumulative product)
        "q_survival",
        // q_pareto: 1-row (n_users, total) broadcast
        "q_pareto",
        // q_growth_accounting: 1-row max-day broadcast
        "q_growth_accounting",
        // q_target_encoding: 1-row global-mean broadcast
        "q_target_encoding",
        // q_percentile_rank: 1-row row-count broadcast
        "q_percentile_rank",
        // q_ks_test: 1-row (n1, n2) totals broadcast
        "q_ks_test",
        // q_rolling_corr: day-dimension broadcast into the bounded
        // ≤7x trailing-window fan-out (the q_rolling_active shape)
        "q_rolling_corr",
        // q_theil: 1-row (n, Σx) moment broadcast
        "q_theil",
        // q_user_features: 1-row max-day broadcast
        "q_user_features",
        // q_abc: 1-row revenue-total broadcast
        "q_abc",
        // q_vocab_coverage: 1-row (total, n_vocab) broadcast
        "q_vocab_coverage")
    val withBnlj = plans.collect {
      case (n, p)
        if p.collect { case b: BroadcastNestedLoopJoinExec => b }.nonEmpty => n
    }.toSet
    assert(withBnlj.subsetOf(allowed), s"unexpected BNLJ in: ${withBnlj -- allowed}")
  }

  test("predicate pushdown reaches the parquet scan (q_filter)") {
    val scans = plans.toMap.apply("q_filter").collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "[]"))
    assert(pushed.exists(s => s.nonEmpty && s != "[]"),
      s"no pushed filters on the scan: $pushed")
  }

  test("column pruning reaches the parquet scan (q_project)") {
    val scans = plans.toMap.apply("q_project").collect {
      case f: FileSourceScanExec => f
    }
    // lineitem is 16 columns wide; the projection needs only 4
    val widths = scans.map(_.schema.fields.length)
    assert(widths.nonEmpty && widths.max <= 4,
      s"scan reads more columns than the projection needs: $widths")
  }
}
