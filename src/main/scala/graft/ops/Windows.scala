package graft.ops

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY.md §2.5). Determinism idioms: every
  * row_number/ntile/first/last window orders by a unique key tuple
  * (rank/dense_rank may order by the semantic key alone — ties get
  * equal ranks deterministically); running double sums stay small
  * enough that round-6dp absorbs fp association differences (DuckDB
  * computes window aggregates over a segment tree, Spark
  * sequentially).
  *
  * 100 TB note: all windows partition by a high-cardinality key
  * (customer/user), so state per partition stays bounded; none of
  * these use a global (unpartitioned) window, which would serialize
  * on one task.
  */
object Windows extends OpModule {

  /** Shared Mann–Kendall SQL (win_trend_mk): exact-integer S /
    * tie-corrected variance over the `daily` relation (event_type,
    * eday, x = cents BIGINT), ONE IEEE finish for z — the
    * rollingCorrSql discipline. var18 = 18·Var(S), kept integer. */
  private def mkTrendSql(daily: String): String =
    s"""WITH d AS ($daily),
        pairs AS (
          SELECT a.event_type,
            CASE WHEN b.x > a.x THEN 1
                 WHEN b.x < a.x THEN -1 ELSE 0 END AS sg
          FROM d a JOIN d b
            ON a.event_type = b.event_type AND a.eday < b.eday),
        sstat AS (SELECT event_type, CAST(sum(sg) AS BIGINT) AS s_stat
                  FROM pairs GROUP BY 1),
        nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
               FROM d GROUP BY 1),
        ties AS (
          SELECT event_type,
            CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
          FROM (SELECT event_type, x, CAST(count(*) AS BIGINT) AS t
                FROM d GROUP BY 1, 2) g
          GROUP BY 1),
        m AS (
          SELECT sstat.event_type, nn.n, sstat.s_stat,
            nn.n * (nn.n - 1) * (2 * nn.n + 5)
              - coalesce(ties.tie_term, 0) AS var18
          FROM sstat JOIN nn ON sstat.event_type = nn.event_type
          LEFT JOIN ties ON sstat.event_type = ties.event_type),
        z AS (
          SELECT event_type, n AS n_days, s_stat, var18,
            round(CASE
              WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1e0)
                / sqrt(CAST(var18 AS DOUBLE) / 18e0)
              WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1e0)
                / sqrt(CAST(var18 AS DOUBLE) / 18e0)
              ELSE 0e0 END, 6) AS z_stat
          FROM m)
        SELECT event_type, n_days, s_stat, var18, z_stat,
          CASE WHEN z_stat > 196e-2 THEN 'up'
               WHEN z_stat < -196e-2 THEN 'down'
               ELSE 'none' END AS trend
        FROM z ORDER BY event_type"""

  /** Shared Theil–Sen SQL (win_trend_theilsen): pairwise slopes as
    * identical doubles, median via the spliced exact-percentile pair
    * (Spark `percentile` ≡ DuckDB `quantile_cont`, 6dp — the
    * agg_percentile discipline). */
  private def theilSenSql(daily: String, quantFn: String): String =
    s"""WITH d AS ($daily),
        sl AS (
          SELECT a.event_type,
            (CAST(b.x AS DOUBLE) - CAST(a.x AS DOUBLE))
              / (CAST(b.eday AS DOUBLE) - CAST(a.eday AS DOUBLE)) AS slope
          FROM d a JOIN d b
            ON a.event_type = b.event_type AND a.eday < b.eday)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
          round($quantFn(slope, 0.5), 6) AS slope_cents_per_day
        FROM sl GROUP BY 1 ORDER BY event_type"""

  /** Shared SQL for `win_skyline` — sort-based skyline on the exact
    * (brand, price-cents, size) grid; identical text on both
    * engines. ROWS ≡ RANGE on the prev-min frame because the `g`
    * relation has exactly one row per (brand, price). */
  private[graft] def skylineSql(table: String): String =
    s"""WITH p AS (
          SELECT p_brand,
            CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_c,
            p_size, count(*) AS n_parts
          FROM $table GROUP BY 1, 2, 3),
        g AS (
          SELECT p_brand, price_c, min(p_size) AS min_size
          FROM p GROUP BY 1, 2),
        c AS (
          SELECT p_brand, price_c, min_size,
            min(min_size) OVER (PARTITION BY p_brand
              ORDER BY price_c DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS prev_min
          FROM g)
        SELECT p.p_brand, p.price_c, p.p_size,
          CAST(p.n_parts AS BIGINT) AS n_parts
        FROM p JOIN c
          ON p.p_brand = c.p_brand AND p.price_c = c.price_c
        WHERE p.p_size = c.min_size
          AND (c.prev_min IS NULL OR c.prev_min > p.p_size)
        ORDER BY p.p_brand, p.price_c DESC, p.p_size"""

  /** Shared SQL for `win_acf` — 7 leads in one window pass, per-lag
    * DECIMAL-reaccumulated products, exact-moment denominator;
    * engine-spliced epoch day. */
  private[graft] def acfSql(table: String, spark: Boolean): String = {
    val day =
      if (spark) "datediff(CAST(ts AS DATE), DATE '1970-01-01')"
      else "(CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01')"
    val leads = (1 to 7)
      .map(k => s"lead(x, $k) OVER w AS x$k").mkString(", ")
    // nums is an ENGINE SPLICE (r21, guide §2.3 — aggregate before
    // you shuffle). The original shared form was a UNION ALL of 7
    // branches, each re-joining l⋈m and re-aggregating by event_type
    // — 7 joins + 7 grouped aggregates + 7 exchanges over the same
    // tiny relation. Spark computes the 7 lag sums in ONE join + ONE
    // grouped aggregate (each branch's WHERE x_k IS NOT NULL becomes
    // the CASE inside its sum — sum skips NULLs, identical DECIMAL
    // terms) and unpivots with stack(); a lag with no qualifying rows
    // produced NO row in the UNION form, so NULL nums are dropped to
    // match. DuckDB keeps the UNION form (stack is Spark-only; its
    // planner flattens the union cheaply) — same relation, re-proven
    // by the driver's hash gate per engine-splice discipline.
    val nums =
      if (spark) {
        val sums = (1 to 7).map { k =>
          s"""CAST(round(sum(CASE WHEN l.x$k IS NOT NULL
                THEN CAST((CAST(l.x AS DOUBLE) - m.mu)
                  * (CAST(l.x$k AS DOUBLE) - m.mu) AS DECIMAL(38,10))
                END), 6) AS DOUBLE) AS num$k"""
        }.mkString(", ")
        val stackArgs = (1 to 7).map(k => s"$k, num$k").mkString(", ")
        s"""SELECT et, lag, num FROM (
              SELECT et, stack(7, $stackArgs) AS (lag, num) FROM (
                SELECT l.event_type AS et, $sums
                FROM l JOIN m ON l.event_type = m.event_type
                GROUP BY l.event_type) s1) s2
            WHERE num IS NOT NULL"""
      } else (1 to 7).map { k =>
      s"""SELECT l.event_type AS et, $k AS lag,
            CAST(round(sum(CAST((CAST(l.x AS DOUBLE) - m.mu)
                * (CAST(l.x$k AS DOUBLE) - m.mu) AS DECIMAL(38,10))),
              6) AS DOUBLE) AS num
          FROM l JOIN m ON l.event_type = m.event_type
          WHERE l.x$k IS NOT NULL
          GROUP BY l.event_type"""
          // GROUP BY the column only — grouping by the positional
          // CONSTANT ($k AS lag) makes DuckDB bind every literal $k
          // in the select list to the grouping key, including
          // round()'s precision argument (lag-6 branch: "ROUND with
          // non-constant precision")
    }.mkString("\n          UNION ALL\n          ")
    s"""WITH daily AS (
          SELECT event_type, CAST($day AS INTEGER) AS eday,
            CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
              AS x
          FROM $table GROUP BY 1, 2),
        mom AS (
          SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
            CAST(sum(CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sx,
            CAST(sum(CAST(x*x AS DECIMAL(25,0))) AS DOUBLE) AS sxx
          FROM daily GROUP BY event_type),
        m AS (
          SELECT event_type, sx / n AS mu, sxx - sx * sx / n AS den
          FROM mom),
        l AS (
          SELECT event_type, eday, x, $leads
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY eday)),
        nums AS (
          $nums)
        SELECT nums.et AS event_type, CAST(nums.lag AS INTEGER) AS lag,
          CASE WHEN m.den = 0 THEN NULL
            ELSE round(nums.num / m.den, 6)
          END AS acf
        FROM nums JOIN m ON nums.et = m.event_type
        ORDER BY event_type, lag"""
  }

  /** Shared SQL for `win_forecast_backtest` — naive vs seasonal-naive
    * one-step backtest on the daily cents series; integer error sums,
    * calendar-gap-safe lags (a lag is scored only when the lagged ROW
    * is exactly 1/7 calendar days back); engine-spliced epoch day. */
  private def forecastBacktestSql(table: String, spark: Boolean): String = {
    val day =
      if (spark) "datediff(CAST(ts AS DATE), DATE '1970-01-01')"
      else "(CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01')"
    s"""WITH daily AS (
          SELECT event_type, CAST($day AS INTEGER) AS eday,
            CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
              AS x
          FROM $table GROUP BY 1, 2),
        l AS (
          SELECT event_type, eday, x,
            lag(eday, 1) OVER w AS d1, lag(x, 1) OVER w AS x1,
            lag(eday, 7) OVER w AS d7, lag(x, 7) OVER w AS x7
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY eday)),
        scored AS (
          SELECT event_type, x,
            abs(x - x1) AS en, abs(x - x7) AS es, x + x7 AS den_s
          FROM l WHERE d1 = eday - 1 AND d7 = eday - 7)
        SELECT event_type,
          CAST(count(*) AS BIGINT) AS n_scored,
          round(CAST(sum(en) AS DOUBLE)
            / CAST(count(*) AS DOUBLE), 6) AS mae_naive,
          round(CAST(sum(es) AS DOUBLE)
            / CAST(count(*) AS DOUBLE), 6) AS mae_snaive,
          round(CAST(sum(es) AS DOUBLE)
            / CAST(sum(x) AS DOUBLE), 6) AS wape_snaive,
          round(CAST(2 * sum(es) AS DOUBLE)
            / CAST(sum(den_s) AS DOUBLE), 6) AS smape_snaive,
          CASE WHEN sum(en) = 0 THEN NULL
            ELSE round(CAST(sum(es) AS DOUBLE)
              / CAST(sum(en) AS DOUBLE), 6) END AS mase
        FROM scored GROUP BY event_type
        ORDER BY event_type"""
  }

  /** Shared SQL for `win_seasonal_strength` — exact daily cents,
    * per-dow means, DECIMAL-reaccumulated residual moments;
    * engine-spliced epoch day. */
  private def seasonalStrengthSql(table: String, spark: Boolean): String = {
    val day =
      if (spark) "datediff(CAST(ts AS DATE), DATE '1970-01-01')"
      else "(CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01')"
    s"""WITH daily AS (
          SELECT event_type, CAST($day AS INTEGER) AS eday,
            CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
              AS x
          FROM $table GROUP BY 1, 2),
        dw AS (
          SELECT event_type, eday % 7 AS dow, x FROM daily),
        dm AS (
          SELECT event_type, dow,
            CAST(sum(CAST(x AS DECIMAL(18,0))) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) AS mu_dow
          FROM dw GROUP BY 1, 2),
        r AS (
          SELECT dw.event_type, CAST(dw.x AS DOUBLE) - dm.mu_dow AS rr,
            dw.x
          FROM dw JOIN dm
            ON dw.event_type = dm.event_type AND dw.dow = dm.dow),
        m AS (
          SELECT event_type,
            CAST(count(*) AS DOUBLE) AS n,
            CAST(sum(CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sx,
            CAST(sum(CAST(x*x AS DECIMAL(25,0))) AS DOUBLE) AS sxx,
            CAST(round(sum(CAST(rr AS DECIMAL(38,10))), 6) AS DOUBLE)
              AS sr,
            CAST(round(sum(CAST(rr*rr AS DECIMAL(38,10))), 6)
              AS DOUBLE) AS srr
          FROM r GROUP BY event_type)
        SELECT event_type, CAST(n AS BIGINT) AS n_days,
          CASE WHEN n < 2 THEN NULL ELSE
            round((sxx - sx * sx / n) / (n - 1e0) / 1e4, 6)
          END AS var_total,
          CASE WHEN n < 2 THEN NULL ELSE
            round((srr - sr * sr / n) / (n - 1e0) / 1e4, 6)
          END AS var_resid,
          CASE WHEN n < 2 OR sxx - sx * sx / n = 0 THEN NULL ELSE
            round(greatest(0e0,
              1e0 - ((srr - sr * sr / n) / (n - 1e0))
                / ((sxx - sx * sx / n) / (n - 1e0))), 6)
          END AS strength
        FROM m ORDER BY event_type"""
  }

  /** Shared SQL for `win_we_rules` — per-series exact moments, then
    * conditional frame counts; engine-spliced epoch day. */
  private def weRulesSql(table: String, spark: Boolean): String = {
    val day =
      if (spark) "datediff(CAST(ts AS DATE), DATE '1970-01-01')"
      else "(CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01')"
    s"""WITH daily AS (
          SELECT event_type, CAST($day AS INTEGER) AS eday,
            CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
              AS x
          FROM $table GROUP BY 1, 2),
        st AS (
          SELECT event_type,
            CAST(count(*) AS DECIMAL(11,0)) AS n,
            CAST(sum(CAST(x AS DECIMAL(18,0))) AS DECIMAL(18,0)) AS sx,
            CAST(sum(CAST(x*x AS DECIMAL(25,0))) AS DECIMAL(25,0)) AS sxx
          FROM daily GROUP BY event_type),
        c AS (
          SELECT event_type,
            CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
            CASE WHEN n < 2 OR CAST(n AS DECIMAL(37,0))*sxx
                   - CAST(sx AS DECIMAL(37,0))*sx = 0 THEN NULL
              ELSE sqrt(CAST(CAST(n AS DECIMAL(37,0))*sxx
                   - CAST(sx AS DECIMAL(37,0))*sx AS DOUBLE)
                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1e0)))
            END AS sd
          FROM st),
        s AS (
          SELECT d.event_type, d.eday, d.x,
            (CAST(d.x AS DOUBLE) - c.mu) / c.sd AS su
          FROM daily d JOIN c ON d.event_type = c.event_type),
        f AS (
          SELECT event_type, eday, x, su,
            CAST(sum(CASE WHEN su > 2e0 THEN 1 ELSE 0 END)
              OVER w3 AS INTEGER) AS hi2,
            CAST(sum(CASE WHEN su < -2e0 THEN 1 ELSE 0 END)
              OVER w3 AS INTEGER) AS lo2,
            CAST(sum(CASE WHEN su > 1e0 THEN 1 ELSE 0 END)
              OVER w5 AS INTEGER) AS hi1,
            CAST(sum(CASE WHEN su < -1e0 THEN 1 ELSE 0 END)
              OVER w5 AS INTEGER) AS lo1,
            CAST(sum(CASE WHEN su > 0e0 THEN 1 ELSE 0 END)
              OVER w8 AS INTEGER) AS hi0,
            CAST(sum(CASE WHEN su < 0e0 THEN 1 ELSE 0 END)
              OVER w8 AS INTEGER) AS lo0,
            CAST(count(*) OVER w8 AS INTEGER) AS n8
          FROM s
          WINDOW w3 AS (PARTITION BY event_type ORDER BY eday
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 w5 AS (PARTITION BY event_type ORDER BY eday
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
                 w8 AS (PARTITION BY event_type ORDER BY eday
                        ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
        SELECT event_type, eday, x, round(su, 6) AS sigma_units,
          abs(su) > 3e0 AS rule1,
          hi2 >= 2 OR lo2 >= 2 AS rule2,
          hi1 >= 4 OR lo1 >= 4 AS rule3,
          n8 = 8 AND (hi0 = 8 OR lo0 = 8) AS rule4,
          (abs(su) > 3e0) OR (hi2 >= 2 OR lo2 >= 2)
            OR (hi1 >= 4 OR lo1 >= 4)
            OR (n8 = 8 AND (hi0 = 8 OR lo0 = 8)) AS alert
        FROM f ORDER BY event_type, eday"""
  }

  /** Shared SQL for `win_runs_test` — exact-int runs counting over
    * the zero-free delta-sign sequence; engine-spliced epoch day.
    * n2 = n₊+n₋, p2 = 2·n₊·n₋ kept integer; z IEEE-finished. */
  private def runsSql(table: String, spark: Boolean): String = {
    val day =
      if (spark) "datediff(CAST(ts AS DATE), DATE '1970-01-01')"
      else "(CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01')"
    s"""WITH daily AS (
          SELECT event_type, CAST($day AS INTEGER) AS eday,
            CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
              AS x
          FROM $table GROUP BY 1, 2),
        del AS (
          SELECT event_type, eday,
            CASE WHEN x > lag(x) OVER w THEN 1
                 WHEN x < lag(x) OVER w THEN -1 ELSE 0 END AS sg
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY eday)),
        nz AS (
          SELECT event_type, eday, sg,
            lag(sg) OVER (PARTITION BY event_type ORDER BY eday)
              AS prev_sg
          FROM del WHERE sg <> 0),
        agg AS (
          SELECT event_type,
            CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_pos,
            CAST(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_neg,
            CAST(1 + sum(CASE WHEN prev_sg IS NOT NULL
                 AND sg <> prev_sg THEN 1 ELSE 0 END) AS BIGINT)
              AS runs
          FROM nz GROUP BY event_type),
        m AS (
          SELECT event_type, n_pos, n_neg, runs,
            CAST(n_pos + n_neg AS DOUBLE) AS n2,
            CAST(2 * n_pos * n_neg AS DOUBLE) AS p2
          FROM agg)
        SELECT event_type, n_pos, n_neg, runs,
          CASE WHEN n2 = 0 THEN NULL
            ELSE round(1e0 + p2 / n2, 6) END AS expected_runs,
          CASE WHEN n2 < 2 OR p2 * (p2 - n2) <= 0 THEN NULL
            ELSE round((CAST(runs AS DOUBLE) - (1e0 + p2 / n2))
              / sqrt(p2 * (p2 - n2) / (n2 * n2 * (n2 - 1e0))), 6)
          END AS z_stat,
          CASE WHEN n2 < 2 OR p2 * (p2 - n2) <= 0 THEN NULL
            ELSE abs(round((CAST(runs AS DOUBLE) - (1e0 + p2 / n2))
              / sqrt(p2 * (p2 - n2) / (n2 * n2 * (n2 - 1e0))), 6))
              < 196e-2
          END AS random
        FROM m ORDER BY event_type"""
  }

  /** Shared SQL for `win_peak_detect` — exact-int lag/lead extrema
    * over the daily cents relation; engine-spliced epoch day. */
  private def peakSql(table: String, spark: Boolean): String = {
    val day =
      if (spark) "datediff(CAST(ts AS DATE), DATE '1970-01-01')"
      else "(CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01')"
    s"""WITH daily AS (
          SELECT event_type, CAST($day AS INTEGER) AS eday,
            CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
              AS x
          FROM $table GROUP BY 1, 2),
        n AS (
          SELECT event_type, eday, x,
            lag(x) OVER w AS prev_x, lead(x) OVER w AS next_x
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY eday))
        SELECT event_type, eday, x,
          CAST(x - prev_x AS BIGINT) AS d_prev,
          CAST(next_x - x AS BIGINT) AS d_next,
          x > prev_x AND x >= next_x AS is_peak,
          x < prev_x AND x <= next_x AS is_valley
        FROM n
        WHERE prev_x IS NOT NULL AND next_x IS NOT NULL
        ORDER BY event_type, eday"""
  }

  /** Shared SQL for `win_vwap` — exact integer cumulants (cents ×
    * centi-unit products summed in DECIMAL), one IEEE division per
    * day row; only the epoch-day expression is engine-spliced. The
    * daily accumulators are DECIMAL(38,0)/(19,0) — wide enough that
    * a hot (flag, day) group with billions of ~1e11 cent-products
    * cannot overflow (Spark non-ANSI turns a DECIMAL overflow into a
    * silent NULL vwap row); the per-row product stays DECIMAL(15,0),
    * which the ~1e11 grid bound fits with headroom. */
  private def vwapSql(table: String): String = {
    val day =
      if (table.startsWith("graft_"))
        "datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')"
      else
        "(CAST(l_shipdate AS DATE) - DATE '1970-01-01')"
    s"""WITH r AS (
          SELECT l_returnflag, CAST($day AS INTEGER) AS eday,
            CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS p,
            CAST(round(l_quantity * 100, 0) AS BIGINT) AS q
          FROM $table),
        daily AS (
          SELECT l_returnflag, eday,
            CAST(sum(CAST(p*q AS DECIMAL(15,0))) AS DECIMAL(38,0)) AS pv,
            CAST(sum(CAST(q AS DECIMAL(12,0))) AS DECIMAL(19,0)) AS v
          FROM r GROUP BY l_returnflag, eday),
        c AS (
          SELECT l_returnflag, eday,
            CAST(sum(pv) OVER w AS DOUBLE) AS cpv,
            CAST(sum(v) OVER w AS DOUBLE) AS cv
          FROM daily
          WINDOW w AS (PARTITION BY l_returnflag ORDER BY eday
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT l_returnflag, eday,
          round(cpv / cv / 1e2, 6) AS vwap
        FROM c ORDER BY l_returnflag, eday"""
  }

  override def ops: Seq[Op] = Seq(

    Op("win_ranking",
      (s, d) => {
        val byDateUnique = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        val byDate = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            row_number().over(byDateUnique).as("rn"),
            rank().over(byDate).as("rnk"),
            dense_rank().over(byDate).as("drnk"),
            ntile(4).over(byDateUnique).as("quartile"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
                CAST(row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC, o_orderkey ASC) AS INTEGER) AS rn,
                CAST(rank() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC) AS INTEGER) AS rnk,
                CAST(dense_rank() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC) AS INTEGER) AS drnk,
                CAST(ntile(4) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC, o_orderkey ASC) AS INTEGER) AS quartile
              FROM orders ORDER BY o_orderkey""")),

    Op("win_lag_lead",
      // inter-event gap per user in exact integer microseconds
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            lag(col("event_id"), 1).over(w).as("prev_event_id"),
            lead(col("event_id"), 1).over(w).as("next_event_id"),
            (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
              .as("gap_us"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
                lag(event_id, 1) OVER w AS prev_event_id,
                lead(event_id, 1) OVER w AS next_event_id,
                epoch_us(CAST(ts AS TIMESTAMP))
                  - epoch_us(lag(CAST(ts AS TIMESTAMP), 1) OVER w) AS gap_us
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
              ORDER BY event_id""")),

    Op("win_running",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            round(sum(col("o_totalprice")).over(w), 6).as("running_spend"),
            count(lit(1)).over(w).as("running_orders"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
                round(sum(o_totalprice) OVER w, 6) AS running_spend,
                count(*) OVER w AS running_orders
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                ORDER BY o_orderdate ASC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              ORDER BY o_orderkey""")),

    Op("win_range_frame",
      // 7-day trailing spend per user: RANGE frame over epoch seconds.
      // RANGE includes all peers of the current key value in both
      // engines, so no tiebreak is needed for determinism.
      (s, d) => Tables.events(s, d)
        .withColumn("epoch_s", unix_micros(col("ts")).divide(lit(1000000L)).cast("long"))
        .select(col("event_id"), col("user_id"), col("epoch_s"),
          round(sum(col("value")).over(
            Window.partitionBy("user_id").orderBy(col("epoch_s").asc)
              .rangeBetween(-7L * 86400L, 0L)), 6).as("spend_7d"))
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id,
                epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS epoch_s,
                round(sum(value) OVER (PARTITION BY user_id
                  ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 ASC
                  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 6) AS spend_7d
              FROM events ORDER BY event_id""")),

    Op("win_first_last",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            first(col("o_totalprice")).over(w).as("first_price"),
            last(col("o_totalprice")).over(w).as("latest_price"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
                first_value(o_totalprice) OVER w AS first_price,
                last_value(o_totalprice) OVER w AS latest_price
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                ORDER BY o_orderdate ASC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY o_orderkey""")),

    Op("win_cume_pct",
      // relative-position family completing §2.5: percent_rank =
      // (rank−1)/(n−1) and cume_dist = peers_cume/n are divisions of
      // exact integers — IEEE-754 division is exactly specified, so
      // both engines emit bit-identical doubles with no rounding
      // needed. Tie-aware by the semantic key (o_totalprice) on
      // purpose: peers share pr/cd deterministically in both engines.
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").asc)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
                percent_rank() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice ASC) AS pr,
                cume_dist() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice ASC) AS cd
              FROM orders ORDER BY o_orderkey""")),

    Op("win_topk_group",
      // idiomatic Spark top-k-per-key: rank window + filter — at scale
      // this is one shuffle on the group key, no global sort
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice
              FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                      row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                    FROM orders)
              WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    Op("win_ntile",
      // equi-depth bucketing per partition (quartiles of a customer's
      // order values). ntile is SQL-standard in both engines: the
      // first `n_rows mod k` buckets get one extra row, assignment
      // follows the ORDER BY — deterministic because the order is a
      // total one (price, then unique orderkey). Integer output, no
      // float concerns. At scale this is one shuffle on the partition
      // key with bounded per-partition state, same as every window
      // here.
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            ntile(4).over(w).as("quartile"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
                CAST(ntile(4) OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice ASC, o_orderkey ASC) AS INTEGER)
                  AS quartile
              FROM orders ORDER BY o_orderkey""")),

    Op("win_ewma",
      // exponentially-weighted moving average (α = 0.25) of each
      // user's reading series — the smoothing primitive behind rate
      // limiters, load estimators and drift monitors. EWMA is a
      // RECURSIVE fold (acc ← α·x + (1−α)·acc), which no frame-based
      // window aggregate expresses exactly, and a pow()-expanded
      // rendering would not hash-match (libm). Both engines instead
      // LEFT-FOLD the identical lambda over the identically-ordered
      // value list (Spark `aggregate` HOF over an array_sort'ed
      // collect_list keyed by the unique (ts_us, event_id) tuple ≡
      // DuckDB `list_reduce` over `list(... ORDER BY ...)`; constants
      // in exponent form, 25e-2, so both parse DOUBLE) — same IEEE
      // ops in the same order ⇒ bit-identical doubles, no rounding.
      // The per-user array buffer is the oracle-exact form's cost;
      // EWMA itself needs O(1) state, so the unbounded-scale path is
      // the streaming stateful fold (stream_stateful_fold /
      // transformWithState), where this fold runs incrementally with
      // one accumulator per key and no buffering.
      (s, d) => {
        val series = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_id"), col("value"))
          .groupBy("user_id")
          .agg(array_sort(collect_list(
            struct(col("ts_us"), col("event_id"), col("value")))).as("xs"))
          .select(col("user_id"),
            expr("transform(xs, x -> x.value)").as("vs"))
        series.select(col("user_id"), size(col("vs")).as("n_obs"),
            expr("""aggregate(slice(vs, 2, size(vs)),
                    CAST(element_at(vs, 1) AS DOUBLE),
                    (acc, x) -> 25e-2 * x + 75e-2 * acc)""").as("ewma"))
          .orderBy("user_id")
      },
      Some("""WITH s AS (
                SELECT user_id,
                  list(value ORDER BY epoch_us(CAST(ts AS TIMESTAMP)),
                       event_id) AS vs
                FROM events GROUP BY user_id)
              SELECT user_id, CAST(len(vs) AS INTEGER) AS n_obs,
                list_reduce(vs, (acc, x) -> 25e-2 * x + 75e-2 * acc) AS ewma
              FROM s ORDER BY user_id""")),

    Op("win_seasonal_dow",
      // seasonal decomposition, the operational form: a day-of-week
      // BASELINE per series (the dominant cycle in event data) and
      // the residual against it — the first thing an on-call person
      // wants from a traffic anomaly ("is Monday low, or is Monday
      // always low?"); z-score/MAD flag points against a GLOBAL
      // center, this flags against the seasonal expectation. Two
      // map-combined aggregates (daily totals, then dow means over
      // the tiny |series|×7 relation) + one broadcast-back join —
      // at 100 TB only group-cardinality rows ever cross a shuffle.
      // Determinism: days are INTEGER epoch-days, dow is PURE
      // integer arithmetic ((eday+4) mod 7, 1970-01-01 being a
      // Thursday — no engine dow() with its own week convention),
      // totals/means are DECIMAL-accumulated then rounded (§5.2),
      // residual subtracts two already-rounded doubles (exact on
      // both engines).
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
              .as("eday"))
          .agg(dsum(col("value")).as("daily_total"))
        val withDow = daily.withColumn("dow", pmod(col("eday") + 4, lit(7)))
        val dowMean = withDow.groupBy("event_type", "dow")
          .agg(davg(col("daily_total")).as("dow_mean"))
        withDow.join(broadcast(dowMean), Seq("event_type", "dow"))
          .withColumn("residual", round(col("daily_total") - col("dow_mean"), 6))
          .withColumn("spike", abs(col("residual")) > col("dow_mean") * 0.5)
          .select("event_type", "eday", "dow", "daily_total", "dow_mean",
            "residual", "spike")
          .orderBy("event_type", "eday")
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  CAST(date_diff('day', DATE '1970-01-01',
                    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
                    AS INTEGER) AS eday,
                  CAST(round(sum(CAST(value AS DECIMAL(38,10))), 6) AS DOUBLE)
                    AS daily_total
                FROM events GROUP BY 1, 2),
              wd AS (
                SELECT *, (eday + 4) % 7 AS dow FROM daily),
              dm AS (
                SELECT event_type, dow,
                  round(CAST(sum(CAST(daily_total AS DECIMAL(38,10))) AS DOUBLE)
                    / count(daily_total), 6) AS dow_mean
                FROM wd GROUP BY 1, 2)
              SELECT wd.event_type, wd.eday, wd.dow, wd.daily_total,
                dm.dow_mean,
                round(wd.daily_total - dm.dow_mean, 6) AS residual,
                (abs(round(wd.daily_total - dm.dow_mean, 6))
                  > dm.dow_mean * 0.5) AS spike
              FROM wd JOIN dm
                ON wd.event_type = dm.event_type AND wd.dow = dm.dow
              ORDER BY wd.event_type, wd.eday""")),

    Op("win_holt_forecast",
      // Holt's linear-trend method (double exponential smoothing,
      // α=0.5, β=0.3) over each event type's daily-total series, with
      // the 1-step-ahead forecast ŷ = ℓ + b — the capacity-planning
      // smoother one notch up from win_ewma (EWMA flat-lines on a
      // trending series; Holt tracks the slope). A TWO-state
      // recursive fold (ℓ ← α·x + (1−α)(ℓ+b); b ← β(ℓ'−ℓ) + (1−β)b),
      // so the win_ewma discipline extends with one trick: both
      // engines fold over the series mapped to [x, 0] PAIRS, making
      // the accumulator ([ℓ, b]) and the elements the same list type
      // — DuckDB's init-less list_reduce then starts from the first
      // element, which IS the textbook init (ℓ₀ = x₀, b₀ = 0), and
      // Spark's `aggregate` is given that same element explicitly.
      // ℓ' appears inside the b update — both engines INLINE its
      // expression rather than let-bind (same repeated IEEE ops, same
      // order ⇒ bit-identical; the winnow CollapseProject lesson says
      // never let-bind through a subquery into a lambda anyway).
      // Constants in exponent form (5e-1/3e-1/7e-1) parse DOUBLE on
      // both engines. Daily totals are dsum-deterministic. The
      // per-type array buffer is the oracle-exact cost; like EWMA the
      // production form is the O(1)-state streaming fold.
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            datediff(col("ts").cast("date"),
              to_date(lit("1970-01-01"))).as("eday"))
          .agg(dsum(col("value")).as("v"))
        daily.groupBy("event_type")
          .agg(array_sort(collect_list(struct(col("eday"), col("v"))))
            .as("xs"))
          .select(col("event_type"),
            expr("transform(xs, x -> array(x.v, 0e0))").as("vs"))
          .select(col("event_type"), size(col("vs")).as("n_days"),
            expr("""aggregate(slice(vs, 2, size(vs)),
                    element_at(vs, 1),
                    (acc, e) -> array(
                      5e-1 * e[0] + 5e-1 * (acc[0] + acc[1]),
                      3e-1 * ((5e-1 * e[0] + 5e-1 * (acc[0] + acc[1]))
                              - acc[0]) + 7e-1 * acc[1]))""").as("lt"))
          .select(col("event_type"), col("n_days"),
            col("lt")(0).as("level"), col("lt")(1).as("trend"),
            (col("lt")(0) + col("lt")(1)).as("forecast_next"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  CAST(date_diff('day', DATE '1970-01-01',
                    CAST(date_trunc('day', ts) AS DATE)) AS INTEGER) AS eday,
                  CAST(round(sum(CAST(value AS DECIMAL(38,10))), 6) AS DOUBLE)
                    AS v
                FROM events GROUP BY 1, 2),
              s AS (
                SELECT event_type,
                  list_transform(list(v ORDER BY eday), x -> [x, 0e0]) AS vs
                FROM daily GROUP BY event_type),
              r AS (
                SELECT event_type, len(vs) AS n_days,
                  list_reduce(vs, (acc, e) -> [
                    5e-1 * e[1] + 5e-1 * (acc[1] + acc[2]),
                    3e-1 * ((5e-1 * e[1] + 5e-1 * (acc[1] + acc[2]))
                            - acc[1]) + 7e-1 * acc[2]]) AS lt
                FROM s)
              SELECT event_type, CAST(n_days AS INTEGER) AS n_days,
                lt[1] AS level, lt[2] AS trend,
                lt[1] + lt[2] AS forecast_next
              FROM r ORDER BY event_type""")),

    Op("win_rsi",
      // Wilder's Relative Strength Index (RSI, 1978) over each event
      // type's daily-total series — the bounded [0,100] momentum
      // oscillator that completes the finance-window family beside
      // bollinger/drawdown/ohlc: smoothed average gain vs smoothed
      // average loss of the day-over-day deltas, RSI = 100 −
      // 100/(1+RS). Wilder smoothing IS an EWMA with α = 1/14
      // (avg' = (13·avg + x)/14), here seeded at zero (the init-less
      // fold variant; Wilder's 14-day SMA seed converges to the same
      // recursion and a seed choice is a convention, not a
      // correctness axis — both engines run the SAME one). A
      // THREE-state recursive fold ([prev, avgGain, avgLoss] — the
      // delta needs the previous value), so the win_holt pair trick
      // extends to triples: elements mapped to [x, 0, 0], the first
      // element is the textbook init (prev=x₀, avgs 0), deltas via
      // greatest(±(x−prev), 0) inlined, constants in exponent form.
      // avgLoss = 0 (monotone non-decreasing series) → RSI 100 by
      // the standard convention, as a CASE both engines share.
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            datediff(col("ts").cast("date"),
              to_date(lit("1970-01-01"))).as("eday"))
          .agg(dsum(col("value")).as("v"))
        daily.groupBy("event_type")
          .agg(array_sort(collect_list(struct(col("eday"), col("v"))))
            .as("xs"))
          .select(col("event_type"),
            expr("transform(xs, x -> array(x.v, 0e0, 0e0))").as("vs"))
          .select(col("event_type"), size(col("vs")).as("n_days"),
            expr("""aggregate(slice(vs, 2, size(vs)),
                    element_at(vs, 1),
                    (acc, e) -> array(
                      e[0],
                      (acc[1] * 13e0 + greatest(e[0] - acc[0], 0e0)) / 14e0,
                      (acc[2] * 13e0 + greatest(acc[0] - e[0], 0e0)) / 14e0))""")
              .as("r"))
          .select(col("event_type"), col("n_days"),
            col("r")(1).as("avg_gain"), col("r")(2).as("avg_loss"),
            expr("""CASE WHEN r[2] = 0e0 THEN 1e2
                    ELSE 1e2 - 1e2 / (1e0 + r[1] / r[2]) END""").as("rsi"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  CAST(date_diff('day', DATE '1970-01-01',
                    CAST(date_trunc('day', ts) AS DATE)) AS INTEGER) AS eday,
                  CAST(round(sum(CAST(value AS DECIMAL(38,10))), 6) AS DOUBLE)
                    AS v
                FROM events GROUP BY 1, 2),
              s AS (
                SELECT event_type,
                  list_transform(list(v ORDER BY eday),
                    x -> [x, 0e0, 0e0]) AS vs
                FROM daily GROUP BY event_type),
              r AS (
                SELECT event_type, len(vs) AS n_days,
                  list_reduce(vs, (acc, e) -> [
                    e[1],
                    (acc[2] * 13e0 + greatest(e[1] - acc[1], 0e0)) / 14e0,
                    (acc[3] * 13e0 + greatest(acc[1] - e[1], 0e0)) / 14e0])
                    AS rr
                FROM s)
              SELECT event_type, CAST(n_days AS INTEGER) AS n_days,
                rr[2] AS avg_gain, rr[3] AS avg_loss,
                CASE WHEN rr[3] = 0e0 THEN 1e2
                     ELSE 1e2 - 1e2 / (1e0 + rr[2] / rr[3]) END AS rsi
              FROM r ORDER BY event_type""")),

    Op("win_survival_km",
      // Kaplan–Meier survival curve over user churn (churn event = a
      // user's LAST active day): S(t) = Π_{i≤t} (1 − d_i/n_i) with
      // d_i = churns on day i and n_i = users still at risk — THE
      // standard retention/survival estimator (product-limit,
      // Kaplan & Meier 1958). The risk set n_i is a suffix sum (one
      // descending-ordered window over the tiny |days| relation); the
      // product chain is recursive, so the fold discipline applies —
      // with a twist: per-day outputs need the RUNNING product, so
      // the accumulator GROWS (a list of S values). Both engines keep
      // accumulator and element the same list-of-double type (the
      // Holt pair trick generalized): elements are [d, n] pairs, the
      // accumulator is the S list seeded EMPTY (prepended on the
      // DuckDB side; Spark passes it explicitly), and
      // try_element_at(acc, −1) / acc[−1] read "previous S or 1.0"
      // identically. Fixed-order IEEE mults ⇒ bit-identical doubles.
      // Scale: the per-user last-day aggregate collapses the log
      // map-side; everything after runs on |distinct days| rows.
      (s, d) => {
        val eday = datediff(col("ts").cast("date"),
          to_date(lit("1970-01-01")))
        val lastd = Tables.events(s, d)
          .groupBy("user_id").agg(max(eday).as("lday"))
        val dd = lastd.groupBy("lday").agg(count(lit(1)).as("d"))
        val wDesc = Window.orderBy(col("lday").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val rk = dd.withColumn("n", sum("d").over(wDesc))
        rk.agg(expr(
            """array_sort(collect_list(struct(
               lday, CAST(d AS DOUBLE) AS dd, CAST(n AS DOUBLE) AS nn)))""")
            .as("a"))
          .select(
            expr("transform(a, x -> x.lday)").as("days"),
            expr("transform(a, x -> CAST(x.dd AS BIGINT))").as("ds"),
            expr("transform(a, x -> CAST(x.nn AS BIGINT))").as("ns"),
            expr("""aggregate(
                    transform(a, x -> array(x.dd, x.nn)),
                    CAST(array() AS ARRAY<DOUBLE>),
                    (acc, e) -> concat(acc, array(
                      coalesce(try_element_at(acc, -1), CAST(1 AS DOUBLE))
                        * (CAST(1 AS DOUBLE) - e[0] / e[1]))))""")
              .as("surv"))
          .select(explode(arrays_zip(col("days"), col("ds"), col("ns"),
            col("surv"))).as("z"))
          .select(col("z.days").as("lday"), col("z.ds").as("d_churned"),
            col("z.ns").as("n_at_risk"), col("z.surv").as("survival"))
          .orderBy("lday")
      },
      Some("""WITH lastd AS (
                SELECT user_id,
                  max(CAST(date_diff('day', DATE '1970-01-01',
                    CAST(ts AS DATE)) AS INTEGER)) AS lday
                FROM events GROUP BY 1),
              dd AS (SELECT lday, count(*) AS d FROM lastd GROUP BY 1),
              rk AS (
                SELECT lday, d,
                  sum(d) OVER (ORDER BY lday DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
                FROM dd),
              arr AS (
                SELECT list(lday ORDER BY lday) AS days,
                  list(CAST(d AS BIGINT) ORDER BY lday) AS ds,
                  list(CAST(n AS BIGINT) ORDER BY lday) AS ns,
                  list([CAST(d AS DOUBLE), CAST(n AS DOUBLE)]
                    ORDER BY lday) AS xs
                FROM rk),
              f AS (
                SELECT days, ds, ns,
                  list_reduce(list_prepend(CAST([] AS DOUBLE[]), xs),
                    (acc, e) -> list_append(acc,
                      coalesce(acc[-1], CAST(1 AS DOUBLE))
                        * (CAST(1 AS DOUBLE) - e[1] / e[2]))) AS surv
                FROM arr)
              SELECT unnest(days) AS lday, unnest(ds) AS d_churned,
                unnest(ns) AS n_at_risk, unnest(surv) AS survival
              FROM f ORDER BY lday""")),

    Op("win_cusum_drift",
      // one-sided CUSUM drift detection (Page 1954 — the SPC
      // changepoint primitive): s ← max(0, s + (x − k)) over each
      // event type's daily-total series, drift declared when the
      // running excursion ever clears the decision interval h. Where
      // z-score/MAD flag POINT outliers, CUSUM accumulates small
      // persistent shifts — the "metric quietly degraded for a week"
      // detector. The recursion resets at 0 (max), so no frame
      // aggregate or pow-expansion expresses it: the win_ewma fold
      // discipline with the win_holt_forecast PAIR trick — both
      // engines fold [x, 0] pairs with accumulator [s, s_max], init
      // from the first element's own update... which for element one
      // is exactly [max(0, x₁−k), same] only if the init encodes it,
      // so the series is PREFIXED with a zero pair ([0,0] — the
      // textbook s₀) and every real element folds through the
      // identical greatest() lambda. k (allowance) = 1.1× the
      // corpus-wide mean daily total, h = 2k — data-derived but
      // DETERMINISTIC (dsum-exact constants computed in the same
      // query on both engines). Daily totals collapse map-side before
      // the tiny per-type fold; the production form is the O(1)-state
      // streaming fold like every recursion here.
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            datediff(col("ts").cast("date"),
              to_date(lit("1970-01-01"))).as("eday"))
          .agg(dsum(col("value")).as("v"))
        val kRef = daily.agg((round(sum(col("v")
            .cast(org.apache.spark.sql.types.DecimalType(38, 10))), 6)
          .cast("double") / count(lit(1))).as("mu"))
          .select((col("mu") * lit(1.1)).as("k"))
        daily.crossJoin(broadcast(kRef))
          .groupBy("event_type", "k")
          .agg(array_sort(collect_list(struct(col("eday"), col("v"))))
            .as("xs"))
          .select(col("event_type"), col("k"),
            size(col("xs")).as("n_days"),
            expr("""aggregate(
                    transform(xs, x -> array(x.v, 0e0)),
                    array(0e0, 0e0),
                    (acc, e) -> array(
                      greatest(0e0, acc[0] + (e[0] - k)),
                      greatest(acc[1],
                        greatest(0e0, acc[0] + (e[0] - k)))))""").as("st"))
          .select(col("event_type"), col("n_days"),
            round(col("k"), 6).as("allowance"),
            col("st")(0).as("cusum_final"),
            col("st")(1).as("cusum_max"),
            (col("st")(1) > col("k") * lit(2.0)).as("drifted"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  CAST(date_diff('day', DATE '1970-01-01',
                    CAST(date_trunc('day', ts) AS DATE)) AS INTEGER) AS eday,
                  CAST(round(sum(CAST(value AS DECIMAL(38,10))), 6) AS DOUBLE)
                    AS v
                FROM events GROUP BY 1, 2),
              kref AS (
                SELECT (CAST(round(sum(CAST(v AS DECIMAL(38,10))), 6)
                          AS DOUBLE) / count(*)) * 1.1 AS k
                FROM daily),
              s AS (
                SELECT event_type, k,
                  list_transform(list(v ORDER BY eday), x -> [x, 0e0]) AS xs
                FROM daily, kref GROUP BY event_type, k),
              r AS (
                SELECT event_type, k, len(xs) AS n_days,
                  list_reduce(list_prepend([0e0, 0e0], xs), (acc, e) -> [
                    greatest(0e0, acc[1] + (e[1] - k)),
                    greatest(acc[2],
                      greatest(0e0, acc[1] + (e[1] - k)))]) AS st
                FROM s)
              SELECT event_type, CAST(n_days AS INTEGER) AS n_days,
                round(k, 6) AS allowance,
                st[1] AS cusum_final, st[2] AS cusum_max,
                st[2] > k * 2.0 AS drifted
              FROM r ORDER BY event_type""")),

    Op("win_ratio_to_report",
      // share-of-partition (RATIO_TO_REPORT): each order's fraction of
      // its customer's lifetime spend. Denominator accumulates in
      // exact DECIMAL over the partition (order-independent — the same
      // reason dsum exists), cast to double once; ONE IEEE division
      // per row then 6dp round. 100 TB: the window partitions by
      // customer (high cardinality), so this is one shuffle on
      // o_custkey and bounded per-partition state — no global sort.
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            round(col("o_totalprice") /
              sum(col("o_totalprice")
                .cast(org.apache.spark.sql.types.DecimalType(38, 10)))
                .over(w).cast("double"), 6).as("share"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
                round(o_totalprice /
                  CAST(sum(CAST(o_totalprice AS DECIMAL(38,10)))
                    OVER (PARTITION BY o_custkey) AS DOUBLE), 6) AS share
              FROM orders ORDER BY o_orderkey""")),

    Op("win_period_growth",
      // period-over-period (month-over-month) revenue growth per
      // order priority — the reporting staple. Monthly revenue is a
      // DECIMAL-accumulated 6dp-rounded double (deterministic), so the
      // lag + (cur−prev)/prev finish is IEEE-exact arithmetic on
      // identical inputs in both engines. 100 TB: the aggregate
      // collapses the fact table to |priority|×|months| rows BEFORE
      // the window, so the sort is over a trivially small relation —
      // the window never sees raw data.
      (s, d) => {
        val m = Tables.orders(s, d)
          .groupBy(col("o_orderpriority"),
            date_trunc("month", col("o_orderdate")).cast("date").as("month"))
          .agg(dsum(col("o_totalprice")).as("rev"))
        val w = Window.partitionBy("o_orderpriority").orderBy("month")
        m.select(col("o_orderpriority"), col("month"), col("rev"),
            lag(col("rev"), 1).over(w).as("prev_rev"),
            round((col("rev") - lag(col("rev"), 1).over(w)) /
              lag(col("rev"), 1).over(w), 6).as("growth"))
          .orderBy("o_orderpriority", "month")
      },
      Some("""WITH m AS (
                SELECT o_orderpriority,
                  CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                  CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,10))), 6)
                    AS DOUBLE) AS rev
                FROM orders GROUP BY 1, 2)
              SELECT o_orderpriority, month, rev,
                lag(rev, 1) OVER (PARTITION BY o_orderpriority
                  ORDER BY month) AS prev_rev,
                round((rev - lag(rev, 1) OVER (PARTITION BY o_orderpriority
                    ORDER BY month)) /
                  lag(rev, 1) OVER (PARTITION BY o_orderpriority
                    ORDER BY month), 6) AS growth
              FROM m ORDER BY o_orderpriority, month""")),

    Op("win_gaps_islands",
      // gaps-and-islands: per user, maximal runs of CONSECUTIVE active
      // days (the retention/streak primitive). The classic rewrite:
      // distinct active days → day_number − dense_rank is constant
      // within a consecutive run and unique per run → group on it.
      // Day numbers are exact integers (epoch days), so both engines
      // compute identical island ids. 100 TB: the distinct and both
      // aggregates are map-side combined and all key by user_id —
      // ONE shuffle reused across the chain; the per-user window
      // orders at most that user's distinct days.
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("day_nr")
        // ONE hash exchange for the whole chain: partitioning by
        // user_id alone satisfies the (user_id, day_nr) distinct (the
        // subset rule), the user_id window, and both aggregates — a
        // bare .distinct() would instead shuffle on the pair and force
        // a SECOND exchange for the window
        val days = Tables.events(s, d)
          .select(col("user_id"),
            datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
              .cast("long").as("day_nr"))
          .repartition(col("user_id"))
          .distinct()
        val islands = days
          .withColumn("island", col("day_nr") - dense_rank().over(w))
          .groupBy("user_id", "island")
          .agg(count(lit(1)).as("streak_days"),
            min(col("day_nr")).as("start_day"))
        islands.groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"),
            max(col("streak_days")).as("max_streak"),
            min(col("start_day")).as("first_day"))
          .orderBy("user_id")
      },
      Some("""WITH days AS (
                SELECT DISTINCT user_id,
                  date_diff('day', DATE '1970-01-01',
                    CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day_nr
                FROM events),
              isl AS (
                SELECT user_id,
                  day_nr - dense_rank() OVER (PARTITION BY user_id
                    ORDER BY day_nr) AS island,
                  day_nr
                FROM days),
              runs AS (
                SELECT user_id, island, count(*) AS streak_days,
                  min(day_nr) AS start_day
                FROM isl GROUP BY user_id, island)
              SELECT user_id, count(*) AS n_islands,
                max(streak_days) AS max_streak, min(start_day) AS first_day
              FROM runs GROUP BY user_id ORDER BY user_id""")),

    Op("win_trend_mk",
      // Mann–Kendall trend test (Mann 1945 / Kendall 1975) — the
      // NON-PARAMETRIC "is this metric actually trending" answer
      // (win_period_growth reports the growth, this reports whether
      // it's statistically real): S = Σ_{i<j} sign(x_j − x_i) over
      // each type's daily series, tie-corrected variance, continuity-
      // corrected z. Everything up to the finish is EXACT integers —
      // signs, S, n(n−1)(2n+5), the tie term Σt(t−1)(2t+5) — so the
      // only doubles come from ONE shared finish expression (z and
      // the ±1.96 trend call). The pairwise self-join is O(|days|²)
      // PER SERIES on the already-collapsed daily relation — the
      // agg_mode bounded-window rule: quadratic in days, never in
      // events (a year of dailies is 66k pairs; the raw log never
      // self-joins).
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("graft_events_mk")
        s.sql(mkTrendSql(
          """SELECT event_type,
               datediff(CAST(ts AS DATE), DATE '1970-01-01') AS eday,
               CAST(round(sum(CAST(value * 100 AS DECIMAL(38,10))), 0)
                    AS BIGINT) AS x
             FROM graft_events_mk GROUP BY 1, 2"""))
      },
      Some(mkTrendSql(
        """SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01',
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
               AS INTEGER) AS eday,
             CAST(round(sum(CAST(value * 100 AS DECIMAL(38,10))), 0)
                  AS BIGINT) AS x
           FROM events GROUP BY 1, 2"""))),

    Op("win_trend_theilsen",
      // Theil–Sen slope estimator (Theil 1950 / Sen 1968) — the
      // robust TREND MAGNITUDE that pairs with win_trend_mk's
      // existence test (the two are run together in every
      // environmental/SRE trend toolkit): median of all pairwise
      // slopes, breakdown point 29% (one bad week can't bend it,
      // unlike OLS). Slopes are identical doubles on both engines
      // (int casts + one division); the median rides the
      // agg_percentile exact-form discipline (6dp rounding absorbs
      // interpolation ulps). The pair relation is O(|days|²) per
      // series over the COLLAPSED daily relation — calendar-bounded
      // (a decade ≈ 6.6M pairs/series), never event-bounded; past
      // that, the published scale path is sampling pairs, the same
      // substitution agg_approx_percentile documents.
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("graft_events_tsen")
        s.sql(theilSenSql(
          """SELECT event_type,
               datediff(CAST(ts AS DATE), DATE '1970-01-01') AS eday,
               CAST(round(sum(CAST(value * 100 AS DECIMAL(38,10))), 0)
                    AS BIGINT) AS x
             FROM graft_events_tsen GROUP BY 1, 2""", "percentile"))
      },
      Some(theilSenSql(
        """SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01',
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
               AS INTEGER) AS eday,
             CAST(round(sum(CAST(value * 100 AS DECIMAL(38,10))), 0)
                  AS BIGINT) AS x
           FROM events GROUP BY 1, 2""", "quantile_cont"))),

    Op("win_acf",
      // autocorrelation function at lags 1..7 — the canonical
      // time-series profiler (a spike at lag 7 IS weekly
      // seasonality; slow decay is trend — the diagnostic read
      // before picking win_holt/seasonal models): r_k =
      // Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)², per event type's daily
      // cents series. μ is one IEEE division of exact sums; the
      // lagged products pair via lead() (no self-join), are
      // identical doubles on both engines, and re-accumulate
      // through DECIMAL (dsum rule); one division per (type, lag).
      // The whole computation after the daily collapse lives on the
      // bounded |types|·|days| relation × 7 lags.
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("graft_ev_acf")
        s.sql(acfSql("graft_ev_acf", spark = true))
      },
      Some(acfSql("events", spark = false))),

    Op("win_forecast_backtest",
      // forecast backtest — the accuracy scoreboard that closes the
      // forecasting battery (win_holt_forecast predicts, win_acf /
      // win_seasonal_strength diagnose; THIS op says whether a model
      // beats the benchmarks every forecasting paper requires you to
      // beat): one-step naive (ŷ=y_{t−1}) vs seasonal-naive
      // (ŷ=y_{t−7}) on each type's daily cents series, scored only
      // where the lagged ROW is exactly 1/7 calendar days back (a
      // row-lag across a calendar gap silently forecasts from the
      // wrong day). MAE/WAPE/sMAPE from exact BIGINT error sums +
      // IEEE finishes; MASE = Σ|e_snaive|/Σ|e_naive| — both sums
      // integers, so the headline ratio is exact-int arithmetic with
      // one division. Daily collapse map-side; windows per type over
      // the bounded |types|·|days| relation.
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("graft_ev_fb")
        s.sql(forecastBacktestSql("graft_ev_fb", spark = true))
      },
      Some(forecastBacktestSql("events", spark = false))),

    Op("win_seasonal_strength",
      // seasonal-strength statistic (the STL-lite F_s of Hyndman's
      // feature set, on the day-of-week cycle): 1 − var(residual)/
      // var(total) after removing per-dow means — the single number
      // that says whether win_seasonal_dow's profile actually
      // explains the series (≈0 none, →1 fully seasonal). Totals are
      // exact cents; dow means are one IEEE division each; residual
      // moments re-accumulate the identical doubles through DECIMAL
      // (dsum rule) so the ratio is order-independent; clamped at 0.
      // Everything after the daily collapse runs on the bounded
      // |types|·|days| relation.
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("graft_ev_seas")
        s.sql(seasonalStrengthSql("graft_ev_seas", spark = true))
      },
      Some(seasonalStrengthSql("events", spark = false))),

    Op("win_we_rules",
      // Western Electric control-chart rules (WE Handbook 1956) —
      // the alarm battery a real SPC chart runs beyond the single
      // 3σ band (win_bollinger) and the capability summary
      // (agg_cpk): rule 1 = one point beyond 3σ; rule 2 = 2 of 3
      // consecutive beyond 2σ on the SAME side; rule 3 = 4 of 5
      // beyond 1σ same side; rule 4 = 8 consecutive on one side of
      // center. Center/σ are per-series constants from exact cents
      // DECIMAL moments (1-row-per-type broadcast back); each rule
      // is a conditional COUNT over a fixed ROWS frame on the
      // bounded |types|·|days| relation — integer comparisons of
      // identical doubles, deterministic on both engines.
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("graft_ev_we")
        s.sql(weRulesSql("graft_ev_we", spark = true))
      },
      Some(weRulesSql("events", spark = false))),

    Op("win_runs_test",
      // Wald–Wolfowitz runs test on the day-over-day delta signs of
      // each type's daily series — the randomness screen beside the
      // Mann–Kendall trend test (MK asks "is there drift?", runs
      // asks "is the sequence even random?" — too FEW runs means
      // clustering/momentum, too many means oscillation): R = 1 +
      // sign changes over the zero-free sign sequence, E[R] and
      // Var[R] from the exact n₊/n₋ counting identities, one IEEE
      // finish for z. Daily totals exact cents; both lag passes run
      // over the bounded |types|·|days| relation.
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("graft_ev_runs")
        s.sql(runsSql("graft_ev_runs", spark = true))
      },
      Some(runsSql("events", spark = false))),

    Op("win_peak_detect",
      // local-extrema detection over each type's daily-cents series —
      // the find_peaks primitive under anomaly triage and
      // seasonality eyeballing: a day is a PEAK iff strictly above
      // the previous day and at-or-above the next (the asymmetric
      // tie rule makes a flat-topped run emit exactly its first
      // summit — deterministic, no double-counting), valley dual.
      // Interior days only (lag/lead both present). Daily totals are
      // exact cents longs (map-side combined); the lag/lead pair
      // runs once over the bounded |types|·|days| relation; deltas
      // are exact-int subtractions — no floats anywhere.
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("graft_ev_peaks")
        s.sql(peakSql("graft_ev_peaks", spark = true))
      },
      Some(peakSql("events", spark = false))),

    Op("win_macd",
      // MACD (Appel) — the last member of the momentum battery
      // (bollinger/drawdown/ohlc/rsi/vwap): EMA12 − EMA26 with an
      // EMA9 signal line and histogram, over each type's daily-total
      // series. One 3-state recursive fold (the win_rsi triple
      // extended to two EMAs + the signal of their difference — the
      // signal update inlines the NEW fast/slow values since a fold
      // lambda can't reference its own outputs), seeds e12=e26=x₀,
      // sig=0, EMA constants in exponent form ((n−1)·e + 2x)/(n+1).
      // Identical lambda text on both engines over dsum-stabilized
      // daily doubles ⇒ bit-identical floats.
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            datediff(col("ts").cast("date"),
              to_date(lit("1970-01-01"))).as("eday"))
          .agg(dsum(col("value")).as("v"))
        daily.groupBy("event_type")
          .agg(array_sort(collect_list(struct(col("eday"), col("v"))))
            .as("xs"))
          .select(col("event_type"),
            expr("transform(xs, x -> array(x.v, x.v, 0e0))").as("vs"))
          .select(col("event_type"), size(col("vs")).as("n_days"),
            expr("""aggregate(slice(vs, 2, size(vs)),
                    element_at(vs, 1),
                    (acc, e) -> array(
                      (acc[0] * 11e0 + 2e0 * e[0]) / 13e0,
                      (acc[1] * 25e0 + 2e0 * e[0]) / 27e0,
                      (acc[2] * 8e0 + 2e0 *
                        ((acc[0] * 11e0 + 2e0 * e[0]) / 13e0
                         - (acc[1] * 25e0 + 2e0 * e[0]) / 27e0)) / 1e1))""")
              .as("r"))
          .select(col("event_type"), col("n_days"),
            round(col("r")(0) - col("r")(1), 6).as("macd"),
            round(col("r")(2), 6).as("signal"),
            round(col("r")(0) - col("r")(1) - col("r")(2), 6)
              .as("histogram"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  CAST(date_diff('day', DATE '1970-01-01',
                    CAST(date_trunc('day', ts) AS DATE)) AS INTEGER) AS eday,
                  CAST(round(sum(CAST(value AS DECIMAL(38,10))), 6) AS DOUBLE)
                    AS v
                FROM events GROUP BY 1, 2),
              s AS (
                SELECT event_type,
                  list_transform(list(v ORDER BY eday),
                    x -> [x, x, 0e0]) AS vs
                FROM daily GROUP BY event_type),
              r AS (
                SELECT event_type, len(vs) AS n_days,
                  list_reduce(vs, (acc, e) -> [
                    (acc[1] * 11e0 + 2e0 * e[1]) / 13e0,
                    (acc[2] * 25e0 + 2e0 * e[1]) / 27e0,
                    (acc[3] * 8e0 + 2e0 *
                      ((acc[1] * 11e0 + 2e0 * e[1]) / 13e0
                       - (acc[2] * 25e0 + 2e0 * e[1]) / 27e0)) / 1e1])
                    AS f
                FROM s)
              SELECT event_type, CAST(n_days AS INTEGER) AS n_days,
                round(f[1] - f[2], 6) AS macd,
                round(f[3], 6) AS signal,
                round(f[1] - f[2] - f[3], 6) AS histogram
              FROM r ORDER BY event_type"""))
          ,

    Op("win_skyline",
      // SKYLINE / Pareto frontier (Börzsönyi et al. 2001, "The
      // Skyline Operator") — an operator Spark has no built-in for,
      // expressed as the sort-based rewrite: per brand, the parts no
      // other part dominates (≥ price AND ≤ size, strict somewhere).
      // Shape: collapse to the (brand, price, size) grid map-side
      // (bounded by the price×size VALUE GRID, not the corpus — the
      // ks_test argument), per-(brand, price) min size, then ONE
      // lagged running-min over strictly-higher prices per brand; a
      // point survives iff it is its price's min size AND beats every
      // higher price's best size. All exact ints; no corpus-sized
      // window anywhere.
      (s, d) => {
        Tables.part(s, d).createOrReplaceTempView("graft_part_sky")
        s.sql(skylineSql("graft_part_sky"))
      },
      Some(skylineSql("part"))),

    Op("win_vwap",
      // running VWAP — the volume-weighted benchmark price the
      // execution-quality report quotes, completing the finance
      // window family (bollinger/drawdown/ohlc/rsi): per
      // (returnflag, ship-day), cumulative Σ(price·qty)/Σ(qty) over
      // the day sequence. Both cumulants are EXACT integers (cents ×
      // centi-units products summed in DECIMAL — map-side-combined at
      // the daily grain BEFORE any window), the running ratio is ONE
      // IEEE division per day row, and the windows run over the
      // bounded |flags|·|days| daily relation, never lineitem.
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("graft_li_vwap")
        s.sql(vwapSql("graft_li_vwap"))
      },
      Some(vwapSql("lineitem"))),

    Op("win_drawdown",
      // running-peak drawdown — the risk/capacity metric for any
      // monotone-hope series (revenue run-rate, throughput, account
      // equity): dd_t = max(v_1..v_t) − v_t, and the series' MAX
      // drawdown is the single number a risk report quotes (how far
      // below its best level did this metric ever fall). Over each
      // event type's daily-total series (the win_cusum/seasonal_dow
      // grain): daily totals collapse map-side (dsum — 6dp-stable
      // doubles), the running peak is ONE pass of a running-max frame
      // (Spark evaluates ROWS UNBOUNDED..CURRENT frames
      // incrementally, never rescanning the prefix), and dd is a
      // subtraction of two already-identical doubles — IEEE-exact, no
      // further rounding needed. max_dd rides a whole-partition
      // window over the same tiny |days| relation. 100 TB: one
      // shuffle keyed by series, |series|×|days| window rows, nothing
      // else moves.
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            datediff(col("ts").cast("date"),
              to_date(lit("1970-01-01"))).as("eday"))
          .agg(dsum(col("value")).as("v"))
        val run = Window.partitionBy("event_type").orderBy("eday")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val whole = Window.partitionBy("event_type")
        daily
          .withColumn("peak", max(col("v")).over(run))
          .withColumn("dd", col("peak") - col("v"))
          .withColumn("max_dd", max(col("dd")).over(whole))
          .orderBy("event_type", "eday")
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  CAST(date_diff('day', DATE '1970-01-01',
                    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
                    AS INTEGER) AS eday,
                  CAST(round(sum(CAST(value AS DECIMAL(38,10))), 6) AS DOUBLE)
                    AS v
                FROM events GROUP BY 1, 2),
              r AS (
                SELECT event_type, eday, v,
                  max(v) OVER (PARTITION BY event_type ORDER BY eday
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS peak
                FROM daily)
              SELECT event_type, eday, v, peak, peak - v AS dd,
                max(peak - v) OVER (PARTITION BY event_type) AS max_dd
              FROM r ORDER BY event_type, eday"""))
  )
}
