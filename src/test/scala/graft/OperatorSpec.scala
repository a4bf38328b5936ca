package graft

import org.apache.spark.sql.functions._

/** Per-operator batch specs on sf0.001 (seed=42 data → stable
  * goldens). The DuckDB oracle (driver t2 / tools/verify_local.py) is
  * the deep gate; these pin basic shape, a few golden values, and the
  * non-oracled ops (HLL accuracy, Spark-specific hashes).
  */
class OperatorSpec extends SparkSpec {

  test("registry: every op has a unique key; oracled keys ⊆ query keys") {
    val keys = SparkEntry.all.map(_.key)
    assert(keys.distinct.size == keys.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 45)
  }

  test("entry: flagship runs on sf0.001 with rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("scan fixtures are SF-invariant: every SF dir renders identical bytes") {
    // the scan_csv/scan_json oracle SQL is a STATIC string reading a
    // fixed /tmp path, which is only sound because every possible
    // writer (Verify at sf0.01, Bench at sf0.1, a dev run at sf0.001)
    // produces the SAME bytes. That holds because both fixtures render
    // from NATION, the one table the generator keeps byte-identical
    // across scale factors — pin it so a future testdata regen that
    // breaks the invariant fails HERE instead of as a racy
    // correctness-gate mismatch.
    val dirs = Seq(sf001, "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(s"$d/nation.parquet").exists())
    assume(dirs.size > 1, "need at least two SF dirs to compare")
    val rendered = dirs.map { d =>
      d -> Tables.nation(spark, d)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey").collect().toSeq
    }
    rendered.tail.foreach { case (d, rows) =>
      assert(rows == rendered.head._2,
        s"nation differs between ${rendered.head._1} and $d — the fixed " +
          "fixture path in scan_csv/scan_json is no longer safe")
    }
  }

  test("every query executes on sf0.001 and has a nonempty schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf001)
      assert(df.schema.nonEmpty, s"$name: empty schema")
      df.count() // must not throw
    }
  }

  test("agg_hash_group golden: full-table quantity sum is stable") {
    val rows = SparkEntry.queries("agg_hash_group")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf001)
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp")).count()
    assert(total == expected, s"expected $expected counted, got $total")
  }

  test("agg_approx_hll: HLL estimate within 5% of exact") {
    SparkEntry.queries("agg_approx_hll")(spark, sf01).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("agg_hll_partial_merge: daily sketches union to the direct estimate, within 5% of exact") {
    val row = SparkEntry.queries("agg_hll_partial_merge")(spark, sf01)
      .collect().head
    val merged = row.getAs[Long]("month_users_est").toDouble
    val ev = Tables.events(spark, sf01)
    val exact = ev.select(countDistinct("user_id")).collect().head.getLong(0)
    assert(math.abs(merged - exact) / exact <= 0.05,
      s"merged-sketch estimate $merged vs exact $exact")
    // re-aggregation fidelity: the union of per-day sketches estimates
    // the same as ONE sketch over the raw rows — the property that
    // lets a 100 TB pipeline store daily sketches and never rescan
    ev.createOrReplaceTempView("graft_events_hll_direct")
    val direct = spark.sql(
      """SELECT hll_sketch_estimate(hll_sketch_agg(user_id, 14)) AS est
         FROM graft_events_hll_direct""").collect().head.getLong(0).toDouble
    assert(math.abs(merged - direct) / direct <= 0.01,
      s"union-of-dailies $merged vs direct $direct")
    assert(row.getAs[Long]("n_days") >= 28)
  }

  test("agg_cms_heavy: estimate dominates truth; split sketches merge exactly") {
    val rows = SparkEntry.queries("agg_cms_heavy")(spark, sf01).collect()
    assert(rows.length == 10)
    val n = Tables.events(spark, sf01).count()
    rows.foreach { r =>
      val t = r.getAs[Long]("true_cnt"); val e = r.getAs[Long]("est_cnt")
      // CMS error is ONE-SIDED (counters only ever over-count) ...
      assert(e >= t, s"CMS under-counted: est $e < true $t")
      // ... and bounded: E[overcount] = N/w per row, min over 4 rows;
      // 16x slack keeps the pin non-flaky while still catching a
      // broken bucket hash (which would collide everything)
      assert(e - t <= 16 * n / 1024,
        s"overcount ${e - t} beyond bound (N=$n, w=1024)")
    }
    // the merge law, exact: counter-wise sum of two half-corpus
    // sketches == the whole-corpus sketch (what lets a fleet persist
    // per-shard sketches and aggregate them later)
    val ev = Tables.events(spark, sf01)
    def sketch(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), explode(expr("sequence(0, 3)")).as("r"))
      .select(col("r"),
        pmod(expr("xxhash64(r, user_id)"), lit(1024L)).as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
    val whole = sketch(ev).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val h1 = sketch(ev.filter(col("event_id") % 2 === 0)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val h2 = sketch(ev.filter(col("event_id") % 2 === 1)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val mergedKeys = h1.keySet ++ h2.keySet
    assert(mergedKeys == whole.keySet)
    mergedKeys.foreach { k =>
      assert(h1.getOrElse(k, 0L) + h2.getOrElse(k, 0L) == whole(k),
        s"merge law broke at $k")
    }
  }

  test("agg_approx_percentile tracks the exact percentile within 1%") {
    val approx = SparkEntry.queries("agg_approx_percentile")(spark, sf01)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = SparkEntry.queries("agg_percentile")(spark, sf01)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(approx(k) - v) <= math.max(1.0, v * 0.01),
        s"$k: approx ${approx(k)} vs exact $v")
    }
  }

  test("agg_histogram_equidepth_approx tracks the exact equi-depth histogram") {
    val approx = SparkEntry.queries("agg_histogram_equidepth_approx")(spark, sf01)
      .collect()
    val exact = SparkEntry.queries("agg_histogram_equidepth")(spark, sf01)
      .collect()
    assert(approx.length == 10, s"expected 10 buckets, got ${approx.length}")
    val n = exact.map(_.getLong(3)).sum
    assert(approx.map(_.getLong(3)).sum == n,
      "every row lands in exactly one bucket")
    // sketch cut points put each bucket's population within 10% of
    // the ideal n/10 (rank error at accuracy 10000 is far tighter;
    // the slack absorbs mass ties at the cut values)
    approx.foreach { r =>
      assert(math.abs(r.getLong(3) - n / 10.0) <= n * 0.01 + 1,
        s"bucket ${r.getLong(0)} holds ${r.getLong(3)} of $n")
    }
    // boundaries track the exact deciles: bucket k's hi within 1% of
    // the exact bucket k's hi (value scale, not rank scale)
    val exHi = exact.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    approx.foreach { r =>
      val e = exHi(r.getLong(0))
      assert(math.abs(r.getDouble(2) - e) <= math.max(1.0, e * 0.01),
        s"bucket ${r.getLong(0)} hi ${r.getDouble(2)} vs exact $e")
    }
    // and the scale plan shape: no single-partition window sort
    val plan = SparkEntry.queries("agg_histogram_equidepth_approx")(spark, sf01)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "approx equidepth must not plan a (global-sort) window")
  }

  test("agg_abc_class_approx tracks the exact ABC classification") {
    def byCls(name: String) = SparkEntry.queries(name)(spark, sf01)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap.withDefaultValue((0L, 0L))
    val approx = byCls("agg_abc_class_approx")
    val exact = byCls("agg_abc_class")
    // conservation: every part lands in exactly one class, all cents
    // accounted for
    assert(approx.values.map(_._1).sum == exact.values.map(_._1).sum)
    assert(approx.values.map(_._2).sum == exact.values.map(_._2).sum)
    val totR = exact.values.map(_._2).sum.toDouble
    // the crossing bucket goes wholly to the higher class, so the A
    // revenue share is >= 0.80 BY CONSTRUCTION and exceeds it by at
    // most one sub-octave bucket's share
    val shareA = approx("A")._2 / totR
    assert(shareA >= 0.80 && shareA <= 0.88, s"A share $shareA")
    val shareAB = (approx("A")._2 + approx("B")._2) / totR
    assert(shareAB >= 0.95 && shareAB <= 0.99, s"A+B share $shareAB")
    // per-class part counts near the exact split
    Seq("A", "B", "C").foreach { c =>
      val (na, _) = approx(c); val (ne, _) = exact(c)
      assert(math.abs(na - ne) <= math.max(5L, (ne * 0.25).toLong),
        s"class $c: approx $na vs exact $ne parts")
    }
    // scale plan shape: the only window is over the bounded bucket
    // relation — the corpus-wide ranked window must be gone. The
    // final classify joins broadcast thresholds.
    val plan = SparkEntry.queries("agg_abc_class_approx")(spark, sf01)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition(l_partkey") &&
      !plan.contains("row_number"),
      "approx ABC must not rank the parts relation")
  }

  test("agg_percentile_weighted_approx tracks the exact weighted percentiles") {
    def byFlag(name: String) = SparkEntry.queries(name)(spark, sf01)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val exact = byFlag("agg_percentile_weighted")
    val approx = byFlag("agg_percentile_weighted_approx")
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    // the approx crossing bucket is the SAME bucket the exact crossing
    // value lies in, and the estimate is that bucket's max price — so
    // approx >= exact and high by at most one sub-octave bucket width
    // (1/16 relative, plus cents-rounding slack)
    exact.foreach { case (rf, (e50, e90)) =>
      val (a50, a90) = approx(rf)
      assert(a50 >= e50 - 0.01 && a50 <= e50 * (1.0 + 1.0 / 16) + 0.01,
        s"$rf wp50: approx $a50 vs exact $e50")
      assert(a90 >= e90 - 0.01 && a90 <= e90 * (1.0 + 1.0 / 16) + 0.01,
        s"$rf wp90: approx $a90 vs exact $e90")
    }
    // scale plan shape: the exact form's corpus window sorts each
    // flag group by (price, orderkey, linenumber); the approx plan
    // must never touch the tie-break columns — its only window runs
    // over the bounded (flag, bucket) relation
    val plan = SparkEntry.queries("agg_percentile_weighted_approx")(spark, sf01)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("l_linenumber") && !plan.contains("l_orderkey"),
      "approx weighted percentile must not sort the corpus")
  }

  test("agg_mad_anomaly_approx flags nearly the same rows as the exact MAD") {
    val approx = SparkEntry.queries("agg_mad_anomaly_approx")(spark, sf01)
      .collect().map(_.getLong(0)).toSet
    val exact = SparkEntry.queries("agg_mad_anomaly")(spark, sf01)
      .collect().map(_.getLong(0)).toSet
    val sym = (approx diff exact) ++ (exact diff approx)
    assert(exact.nonEmpty, "exact MAD flagged nothing — fixture drifted")
    assert(sym.size <= math.max(1, exact.size / 20),
      s"flag sets diverge: ${sym.size} of ${exact.size} differ")
  }

  test("rendezvous routing: minimal disruption exactly, balance near uniform") {
    import org.apache.spark.sql.functions.{array, array_max, col, lit, struct, xxhash64}
    def pick(consumers: Seq[String]) = array_max(array(consumers.map(c =>
      struct(xxhash64(col("user_id"), lit(c)).as("h"),
        lit(c).as("c"))): _*)).getField("c")
    val all = Seq("c0", "c1", "c2", "c3", "c4", "c5", "c6", "c7")
    val users = Tables.events(spark, sf01).select("user_id").distinct()
    val before = users.withColumn("consumer", pick(all))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // balance: each consumer within 5σ of the binomial expectation —
    // the key count is small (~150 distinct users), so a percentage
    // band would just measure noise; 5σ fails only on a genuinely
    // broken hash (a regenerated corpus stays comfortably inside)
    val n = before.size.toDouble
    val p = 1.0 / all.size
    val sigma = math.sqrt(n * p * (1 - p))
    val byC = before.values.groupBy(identity).view.mapValues(_.size)
    all.foreach { c =>
      val got = byC.getOrElse(c, 0)
      assert(math.abs(got - n * p) <= 5 * sigma,
        s"$c holds $got of $n (expect ${n * p} ± ${5 * sigma})")
    }
    // the rendezvous property, EXACTLY: drop c3 — every key NOT on c3
    // keeps its assignment (deleting a non-maximal candidate never
    // changes an argmax); c3's keys all move
    val after = users.withColumn("consumer", pick(all.filterNot(_ == "c3")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    before.foreach { case (u, c) =>
      if (c == "c3") assert(after(u) != "c3")
      else assert(after(u) == c,
        s"user $u moved $c -> ${after(u)} though c3 was not its home")
    }
    // and the registered query is the same assignment aggregated
    val agg = SparkEntry.queries("stream_route_rendezvous")(spark, sf01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == byC.toMap.map { case (k, v) => k -> v.toLong })
  }

  test("agg_topk_partial: k-bounded aggregator ≡ rank window, with a partial (map-side) phase planned") {
    val viaAgg = SparkEntry.queries("agg_topk_partial")(spark, sf001)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    val viaWin = Tables.lineitem(spark, sf001)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .select("l_suppkey", "rank", "l_orderkey", "l_linenumber",
        "l_extendedprice")
      .orderBy("l_suppkey", "rank")
    assert(viaAgg.collect().toSeq == viaWin.collect().toSeq)
    // the scale claim: the aggregator plans TWO ObjectHashAggregate
    // phases — the first is the map-side partial that truncates each
    // group to k rows BEFORE the shuffle (the window form ships every
    // row)
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_topkagg"), plan)
  }

  test("join_range_bucket: bucketed equi rewrite ≡ naive nested-loop range join, and plans NO nested loop") {
    val bucketed = SparkEntry.queries("join_range_bucket")(spark, sf001)
    // naive reference: the O(n·m) plan the rewrite exists to avoid —
    // test-only, sf0.001
    val us = 30L * 60 * 1000000
    val e = Tables.events(spark, sf001)
    val o = e.filter(col("event_type") === "error")
      .select(col("event_id").as("outage_id"), unix_micros(col("ts")).as("t0"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), unix_micros(col("ts")).as("pt"))
    val naive = o.join(p,
        col("pt") >= col("t0") && col("pt") < col("t0") + us, "left")
      .groupBy("outage_id").agg(count(col("p_id")).as("n_purchases"))
      .orderBy("outage_id")
    assert(bucketed.collect().toSeq == naive.collect().toSeq)
    // some window actually has matches, so the equivalence is not vacuous
    assert(bucketed.filter(col("n_purchases") > 0).count() > 0)
    // the rewrite's point: the join is an equi join on bucket (hash or
    // sort-merge), never BroadcastNestedLoopJoin/Cartesian
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"bucketed rewrite still plans a nested loop:\n$plan")
  }

  test("join_asof: native operator plans AsOfJoinExec and equals the window rewrite") {
    val native = SparkEntry.queries("join_asof")(spark, sf001)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected custom exec in:\n$plan")
    val rewrite = SparkEntry.queries("join_asof_window")(spark, sf001)
    assert(native.collect().toSeq == rewrite.collect().toSeq)
    // r5: the merge participates in whole-stage codegen — the exec
    // must sit INSIDE a WholeStageCodegen span (long-backed key/time
    // here, so the codegen fast path must engage), not fall back to
    // the interpreted iterator pipeline. Under AQE codegen collapse
    // happens per stage, so inspect the FINAL plan post-execution.
    import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def spanContains(p: SparkPlan): Boolean = p match {
      case _: InputAdapter => false
      case _: graft.plans.AsOfJoinExec => true
      case other => other.children.exists(spanContains)
    }
    def deepFind(p: SparkPlan): Boolean = p match {
      case w: WholeStageCodegenExec if spanContains(w.child) => true
      case a: AdaptiveSparkPlanExec => deepFind(a.executedPlan)
      case q: QueryStageExec => deepFind(q.plan)
      case other => other.children.exists(deepFind)
    }
    assert(deepFind(native.queryExecution.executedPlan),
      s"AsOfJoinExec outside any codegen span:\n" +
        s"${native.queryExecution.executedPlan}")
  }

  test("join_asof: null left times null-extend instead of matching or crashing") {
    val e = Tables.events(spark, sf001)
      .withColumn("ts_ntz",
        when(col("event_id") % 2 === 0, col("ts").cast("timestamp_ntz")))
    val o = Tables.orders(spark, sf001)
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    val out = graft.plans.AsOfJoin.asof(e, o,
      "user_id", "o_custkey", "ts_ntz", "o_orderdate", "o_orderkey")
    val nullTs = out.filter(col("ts_ntz").isNull)
    assert(nullTs.count() > 0)
    assert(nullTs.filter(col("o_orderkey").isNotNull).count() == 0,
      "null event time must never match an order")
    assert(out.filter(col("ts_ntz").isNotNull)
      .filter(col("o_orderkey").isNull).count() == 0,
      "non-null rows keep matching as before")
  }

  test("join_asof: mismatched key types are rejected up front") {
    val e = Tables.events(spark, sf001)
      .withColumn("ts_ntz", col("ts").cast("timestamp_ntz"))
      .withColumn("user_int", col("user_id").cast("int"))
    val o = Tables.orders(spark, sf001)
      .select("o_custkey", "o_orderdate", "o_orderkey")
    val err = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoin.asof(e, o,
        "user_int", "o_custkey", "ts_ntz", "o_orderdate", "o_orderkey")
    }
    assert(err.getMessage.contains("key columns must share a type"))
  }

  test("join_asof: matched order is never later than the event") {
    val df = SparkEntry.queries("join_asof")(spark, sf001)
    // every event matches (orders end 2001, events start 2024) and the
    // as-of price is a real order price
    assert(df.filter(col("asof_orderkey").isNull).count() == 0)
    val o = Tables.orders(spark, sf001).select(col("o_orderkey").as("k"))
    assert(df.join(o, df("asof_orderkey") === col("k"), "left_anti").count() == 0)
  }

  test("win_topk_group: at most 3 rows per customer, ranked by price") {
    val df = SparkEntry.queries("win_topk_group")(spark, sf001)
    val over = df.groupBy("o_custkey").count().filter(col("count") > 3)
    assert(over.count() == 0)
  }

  test("set ops algebra: |A∪B| = |A| + |B| - |A∩B| on (user, day) sets") {
    val e = Tables.events(spark, sf001)
      .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"),
        col("event_type"))
    val a = e.filter(col("event_type") === "click").select("user_id", "day").distinct()
    val b = e.filter(col("event_type") === "purchase").select("user_id", "day").distinct()
    val union = a.union(b).distinct().count()
    val inter = a.intersect(b).count()
    assert(union == a.count() + b.count() - inter)
  }

  test("fn_hash_spark: xxhash64 deterministic across runs") {
    val h1 = SparkEntry.queries("fn_hash_spark")(spark, sf001)
      .select("doc_id", "text_xxh64").collect().toSeq
    val h2 = SparkEntry.queries("fn_hash_spark")(spark, sf001)
      .select("doc_id", "text_xxh64").collect().toSeq
    assert(h1 == h2)
  }

  test("cdc_apply_upsert: one row per surviving key, deletes removed") {
    val df = SparkEntry.queries("cdc_apply_upsert")(spark, sf001)
    assert(df.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    assert(df.filter(col("op") === "D").count() == 0)
  }

  test("stream_retention_cohort: week-0 retention is exactly 1.0; retention never exceeds 1") {
    val df = SparkEntry.queries("stream_retention_cohort")(spark, sf01)
    // a cohort member's signup event makes them active in offset 0 by
    // construction, so every cohort's first row must be full retention
    val w0 = df.filter(col("week_offset") === 0)
    assert(w0.count() > 0)
    assert(w0.filter(col("retention") =!= 1.0).count() == 0,
      "week-0 retention must be 1.0 for every cohort")
    assert(df.filter(col("n_active") > col("n_cohort")).count() == 0)
  }

  test("stream_anomaly_zscore: z is gated on 12 observations and matches a hand-computed frame") {
    val df = SparkEntry.queries("stream_anomaly_zscore")(spark, sf01).cache()
    try {
      assert(df.filter(col("n_obs") < 12 && col("z").isNotNull).count() == 0,
        "z must be NULL until 12 trailing observations exist")
      assert(df.filter(col("n_obs") > 24).count() == 0,
        "trailing frame is capped at 24 observations")
      // recompute one non-null z from its raw trailing counts
      val r = df.filter(col("z").isNotNull)
        .orderBy("event_type", "hour_id").head()
      val tpe = r.getString(0); val hr = r.getLong(1)
      val trail = df.filter(col("event_type") === tpe &&
          col("hour_id") < hr)
        .orderBy(col("hour_id").desc).limit(24)
        .select("x").collect().map(_.getLong(0).toDouble)
      val n = trail.length; val mean = trail.sum / n
      val sd = math.sqrt(trail.map(v => (v - mean) * (v - mean)).sum / (n - 1))
      val z = (r.getLong(2) - mean) / sd
      assert(math.abs(z - r.getDouble(4)) < 1e-9,
        s"z mismatch: op ${r.getDouble(4)} vs recomputed $z")
    } finally { df.unpersist(); () }
  }

  test("graph_triangle_count: handshake identity — per-node counts sum to 3·T") {
    val df = SparkEntry.queries("graph_triangle_count")(spark, sf01)
    val counts = df.collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ > 0))
    assert(counts.sum % 3 == 0,
      "each triangle contributes exactly one count to each of its 3 corners")
  }

  test("join_asof_nearest: bucketed candidates ≡ brute-force nearest within tolerance") {
    val df = SparkEntry.queries("join_asof_nearest")(spark, sf001).cache()
    try {
      assert(df.filter(col("delta_us").isNotNull &&
        abs(col("delta_us")) > 3600000000L).count() == 0)
      // brute-force check: per click, min |Δ| over ALL purchases of the
      // user agrees with the op's pick (or both sides find none)
      val e = Tables.events(spark, sf001)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
      val brute = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("us").as("c_us"))
        .join(e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("us").as("p_us")), Seq("user_id"))
        .filter(abs(col("p_us") - col("c_us")) <= 3600000000L)
        .groupBy("click_id")
        .agg(min(abs(col("p_us") - col("c_us"))).as("best_abs"))
      val joined = df.join(brute, Seq("click_id"), "full_outer")
      assert(joined.filter(
        coalesce(abs(col("delta_us")), lit(-1L)) =!=
          coalesce(col("best_abs"), lit(-1L))).count() == 0,
        "bucketed nearest disagrees with brute force")
    } finally { df.unpersist(); () }
  }

  test("agg_histogram_equidepth: balanced buckets that tile the value range") {
    val df = SparkEntry.queries("agg_histogram_equidepth")(spark, sf001)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val ns = rows.map(_.getLong(3))
    assert(ns.max - ns.min <= 1, s"equi-depth buckets unbalanced: ${ns.toSeq}")
    assert(ns.sum == Tables.lineitem(spark, sf001).count())
    // buckets are ordered and non-overlapping: each hi ≤ next lo
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(2) <= b.getDouble(1),
        s"bucket ${a.getLong(0)} hi > bucket ${b.getLong(0)} lo")
    case _ => ()
    }
  }

  test("llm_lm_score: probabilities are proper; log-space perplexity is finite and ≥ 1") {
    val df = SparkEntry.queries("llm_lm_score")(spark, sf001).cache()
    try {
      assert(df.count() > 0)
      assert(df.filter(col("avg_p") <= 0.0 || col("avg_p") > 1.0).count() == 0)
      assert(df.filter(col("min_p") > col("avg_p") + 1e-6).count() == 0)
      // the geometric-mean (perplexity) form lives here, Spark-only —
      // ln is libm-dependent so the oracled op ships linear stats
      // (see the op's Scaladoc); self-trained model ⇒ every bigram
      // has p > 0 ⇒ perplexity finite, and ppl ≥ 1 since p ≤ 1
      val ppl = df.select(exp(-avg(log(col("min_p")))).as("ppl"))
        .head().getDouble(0)
      assert(!ppl.isNaN && !ppl.isInfinite && ppl >= 1.0)
    } finally { df.unpersist(); () }
  }

  test("agg_auc_rank semantics: planted perfect separation → 1, identical distributions → 0.5") {
    import spark.implicits._
    // perfect separation: every purchase value above every click value
    val sep = (1 to 50).map(i => (i.toLong, "purchase", 100.0 + i)) ++
      (1 to 50).map(i => (i.toLong + 100, "click", 1.0 + i))
    sep.toDF("event_id", "event_type", "value")
      .createOrReplaceTempView("graft_auc_sep")
    val a1 = spark.sql(ops.Aggs.aucSql("graft_auc_sep")).head()
    assert(a1.getAs[Double]("auc") == 1.0, s"separated AUC: $a1")
    // identical value multisets → AUC exactly 0.5 (ties count half)
    val same = (1 to 50).map(i => (i.toLong, "purchase", (i % 7).toDouble)) ++
      (1 to 50).map(i => (i.toLong + 100, "click", (i % 7).toDouble))
    same.toDF("event_id", "event_type", "value")
      .createOrReplaceTempView("graft_auc_same")
    val a2 = spark.sql(ops.Aggs.aucSql("graft_auc_same")).head()
    assert(a2.getAs[Double]("auc") == 0.5, s"identical AUC: $a2")
  }

  test("agg_ks_test semantics: identical distributions → D = 0; disjoint supports → D = 1") {
    import spark.implicits._
    val same = (1 to 40).map(i => (i.toLong, "purchase", (i % 5).toDouble)) ++
      (1 to 40).map(i => (i.toLong + 100, "click", (i % 5).toDouble))
    same.toDF("event_id", "event_type", "value")
      .createOrReplaceTempView("graft_ks_same")
    val k1 = spark.sql(ops.Aggs.ksSql("graft_ks_same")).head()
    assert(k1.getAs[Double]("d_stat") == 0.0, s"identical KS: $k1")
    val disj = (1 to 40).map(i => (i.toLong, "purchase", 100.0 + i)) ++
      (1 to 40).map(i => (i.toLong + 100, "click", 1.0 + i))
    disj.toDF("event_id", "event_type", "value")
      .createOrReplaceTempView("graft_ks_disj")
    val k2 = spark.sql(ops.Aggs.ksSql("graft_ks_disj")).head()
    assert(k2.getAs[Double]("d_stat") == 1.0, s"disjoint KS: $k2")
  }

  test("stream_growth_accounting: the accounting identities hold on the fixture") {
    val df = SparkEntry.queries("stream_growth_accounting")(spark, sf001)
      .cache()
    try {
      val rows = df.collect()
      assert(rows.nonEmpty)
      // dau = new + retained + resurrected, every day
      rows.foreach { r =>
        assert(r.getAs[Long]("dau") == r.getAs[Long]("n_new") +
          r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"),
          s"identity broke: $r")
      }
      // churned(d) = dau(d-1) - retained(d) for consecutive days
      val byDay = rows.map(r => r.getAs[Int]("eday") -> r).toMap
      rows.foreach { r =>
        byDay.get(r.getAs[Int]("eday") - 1).foreach { prev =>
          assert(r.getAs[Long]("n_churned") ==
            prev.getAs[Long]("dau") - r.getAs[Long]("n_retained"),
            s"churn identity broke at ${r.getAs[Int]("eday")}")
        }
      }
    } finally { df.unpersist(); () }
  }

  test("win_acf: every coefficient in [-1, 1]; 5 types x 7 lags") {
    val rows = SparkEntry.queries("win_acf")(spark, sf001).collect()
    assert(rows.length == 35, s"expected 35 rows, got ${rows.length}")
    rows.foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"acf out of range: $r")
    }
  }

  test("cdc_merge_into: action counts match the planted drift rates") {
    val df = SparkEntry.queries("cdc_merge_into")(spark, sf001).cache()
    try {
      val byAction = df.groupBy("action").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // inserts = re-keyed every-103rd rows (surviving the 97 drop);
      // updates = every-101st (surviving 97 and not re-keyed);
      // nothing else may appear, and keeps dominate
      assert(byAction.keySet == Set("insert", "update", "keep"), byAction.toString)
      assert(byAction("insert") > 0 && byAction("update") > 0)
      assert(byAction("keep") > byAction("insert") + byAction("update"))
      // deletes really deleted: no row for a dropped key
      assert(df.filter(col("o_orderkey") % 97 === 0 &&
        col("o_orderkey") < 4398046511104L).count() == 0)
    } finally { df.unpersist(); () }
  }

  test("win_skyline semantics: dominated points drop, frontier + price-tie co-optima survive") {
    import spark.implicits._
    // one brand: (price, size) points — frontier is (50, 2) and
    // (40, 1); (30, 3) is dominated by both, (40, 5) by (50, 2) on
    // price AND size, (50, 2) duplicated price with larger size 7 is
    // dominated within its price group
    val parts = Seq(
      ("B1", 50.0, 2), ("B1", 50.0, 7), ("B1", 40.0, 1),
      ("B1", 40.0, 5), ("B1", 30.0, 3))
      .toDF("p_brand", "p_retailprice", "p_size")
    parts.createOrReplaceTempView("graft_sky_planted")
    val rows = spark.sql(ops.Windows.skylineSql("graft_sky_planted"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(rows == Set((5000L, 2), (4000L, 1)), s"frontier: $rows")
  }

  test("r21 grid memo restructure: each value-grid query ≡ its " +
      "monolithic shared-SQL form row-for-row") {
    // the r21 optimization reads the session-memoized (key, cents)
    // cumulative grid instead of rebuilding it inline; the DuckDB
    // oracle is the unchanged monolithic SQL and this pin proves the
    // Spark sides agree with each other too
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    Tables.lineitem(spark, sf001).createOrReplaceTempView("graft_li_mono")
    Tables.orders(spark, sf001).createOrReplaceTempView("graft_ord_mono")
    val mono = Map(
      "agg_iqr_outliers" -> ops.Aggs.iqrOutliersSql("graft_li_mono"),
      "agg_winsorized_mean" -> ops.Aggs.winsorizedMeanSql("graft_li_mono"),
      "agg_hill_tail" -> ops.Aggs.hillTailSql("graft_ord_mono"),
      "agg_cvar" -> ops.Aggs.cvarSql("graft_ord_mono"))
    mono.foreach { case (key, monoSql) =>
      val restructured = rows(SparkEntry.queries(key)(spark, sf001))
      val monolithic = rows(spark.sql(monoSql))
      assert(restructured == monolithic,
        s"$key: memoized grid restructure diverged from monolithic SQL")
    }
  }

  test("r22 session memo restructure: bounce/peak-concurrency ≡ their " +
      "monolithic shared-SQL forms row-for-row") {
    // the r22 optimization reads the session-memoized 30 m session-
    // interval relation instead of re-deriving the sessionize subtree
    // (5× in peak_concurrency's plan, once more in bounce_rate); the
    // DuckDB oracle is the unchanged monolithic SQL and this pin
    // proves the Spark sides agree with each other too
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    Tables.events(spark, sf001).createOrReplaceTempView("graft_ev_mono")
    val mono = Map(
      "stream_bounce_rate" ->
        ops.EventOps.bounceSql("graft_ev_mono", spark = true),
      "stream_peak_concurrency" ->
        ops.EventOps.concurrencySql("graft_ev_mono", spark = true))
    mono.foreach { case (key, monoSql) =>
      val restructured = rows(SparkEntry.queries(key)(spark, sf001))
      val monolithic = rows(spark.sql(monoSql))
      assert(restructured == monolithic,
        s"$key: memoized sessionize restructure diverged from monolithic SQL")
    }
  }
}
