package graft

import graft.ops.Scale
import org.apache.spark.sql.functions._

/** Proofs for the scale toolkit: salting preserves aggregate
  * semantics; bucketing removes the join shuffle entirely.
  */
class ScaleSpec extends SparkSpec {

  test("salted aggregation equals plain aggregation on a skewed key") {
    // synthesize skew: fold every user into one hot key for half the rows
    val e = Tables.events(spark, sf001)
      .withColumn("k", when(col("event_id") % 2 === 0, 0L).otherwise(col("user_id")))
    val salted = Scale.saltedAgg(e, col("k"), col("value"), buckets = 8)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val plain = e.groupBy(col("k"))
      .agg(round(sum("value"), 6).as("total"), count(lit(1)).as("cnt"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(salted == plain)
    assert(plain.exists(_._1 == 0L))
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    val wh = tmpDir("graft_warehouse")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_cust_b")
      Tables.orders(spark, sf001).write
        .option("path", s"$wh/g_orders_b")
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("g_orders_b")
      Tables.customer(spark, sf001).write
        .option("path", s"$wh/g_cust_b")
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("g_cust_b")
      val joined = spark.table("g_orders_b")
        .join(spark.table("g_cust_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself reads pre-bucketed data: the only exchange
      // allowed is the one feeding the final segment aggregation
      val joinPart = plan.split("SortMergeJoin")(1)
      assert(!joinPart.contains("Exchange hashpartitioning(o_custkey") &&
        !joinPart.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // correctness: same result as the unbucketed join
      val expected = Tables.orders(spark, sf001)
        .join(Tables.customer(spark, sf001),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment").collect().toSeq
      assert(joined.orderBy("c_mktsegment").collect().toSeq == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_cust_b")
    }
  }
}
