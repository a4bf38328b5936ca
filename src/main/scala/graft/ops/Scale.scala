package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale techniques of the 100 TB toolkit (SURVEY §4, builder
  * mandate): skew salting and bucketed co-located joins. ScaleSpec
  * proves the behavior — salted results equal plain results, bucketed
  * joins plan without a shuffle — and `agg_salted_skew` (r10) puts the
  * salted rewrite under the DuckDB hash gate.
  */
object Scale {

  /** Two-stage salted aggregation for skewed keys: stage 1 aggregates
    * on (key, salt) — spreading one hot key over `buckets` reducers —
    * stage 2 combines the partials per key. Sum/count decompose
    * exactly; avg = sum/count on the combined partials.
    *
    * AQE's skew handling covers sort-merge JOINS automatically; a
    * pathologically hot GROUP BY key still serializes one reducer,
    * which is what this addresses.
    *
    * The salt is intentionally nondeterministic-per-row (partition id
    * + row position): ANY assignment yields the same result because
    * sum/count decompose over every partition of the rows — which is
    * also why the DuckDB oracle (plain GROUP BY, no salt) applies.
    * Accumulation is exact DECIMAL(38,10) end to end (§5.2): double
    * partials would make the total depend on which salt bucket each
    * row landed in.
    */
  def saltedAgg(df: DataFrame, key: Column, value: Column,
      buckets: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"),
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets))
          .as("salt"))
      .groupBy("k", "salt")
      .agg(sum(col("v").cast(org.apache.spark.sql.types.DataTypes
        .createDecimalType(38, 10))).as("psum"), count(lit(1)).as("pcnt"))
      .groupBy("k")
      .agg(round(sum("psum"), 6).cast("double").as("total"),
        sum("pcnt").as("cnt"))

  /** Salted fact⋈dim equi join for skewed fact keys: the fact side
    * gets a nondeterministic-but-irrelevant salt in [0, buckets), the
    * dim side is REPLICATED once per salt value (explode over the
    * bucket range — dim×buckets rows, fine for a dim), and the join
    * runs on (key, salt) — so one hot fact key spreads over `buckets`
    * reducers instead of serializing one. Every fact row matches
    * exactly the one replica carrying its salt, so the result
    * multiset is EXACTLY the plain join's for any salt assignment —
    * which is why the plain-join SQL can oracle it.
    *
    * This is the rewrite for when AQE's skew-join split can't engage
    * (it needs sort-merge stages it can re-plan) or when the skew is
    * known ahead of time; `buckets` times dim replication is the
    * price, so it suits genuine dims, not fact⋈fact.
    */
  def saltedJoin(fact: DataFrame, factKey: Column,
      dim: DataFrame, dimKey: Column, buckets: Int = 16): DataFrame = {
    val salted = fact.withColumn("graft_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val replicated = dim.withColumn("graft_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.hint("merge").join(replicated,
      factKey === dimKey && salted("graft_salt") === replicated("graft_salt"))
      .drop("graft_salt")
  }
}
