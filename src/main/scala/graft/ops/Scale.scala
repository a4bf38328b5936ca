package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale techniques that don't surface as driver queries but are part
  * of the 100 TB toolkit (SURVEY §4, builder mandate): skew salting
  * and bucketed co-located joins. ScaleSpec proves the behavior —
  * salted results equal plain results, bucketed joins plan without a
  * shuffle.
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
    */
  def saltedAgg(df: DataFrame, key: Column, value: Column,
      buckets: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"),
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets))
          .as("salt"))
      .groupBy("k", "salt")
      .agg(sum("v").as("psum"), count(lit(1)).as("pcnt"))
      .groupBy("k")
      .agg(sum("psum").as("total"), sum("pcnt").as("cnt"))
      .select(col("k"), round(col("total"), 6).as("total"), col("cnt"))
}
