package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Source/sink coverage beyond the parquet testdata (SURVEY §2.1):
  * CSV and JSON round-trips preserve the event stream, partitioned
  * writes enable static partition pruning, and a filtered dim join
  * triggers dynamic partition pruning — the dominant scan-reduction
  * levers at 100 TB.
  */
class SourcesSpec extends SparkSpec {

  private def events = Tables.events(spark, sf001)
    .select("event_id", "user_id", "event_type", "value")

  test("CSV round-trip preserves the event slice") {
    val dir = tmpDir("graft_csv")
    events.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema("event_id long, user_id long, event_type string, value double")
      .csv(dir)
    assert(back.orderBy("event_id").collect().toSeq ==
      events.orderBy("event_id").collect().toSeq)
  }

  test("JSON lines round-trip preserves the event slice") {
    val dir = tmpDir("graft_json")
    events.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema("event_id long, user_id long, event_type string, value double")
      .json(dir)
    assert(back.orderBy("event_id").collect().toSeq ==
      events.orderBy("event_id").collect().toSeq)
  }

  test("partitioned write + filter = static partition pruning at the scan") {
    val dir = tmpDir("graft_part")
    events.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition filter at the scan:\n$plan")
    assert(q.count() == events.filter(col("event_type") === "purchase").count())
  }

  test("dynamic partition pruning fires on a partitioned fact x filtered dim join") {
    val dir = tmpDir("graft_dpp")
    events.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim must be file-backed: ConvertToLocalRelation folds a Filter
    // over an in-memory Seq away before the PartitionPruning rule can
    // see it, so DPP never triggers on LocalRelation dims
    val dim = {
      import spark.implicits._
      Seq(("purchase", 1.5), ("error", 0.0)).toDF("dt_type", "weight")
        .write.mode("overwrite").parquet(s"$dir/dim")
      spark.read.parquet(s"$dir/dim")
    }
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    // the stats-based benefit estimate vetoes DPP on toy-sized tables;
    // disable it so the mechanism itself is observable
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val q = fact.join(dim, col("event_type") === col("dt_type"))
        .filter(col("weight") > 1.0)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
        s"DPP did not fire:\n$plan")
      val expected = events.filter(col("event_type") === "purchase").count()
      assert(q.collect().map(r => r.getAs[Long]("n")).sum == expected)
    } finally {
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    }
  }
}
