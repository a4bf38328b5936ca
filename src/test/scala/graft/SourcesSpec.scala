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

  test("malformed CSV: PERMISSIVE quarantines exactly the three poison lines to the corrupt column") {
    // run the registered op once so the fixture (nation + 3 poison
    // lines) exists at its static path
    SparkEntry.queries("scan_csv_malformed")(spark, sf001).collect()
    // the production dead-letter form: corrupt lines land in a column
    // instead of vanishing (DROPMALFORMED is the registered, oracled
    // form; this pins that the SAME three lines are what quarantine)
    val df = spark.read
      .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, _bad STRING")
      .option("header", true).option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv("/tmp/graft_scan_fixtures/nation_bad.csv")
      .cache() // Spark disallows filtering the internal corrupt column uncached
    try {
      val bad = df.filter(col("_bad").isNotNull)
        .select("_bad").collect().map(_.getString(0)).sorted
      assert(bad.length == 3, s"expected 3 quarantined lines, got ${bad.toSeq}")
      assert(bad.exists(_.startsWith("garbage")) &&
        bad.exists(_.contains("surplus")) &&
        bad.exists(_.startsWith("notanumber")),
        s"unexpected quarantine set: ${bad.toSeq}")
      assert(df.filter(col("_bad").isNull).count() == 25,
        "good rows must all survive in PERMISSIVE mode")
    } finally { df.unpersist(); () }
  }

  test("dsv2 write: two-phase commit round-trips; overwrite replaces atomically") {
    val dir = tmpDir("graft_dsv2_write")
    val p = s"$dir/nation_out.csv"
    val src = Tables.nation(spark, sf001)
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))
    src.write.format("graft.sources.GraftFixtureSource")
      .option("path", p).mode("overwrite").save()
    // read back through the connector's own read path
    val back = spark.read.format("graft.sources.GraftFixtureSource")
      .option("path", p).load()
      .orderBy("n_nationkey").collect().toSeq
    val want = src.orderBy("n_nationkey").collect().toSeq
    assert(back == want, "write → read round-trip must be identity")
    // overwrite with a subset replaces the whole file (TRUNCATE path)
    src.filter(col("n_nationkey") < 5)
      .write.format("graft.sources.GraftFixtureSource")
      .option("path", p).mode("overwrite").save()
    val back2 = spark.read.format("graft.sources.GraftFixtureSource")
      .option("path", p).load().count()
    assert(back2 == 5, s"overwrite must replace, got $back2 rows")
    // no stray task temps survive a successful commit
    val stray = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith(".graft-write-"))
    assert(stray.isEmpty, s"leaked task temps: ${stray.mkString(",")}")
  }

  test("dsv2 write: task abort deletes the temp; job abort leaves the previous file intact") {
    import graft.sources.{FixtureBatchWrite, FixtureCommitMessage, FixtureDataWriter}
    val dir = tmpDir("graft_dsv2_abort")
    val p = s"$dir/out.csv"
    // seed a committed file (the "previous" generation)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "n_nationkey,n_name,n_regionkey\n1,SEED,1\n")
    // a task writes rows then ABORTS (failed attempt / speculation
    // loser): its temp must vanish and the target must be untouched
    val w = new FixtureDataWriter(p, partitionId = 0, taskId = 7L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(2L,
      org.apache.spark.unsafe.types.UTF8String.fromString("DOOMED"), 2L))
    w.abort()
    val tempsAfterTaskAbort = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith(".graft-write-"))
    assert(tempsAfterTaskAbort.isEmpty, "task abort must delete its temp")
    // a committed task whose JOB then aborts: driver abort deletes the
    // referenced temp; the previous file is byte-identical
    val w2 = new FixtureDataWriter(p, partitionId = 0, taskId = 8L)
    w2.write(org.apache.spark.sql.catalyst.InternalRow(3L,
      org.apache.spark.unsafe.types.UTF8String.fromString("ALSO_DOOMED"), 3L))
    val msg = w2.commit().asInstanceOf[FixtureCommitMessage]
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(msg.tempPath)))
    new FixtureBatchWrite(p).abort(Array(msg))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(msg.tempPath)),
      "job abort must delete referenced temps")
    val content = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
    assert(content == "n_nationkey,n_name,n_regionkey\n1,SEED,1\n",
      "job abort must leave the previous committed file intact")
  }
}
