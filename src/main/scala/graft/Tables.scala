package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders for the driver-generated testdata
  * (`/root/testdata/sf*`; schemas in FIXTURES.md).
  *
  * Design notes (100 TB posture):
  *  - All reads are plain `spark.read.parquet` so Catalyst's column
  *    pruning / predicate pushdown reach the scan untouched; no
  *    driver-side materialization ever happens here.
  *  - Session tuning (AQE, UTC, shuffle partitions) is applied
  *    idempotently on every load because the driver's Verify/Bench
  *    mains build their own sessions without these flags
  *    (SURVEY.md §7 "hard parts").
  */
object Tables {

  /** Idempotent session posture. Runtime-settable confs only. */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // events.ts is parquet timestamp[ns]; Spark has no ns timestamp.
    // Read as long nanos and convert explicitly (FIXTURES.md).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** `events` with `ts` converted long-nanos → TimestampType (µs,
    * truncated toward −∞ for positive epochs — matches DuckDB's
    * TIMESTAMP_NS→TIMESTAMP cast). Integer `DIV` keeps full 64-bit
    * precision (a double roundtrip would lose sub-µs bits).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  /** Scratch root for a write-once fixture, scoped by (session,
    * corpus): `/tmp/graft_fixtures/<name>/<sessionUUID>/<md5(sfDir)>`.
    * One dir per (session, corpus) means concurrent sessions never
    * overwrite each other's fixtures mid-scan and different-SF runs
    * within a session never race — the ONE keying recipe every
    * fixture-writing op shares (a per-op copy of this logic is how
    * keying schemes silently drift apart).
    */
  def fixtureRoot(spark: SparkSession, sfDir: String, name: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val sid = org.apache.spark.sql.graftbridge.Bridge.sessionUUID(spark)
    s"/tmp/graft_fixtures/$name/$sid/$digest"
  }
}
