package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** Diagnostic (not part of the driver contract): run a registered
  * query and report whether the session memos actually engage —
  * prints the analyzed plan BEFORE and AFTER CacheManager
  * substitution plus a per-view lookup probe. Usage:
  * runMain graft.CacheDiag <sfDir> <name> [viewName ...]
  */
object CacheDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val views = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    views.foreach { v =>
      val t = spark.table(v)
      println(s"[diag] view $v: lookupCachedData defined = ${Bridge.isCached(t)}")
    }
    val cached = Bridge.withCachedData(df)
    val n = cached.collect {
      case r if r.nodeName.contains("InMemoryRelation") => r }.size
    println(s"[diag] $name: InMemoryRelation nodes after substitution = $n")
    println("=== analyzed ===")
    println(df.queryExecution.analyzed.treeString.take(6000))
    println("=== withCachedData ===")
    println(cached.treeString.take(6000))
    spark.stop()
  }
}
