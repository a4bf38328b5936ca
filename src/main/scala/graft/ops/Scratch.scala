package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary diagnostic — delete before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val s1 = LlmOps.shingleSets(docs, 5).repartition(col("doc_id"))
    val s2 = LlmOps.shingleSets(docs, 5).repartition(col("doc_id"))
    val p1 = s1.queryExecution.executedPlan
    val p2 = s2.queryExecution.executedPlan
    println("sameResult(executed): " + p1.sameResult(p2))
    println("sameResult(optimized): " +
      s1.queryExecution.optimizedPlan.sameResult(s2.queryExecution.optimizedPlan))
    // drill down: which node breaks it?
    val o1 = s1.queryExecution.optimizedPlan
    val o2 = s2.queryExecution.optimizedPlan
    def walk(a: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             b: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             depth: Int): Unit = {
      println(s"[$depth] ${a.nodeName} sameResult=${a.sameResult(b)}")
      a.children.zip(b.children).foreach { case (ca, cb) => walk(ca, cb, depth + 1) }
    }
    walk(o1, o2, 0)
    // expression-level canonical check on the projections
    val pr1 = o1.collect { case p: org.apache.spark.sql.catalyst.plans.logical.Project => p }
    val pr2 = o2.collect { case p: org.apache.spark.sql.catalyst.plans.logical.Project => p }
    pr1.zip(pr2).foreach { case (a, b) =>
      a.projectList.zip(b.projectList).foreach { case (ea, eb) =>
        val ca = ea.canonicalized
        val cb = eb.canonicalized
        if (ca != cb) {
          println(s"EXPR MISMATCH:\n  A: $ca\n  B: $cb")
        }
      }
    }
    println("done")
    spark.stop()
  }
}
