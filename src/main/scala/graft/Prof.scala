package graft
// temporary profiling main — not part of the driver contract
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2fs ($n rows)")
    }
    val emb = Tables.embeddings(spark, d)
    t("warm scan")(emb.count())
    t("warm scan2")(emb.count())
    val cents = ops.LlmOps.lloydCentroids(emb, 8)
    t("lloyd")(cents.count())
    t("lloyd again")(ops.LlmOps.lloydCentroids(emb, 8).count())
    val assign = ops.LlmOps.assignBuckets(emb, cents)
    t("assign")(assign.count())
    t("assign again")(assign.count())
    t("ivfExact nocache 1")(ops.LlmOps.simSearchIvfExact(emb, 5, 10).count())
    t("ivfExact nocache 2")(ops.LlmOps.simSearchIvfExact(emb, 5, 10).count())
    t("ivfExact cached 1")(ops.LlmOps.simSearchIvfExact(emb, 5, 10, cacheKey = Some(d)).count())
    t("ivfExact cached 2")(ops.LlmOps.simSearchIvfExact(emb, 5, 10, cacheKey = Some(d)).count())
    t("ivf approx cached")(ops.LlmOps.simSearchIvf(emb, 5, 10, cacheKey = Some(d)).count())
    t("ivf approx cached 2")(ops.LlmOps.simSearchIvf(emb, 5, 10, cacheKey = Some(d)).count())
    spark.stop()
  }
}
