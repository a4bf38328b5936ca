package graft
import org.apache.spark.sql.functions._
class TmpLangSpec extends SparkSpec {
  test("lang phases sf0.1") {
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[lang] $name: ${(System.nanoTime()-t0)/1e9}%.3f s ($n)")
    }
    val base = Tables.documents(spark, sf01).select(col("doc_id"), col("lang"),
      lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("txt"))
    val tris = base.selectExpr("doc_id", "lang",
      """CASE WHEN char_length(txt) < 3 THEN array()
           ELSE array_distinct(transform(sequence(1, char_length(txt) - 2),
             i -> substr(txt, i, 3))) END AS ts""")
    t("tris")(tris.count())
    t("tris again")(tris.count())
    t("explode")(tris.select(col("doc_id"), explode(col("ts"))).count())
    val wProf = org.apache.spark.sql.expressions.Window
      .partitionBy("plang").orderBy(col("c").desc, col("t").asc)
    val profile = tris.filter(col("doc_id") % 5 =!= 0)
      .select(col("lang").as("plang"), explode(col("ts")).as("t"))
      .groupBy("plang", "t").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(wProf))
      .filter(col("rn") <= 200)
      .select("plang", "t")
    t("profile")(profile.count())
    val wBest = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("m").desc, col("plang").asc)
    val best = tris.select(col("doc_id"), explode(col("ts")).as("t"))
      .join(broadcast(profile), "t")
      .groupBy("doc_id", "plang").agg(count(lit(1)).as("m"))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("plang"))
    t("best")(best.count())
    t("full")(graft.ops.LlmOps.langId(Tables.documents(spark, sf01)).count())
  }
}
