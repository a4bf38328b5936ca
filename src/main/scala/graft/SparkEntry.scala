package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7
  * (build plan). Every operator lives in an `OpModule` under
  * `graft.ops`; this object is only the registry.
  */
object SparkEntry {

  private def modules: Seq[OpModule] = Seq(
    ops.Relational,
    ops.Joins,
    ops.Aggs,
    ops.Windows,
    ops.Functions,
    ops.EventOps,
    ops.LlmOps,
    ops.PipelineOps,
    ops.LayoutOps,
    ops.PqOps,
    ops.Multimodal,
    ops.GraphOps,
    ops.Extension,
    ops.AvroWire,
    ops.ProtoWire,
    ops.JsonWire,
    ops.BinlogWire)

  lazy val all: Seq[Op] = {
    val xs = modules.flatMap(_.ops)
    val dup = xs.groupBy(_.key).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate op keys: ${dup.mkString(",")}")
    xs
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_hash_group")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(o => o.key -> o.fn).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(o => o.oracle.map(sql => o.key -> sql)).toMap

  /** `oracleSql` rendered as the JSON document the driver's json.load
    * consumes — single shared implementation so Verify and Dev can
    * never drift. Escapes backslash, quote and ALL control chars
    * (<0x20): a tab or CR in builder-authored SQL would otherwise make
    * the driver's parse fail and silently zero the round's
    * correctness.
    */
  def oracleSqlJson: String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
  }
}
