package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed to the driver contract.
  *
  * @param key    `SparkEntry.queries` map key (SURVEY.md §2 "key" column)
  * @param fn     pure `(session, sfDir) => DataFrame`; must end in a total
  *               ordering over a unique key set when `oracle` is declared
  * @param oracle DuckDB-equivalent ANSI SQL over the same parquet tables;
  *               None for ops that are not DuckDB-expressible (they are
  *               covered by ScalaTest instead — SURVEY.md §5.2)
  */
final case class Op(
    key: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait OpModule {
  def ops: Seq[Op]
}
