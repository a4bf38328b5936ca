package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Toy DataSourceV2 connector (SURVEY §2 row 7f / VERDICT r10 #7):
  * the one public extension surface the engine had not exercised —
  * `TableProvider` → `Table` → `ScanBuilder` → `Batch` → per-partition
  * `PartitionReader`, with REAL operator pushdown: filter pushdown
  * (`SupportsPushDownFilters`, numeric comparisons evaluated inside
  * the reader) and column pruning (`SupportsPushDownRequiredColumns`,
  * projected rows never materialize pruned columns).
  *
  * The table it serves is the SF-invariant rendered nation CSV the
  * `scan_csv` op writes (25 rows, byte-identical at every SF — the
  * static-oracle-path requirement), so the registered `scan_dsv2`
  * query sits under the full DuckDB hash gate like any other scan.
  *
  * 100 TB notes: the connector is deliberately single-partition (the
  * fixture is one small file) but the split machinery is the real
  * one — `planInputPartitions` is where a production source returns
  * one `InputPartition` per file/rowgroup/shard, and the pushdown
  * handshake (prune + filter BEFORE rows reach Spark) is exactly the
  * contract that makes a remote scan cheap: bytes never read beat
  * bytes filtered later. PlanSpec pins that the executed plan's
  * `BatchScanExec` carries the pushed filter and the pruned schema.
  */
class GraftFixtureSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftFixtureSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FixtureTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object GraftFixtureSource {
  /** The rendered-nation fixture schema (matches `scan_csv`). */
  val schema: StructType = StructType(Seq(
    StructField("n_nationkey", LongType, nullable = false),
    StructField("n_name", StringType, nullable = false),
    StructField("n_regionkey", LongType, nullable = false)))

  /** Evaluate a pushed filter against a parsed row. Only the filter
    * shapes [[FixtureScanBuilder]] accepts arrive here. */
  private[sources] def eval(f: Filter, row: Map[String, Any]): Boolean = {
    def lng(v: Any): Long = v.asInstanceOf[Number].longValue
    f match {
      case EqualTo(a, v) => lng(row(a)) == lng(v)
      case GreaterThan(a, v) => lng(row(a)) > lng(v)
      case GreaterThanOrEqual(a, v) => lng(row(a)) >= lng(v)
      case LessThan(a, v) => lng(row(a)) < lng(v)
      case LessThanOrEqual(a, v) => lng(row(a)) <= lng(v)
      case In(a, vs) => vs.exists(v => lng(row(a)) == lng(v))
      case And(l, r) => eval(l, row) && eval(r, row)
      // A shape accepted by pushable() but not handled here means Spark
      // already removed the filter from the plan (it was not residual) —
      // silently returning `true` would drop the predicate. Fail loudly.
      case other => sys.error(s"pushable/eval drift: unhandled pushed filter $other")
    }
  }

  /** A filter is pushable when the reader can evaluate it exactly:
    * numeric comparisons over the two long columns. */
  private[sources] def pushable(f: Filter): Boolean = f match {
    case EqualTo(a, v) => longCol(a) && v.isInstanceOf[Number]
    case GreaterThan(a, v) => longCol(a) && v.isInstanceOf[Number]
    case GreaterThanOrEqual(a, v) => longCol(a) && v.isInstanceOf[Number]
    case LessThan(a, v) => longCol(a) && v.isInstanceOf[Number]
    case LessThanOrEqual(a, v) => longCol(a) && v.isInstanceOf[Number]
    case In(a, vs) => longCol(a) && vs.forall(_.isInstanceOf[Number])
    case And(l, r) => pushable(l) && pushable(r)
    case _ => false
  }
  private def longCol(name: String): Boolean =
    name == "n_nationkey" || name == "n_regionkey"
}

class FixtureTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_fixture($path)"
  override def schema(): StructType = GraftFixtureSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixtureScanBuilder(path)
}

class FixtureScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GraftFixtureSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition(GraftFixtureSource.pushable)
    pushed = ours
    // the reader evaluates `ours` exactly — only the rest is residual
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve source column order regardless of requested order
    val want = requiredSchema.fieldNames.toSet
    required = StructType(
      GraftFixtureSource.schema.fields.filter(f => want(f.name)))
  }

  override def build(): Scan = new FixtureScan(path, required, pushed)
}

class FixtureScan(path: String, override val readSchema: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftFixtureScan path=$path " +
      s"PushedFilters=[${pushed.mkString(", ")}] " +
      s"ReadSchema=[${readSchema.fieldNames.mkString(", ")}]"

  /** Exposed for PlanSpec's pushdown pin. */
  def pushedForTest: Seq[Filter] = pushed.toSeq

  override def planInputPartitions(): Array[InputPartition] =
    Array(FixtureInputPartition(path))
  override def createReaderFactory(): PartitionReaderFactory =
    new FixtureReaderFactory(readSchema.fieldNames, pushed)
}

case class FixtureInputPartition(path: String) extends InputPartition

class FixtureReaderFactory(columns: Array[String], pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FixtureInputPartition]
    new FixtureReader(p.path, columns, pushed)
  }
}

/** Parses the rendered nation CSV on the EXECUTOR (header + `long,
  * string,long` lines; the fixture renderer guarantees no quoted
  * commas), applies the pushed filters, and emits only the pruned
  * columns — rows that fail a pushed filter never become
  * InternalRows, which is the pushdown contract under test. */
class FixtureReader(path: String, columns: Array[String],
    pushed: Array[Filter]) extends PartitionReader[InternalRow] {
  private val lines = java.nio.file.Files
    .readAllLines(java.nio.file.Paths.get(path)).asScala
    .drop(1).iterator.filter(_.nonEmpty)
  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null && lines.hasNext) {
      val line = lines.next()
      val parts = line.split(",", -1)
      // the renderer guarantees exactly 3 unquoted fields; any other file
      // wired in via the `path` option should fail loudly, not mis-parse
      require(parts.length == 3,
        s"graft_fixture: malformed line (expected 3 comma-separated fields): $line")
      val row = Map[String, Any](
        "n_nationkey" -> parts(0).toLong,
        "n_name" -> parts(1),
        "n_regionkey" -> parts(2).toLong)
      if (pushed.forall(GraftFixtureSource.eval(_, row)))
        current = InternalRow.fromSeq(columns.toSeq.map {
          case "n_name" => UTF8String.fromString(row("n_name").asInstanceOf[String])
          case c => row(c).asInstanceOf[Long]
        })
    }
    current != null
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
