package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
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

class FixtureTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_fixture($path)"
  override def schema(): StructType = GraftFixtureSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixtureScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new FixtureWriteBuilder(path, info)
}

/** The WRITE half of the connector (the read half landed in r13) —
  * the full V2 two-phase commit protocol, which is the part of a
  * production sink that actually earns its keep:
  *
  *  1. each TASK streams its rows to a private temp file next to the
  *     target (`.graft-write-<UUID>.tmp`) and only names it in its
  *     [[WriterCommitMessage]] — a task that dies mid-write leaves a
  *     temp the driver never references;
  *  2. task `abort()` deletes the temp eagerly (speculation losers,
  *     failed attempts);
  *  3. the DRIVER's `BatchWrite.commit` concatenates the temps in
  *     partition order into the final file via temp-then-ATOMIC_MOVE
  *     (a concurrent reader sees the old complete file or the new
  *     complete file, never a torn one — the fixture contract), then
  *     deletes the temps; `BatchWrite.abort` deletes every referenced
  *     temp and touches nothing else.
  *
  * Result: effectively-once visibility from at-least-once task
  * attempts — the same recipe every file-based V2 sink implements
  * (commit coordination + atomic rename), exercised end-to-end in
  * SourcesSpec (round-trip, task abort leaves no partial output,
  * job abort leaves the previous file intact). Overwrite mode is
  * declared via TRUNCATE capability: the final MOVE replaces the
  * file, so truncate needs no separate pass. At 100 TB the temps are
  * per-task objects in the store and `commit` writes a manifest
  * instead of concatenating — the protocol shape is identical.
  */
class FixtureWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  // schema contract: the connector serves exactly the nation fixture
  require(info.schema().fieldNames.sameElements(
      GraftFixtureSource.schema.fieldNames),
    s"graft_fixture write: schema must be " +
      s"[${GraftFixtureSource.schema.fieldNames.mkString(",")}], got " +
      s"[${info.schema().fieldNames.mkString(",")}]")
  override def truncate(): WriteBuilder = this
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new FixtureBatchWrite(path)
  }
}

class FixtureBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new FixtureWriterFactory(path)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val target = Paths.get(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val temps = messages.collect {
      case FixtureCommitMessage(p, n) if n >= 0 => Paths.get(p)
    }
    val tmp = Files.createTempFile(
      if (target.getParent != null) target.getParent
      else Paths.get("."), s".${target.getFileName}", ".commit")
    try {
      val out = new StringBuilder("n_nationkey,n_name,n_regionkey\n")
      temps.foreach { t =>
        if (Files.exists(t)) out.append(Files.readString(t))
      }
      Files.writeString(tmp, out.toString)
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } finally {
      Files.deleteIfExists(tmp)
      temps.foreach(Files.deleteIfExists)
      ()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    import java.nio.file.{Files, Paths}
    messages.foreach {
      case FixtureCommitMessage(p, _) =>
        Files.deleteIfExists(Paths.get(p)); ()
      case _ => ()
    }
  }
}

case class FixtureCommitMessage(tempPath: String, rows: Long)
  extends WriterCommitMessage

class FixtureWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new FixtureDataWriter(path, partitionId, taskId)
}

/** Per-task writer: rows stream to a private temp; `commit` hands the
  * temp's name to the driver, `abort` deletes it. The temp carries
  * the task UUID, so two attempts of the same partition (speculation,
  * retry) can never collide — the driver commits exactly the attempts
  * whose messages reached it. */
class FixtureDataWriter(path: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  import java.nio.file.{Files, Paths}
  private val target = Paths.get(path)
  private val temp = {
    val dir = if (target.getParent != null) target.getParent
      else Paths.get(".")
    Files.createDirectories(dir)
    dir.resolve(
      s".graft-write-${java.util.UUID.randomUUID().toString.take(12)}" +
        s"-p$partitionId-t$taskId.tmp")
  }
  private val out = Files.newBufferedWriter(temp)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val name = row.getUTF8String(1).toString
    require(!name.contains(",") && !name.contains("\n"),
      s"graft_fixture write: n_name must be comma/newline-free: $name")
    out.write(s"${row.getLong(0)},$name,${row.getLong(2)}\n")
    rows += 1
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    FixtureCommitMessage(temp.toString, rows)
  }
  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(temp)
    ()
  }
  override def close(): Unit = ()
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
