package graft.ops

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** MySQL binlog-v4 wire format: synthesis + a real parser (SURVEY
  * "What's missing" #2 — a meepo user's first touchpoint is a binlog
  * position, and until now no wire parser existed).
  *
  * Zero egress means no MySQL server, so the bytes are SELF-
  * SYNTHESIZED — but in the genuine, publicly documented binary
  * layout (MySQL replication protocol: 19-byte v4 event headers,
  * FORMAT_DESCRIPTION / QUERY / TABLE_MAP / WRITE·UPDATE·DELETE_ROWS
  * v2 / XID events, net_store_length packed ints, per-type column
  * metadata, null bitmaps) — the AvroWire pattern: the parser is
  * real; only the producer is a stand-in. The parse path exercises
  * everything a meepo-style fetcher does: magic + FDE validation,
  * TABLE_MAP registry (table_id → column types/metadata), row-image
  * decoding against the registered schema, BEGIN…XID transaction
  * buffering (rows are only emitted when their commit arrives, xid-
  * stamped), crash-truncated-tail handling (stop at the last complete
  * event and report the resume position — binlog positions are the
  * replay contract).
  *
  * Distribution: one binlog file = one server/shard; files partition
  * across executors via the binaryFile source and parse in parallel
  * ACROSS shards while staying sequential WITHIN one (the format is
  * inherently ordered — that order IS meepo's per-server delivery
  * guarantee). Synthesis is executor-side too: txn-ranged partitions
  * each write their own shard, no driver collect.
  *
  * Under the hash gate: the registered round-trip query parses the
  * synthesized log and must reproduce the events-table projection —
  * longs ride as LE64, doubles as their 8 IEEE bytes (bit-exact),
  * strings length-prefixed UTF-8, so decode∘encode is the identity.
  */
object BinlogWire extends OpModule {

  // event type codes (public protocol constants)
  val QUERY_EVENT = 2
  val XID_EVENT = 16
  val FORMAT_DESCRIPTION_EVENT = 15
  val TABLE_MAP_EVENT = 19
  val WRITE_ROWS_V2 = 30
  val UPDATE_ROWS_V2 = 31
  val DELETE_ROWS_V2 = 32

  // column type codes
  val TYPE_LONGLONG = 8
  val TYPE_DOUBLE = 5
  val TYPE_VARCHAR = 15

  val HeaderLen = 19
  val TableId = 23L
  val ServerId = 1
  val TxnW = 16

  /** One decoded row-change, xid-stamped at its transaction's commit.
    * `log_pos` = byte offset of the rows event that carried it. */
  final case class BinlogRow(shard: Int, log_pos: Long, ts_sec: Long,
      xid: Long, op: String, event_id: Long, user_id: Long,
      value: Double, event_type: String)

  // ── synthesis ────────────────────────────────────────────────────

  private class ByteBuf {
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u24(v: Int): Unit = { u8(v); u8(v >> 8); u8(v >> 16) }
    def u32(v: Long): Unit = { u8(v.toInt); u8((v >> 8).toInt)
      u8((v >> 16).toInt); u8((v >> 24).toInt) }
    def u48(v: Long): Unit = { u32(v); u8((v >> 32).toInt); u8((v >> 40).toInt) }
    def u64(v: Long): Unit = { u32(v); u32(v >>> 32) }
    def bytes(b: Array[Byte]): Unit = out.write(b)
    def packed(v: Long): Unit = // net_store_length
      if (v < 251) u8(v.toInt)
      else if (v < 65536) { u8(0xfc); u16(v.toInt) }
      else if (v < (1 << 24)) { u8(0xfd); u24(v.toInt) }
      else { u8(0xfe); u64(v) }
    def size: Int = out.size()
    def toBytes: Array[Byte] = out.toByteArray
  }

  /** Append one event (header + payload) maintaining log_pos. */
  private def emit(buf: ByteBuf, tsSec: Long, tpe: Int,
      payload: Array[Byte]): Unit = {
    val size = HeaderLen + payload.length
    val logPos = buf.size + size // next-event position, the v4 contract
    buf.u32(tsSec); buf.u8(tpe); buf.u32(ServerId.toLong)
    buf.u32(size.toLong); buf.u32(logPos.toLong); buf.u16(0)
    buf.bytes(payload)
  }

  private def fdePayload(): Array[Byte] = {
    val b = new ByteBuf
    b.u16(4) // binlog_version
    val ver = "graft-mysql-8.0.0".getBytes("US-ASCII")
    b.bytes(ver); (ver.length until 50).foreach(_ => b.u8(0))
    b.u32(0L) // create_timestamp
    b.u8(HeaderLen)
    // post-header length per event type 1..38 (only the ones we emit
    // need to be right; the rest carry the standard values)
    val ph = Array.fill(38)(0)
    ph(QUERY_EVENT - 1) = 13; ph(XID_EVENT - 1) = 0
    ph(FORMAT_DESCRIPTION_EVENT - 1) = 84
    ph(TABLE_MAP_EVENT - 1) = 8
    ph(WRITE_ROWS_V2 - 1) = 10; ph(UPDATE_ROWS_V2 - 1) = 10
    ph(DELETE_ROWS_V2 - 1) = 10
    ph.foreach(b.u8)
    b.toBytes
  }

  private def queryPayload(db: String, sql: String): Array[Byte] = {
    val b = new ByteBuf
    b.u32(1L); b.u32(0L) // thread_id, exec_time
    val dbB = db.getBytes("UTF-8")
    b.u8(dbB.length); b.u16(0); b.u16(0) // db_len, error_code, status_len
    b.bytes(dbB); b.u8(0)
    b.bytes(sql.getBytes("UTF-8"))
    b.toBytes
  }

  private def tableMapPayload(): Array[Byte] = {
    val b = new ByteBuf
    b.u48(TableId); b.u16(1) // flags
    val db = "graft".getBytes("UTF-8"); b.u8(db.length); b.bytes(db); b.u8(0)
    val tbl = "events".getBytes("UTF-8"); b.u8(tbl.length); b.bytes(tbl); b.u8(0)
    b.packed(4)
    Seq(TYPE_LONGLONG, TYPE_LONGLONG, TYPE_DOUBLE, TYPE_VARCHAR).foreach(b.u8)
    b.packed(3) // metadata block length
    b.u8(8) // DOUBLE: pack_length
    b.u16(64) // VARCHAR: max byte length
    b.u8(0) // null bitmap: nothing nullable
    b.toBytes
  }

  private def rowImage(b: ByteBuf, eventId: Long, userId: Long,
      value: Double, eventType: String): Unit = {
    b.u8(0) // null bitmap for this image
    b.u64(eventId); b.u64(userId)
    b.u64(java.lang.Double.doubleToLongBits(value)) // 8 IEEE bytes... (LE)
    val s = eventType.getBytes("UTF-8")
    b.u8(s.length); b.bytes(s) // VARCHAR(64) < 256 → 1-byte length
  }

  private def rowsPayload(tpe: Int, eventId: Long, userId: Long,
      value: Double, eventType: String): Array[Byte] = {
    val b = new ByteBuf
    b.u48(TableId); b.u16(0); b.u16(2) // table_id, flags, extra_len (self)
    b.packed(4)
    b.u8(0x0f) // columns-present bitmap
    if (tpe == UPDATE_ROWS_V2) {
      b.u8(0x0f) // after-image bitmap
      rowImage(b, eventId, userId, 0.0, eventType) // before image
    }
    rowImage(b, eventId, userId, value, eventType) // the (after) image
    b.toBytes
  }

  /** Synthesize one shard's binlog from its (ordered) events. */
  private[graft] def synthesize(
      rows: Iterator[(Long, Long, Long, Double, String)]): Array[Byte] = {
    // rows: (event_id, user_id, ts_sec, value, event_type), log-ordered
    val buf = new ByteBuf
    buf.u8(0xfe); buf.bytes("bin".getBytes("US-ASCII")) // magic
    emit(buf, 0L, FORMAT_DESCRIPTION_EVENT, fdePayload())
    var curTxn = Long.MinValue
    def commit(): Unit = if (curTxn != Long.MinValue) {
      val b = new ByteBuf; b.u64(curTxn)
      emit(buf, 0L, XID_EVENT, b.toBytes)
    }
    rows.foreach { case (id, uid, tsSec, v, tpe) =>
      val txn = id / TxnW
      if (txn != curTxn) {
        commit()
        emit(buf, tsSec, QUERY_EVENT, queryPayload("graft", "BEGIN"))
        curTxn = txn
      }
      emit(buf, tsSec, TABLE_MAP_EVENT, tableMapPayload())
      val rowsType = tpe match {
        case "signup" => WRITE_ROWS_V2
        case "error" => DELETE_ROWS_V2
        case _ => UPDATE_ROWS_V2
      }
      emit(buf, tsSec, rowsType, rowsPayload(rowsType, id, uid, v, tpe))
    }
    commit()
    buf.toBytes
  }

  // ── parsing ──────────────────────────────────────────────────────

  private class Reader(bytes: Array[Byte], var pos: Int) {
    def remaining: Int = bytes.length - pos
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u24(): Int = u8() | (u8() << 8) | (u8() << 16)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def u48(): Long = u32() | (u16().toLong << 32)
    def u64(): Long = u32() | (u32() << 32)
    def skip(n: Int): Unit = pos += n
    def str(n: Int): String = {
      val s = new String(bytes, pos, n, "UTF-8"); pos += n; s
    }
    def packed(): Long = u8() match {
      case 0xfc => u16().toLong
      case 0xfd => u24().toLong
      case 0xfe => u64()
      case v => v.toLong
    }
  }

  /** Parse one shard. Returns (rows, resumePos, sawTruncatedTail):
    * rows only from COMMITTED transactions (the binlog contract — an
    * uncommitted tail replays after resume); resumePos = log_pos of
    * the last fully-parsed event, i.e. where a fetcher reconnects. */
  def parseShard(shard: Int, bytes: Array[Byte])
      : (Seq[BinlogRow], Long, Boolean) = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xfe &&
      bytes(1) == 'b' && bytes(2) == 'i' && bytes(3) == 'n',
      s"shard $shard: not a binlog (bad magic)")
    val out = Seq.newBuilder[BinlogRow]
    var tableCols: Array[(Int, Int)] = null // (type, meta) per column
    var pending = List.empty[BinlogRow] // current txn, awaiting XID
    var resume = 4L
    var truncated = false
    val r = new Reader(bytes, 4)
    var stop = false
    while (!stop && r.remaining > 0) {
      if (r.remaining < HeaderLen) { truncated = true; stop = true }
      else {
        val evStart = r.pos
        val tsSec = r.u32()
        val tpe = r.u8()
        r.u32() // server_id
        val size = r.u32()
        r.u32() // log_pos (next event)
        r.u16() // flags
        if (size < HeaderLen || evStart + size > bytes.length) {
          truncated = true; stop = true
        } else {
          val bodyEnd = evStart + size.toInt
          tpe match {
            case FORMAT_DESCRIPTION_EVENT =>
              val ver = r.u16()
              require(ver == 4, s"unsupported binlog version $ver")
              r.skip(50); r.u32()
              val hl = r.u8()
              require(hl == HeaderLen, s"unsupported header length $hl")
            case QUERY_EVENT => // BEGIN / DDL — no row payload
            case TABLE_MAP_EVENT =>
              r.u48(); r.u16()
              val dbLen = r.u8(); r.skip(dbLen + 1)
              val tblLen = r.u8(); r.skip(tblLen + 1)
              val nCols = r.packed().toInt
              val types = Array.fill(nCols)(r.u8())
              r.packed() // metadata length
              tableCols = types.map {
                case TYPE_LONGLONG => (TYPE_LONGLONG, 0)
                case TYPE_DOUBLE => (TYPE_DOUBLE, r.u8())
                case TYPE_VARCHAR => (TYPE_VARCHAR, r.u16())
                case t => sys.error(s"unhandled column type $t")
              }
            case t if t == WRITE_ROWS_V2 || t == UPDATE_ROWS_V2 ||
                t == DELETE_ROWS_V2 =>
              require(tableCols != null, "rows event before TABLE_MAP")
              r.u48(); r.u16()
              val extraLen = r.u16(); r.skip(extraLen - 2)
              val nCols = r.packed().toInt
              r.skip((nCols + 7) / 8) // columns-present
              if (t == UPDATE_ROWS_V2) r.skip((nCols + 7) / 8)
              def image(): (Long, Long, Double, String) = {
                r.skip((nCols + 7) / 8) // null bitmap (nothing nullable)
                val id = r.u64(); val uid = r.u64()
                val v = java.lang.Double.longBitsToDouble(r.u64())
                val len = if (tableCols(3)._2 < 256) r.u8() else r.u16()
                (id, uid, v, r.str(len))
              }
              if (t == UPDATE_ROWS_V2) image() // before image
              val (id, uid, v, et) = image()
              val op = t match {
                case WRITE_ROWS_V2 => "I"
                case DELETE_ROWS_V2 => "D"
                case _ => "U"
              }
              pending ::= BinlogRow(shard, evStart.toLong, tsSec, -1L,
                op, id, uid, v, et)
            case XID_EVENT =>
              val xid = r.u64()
              out ++= pending.reverseIterator.map(_.copy(xid = xid))
              pending = Nil
            case t => sys.error(s"unhandled event type $t")
          }
          require(r.pos <= bodyEnd, s"event type $tpe overran its size")
          r.pos = bodyEnd
          resume = bodyEnd.toLong
        }
      }
    }
    (out.result(), resume, truncated || pending.nonEmpty)
  }

  private val shardWritten =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Write the sharded binlog fixture once per (session, corpus) —
    * EXECUTOR-side: txn-ranged partitions (txns never straddle a
    * shard; a split transaction would be an unfaithful log) each
    * synthesize and write their own shard file. Shard count GROWS
    * with the log (~100k events per shard, floor 4, cap 256): a
    * binlog parses sequentially within a shard by nature, so
    * parallelism comes only from shard count — the r14-late soak
    * measured α 1.1–1.2 with 4 fixed shards at x64 (each shard 1.6M
    * rows on one task, and a single shard's byte array is the other
    * bound sharding keeps small). On a real deployment the shard
    * count is the number of source servers; this scaling stands in
    * for that fleet. */
  private[ops] def binlogFixtureDir(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    val root = Tables.fixtureRoot(s, d, "binlog")
    root.intern.synchronized {
      if (!shardWritten.contains(root) || !new java.io.File(root).exists()) {
        new java.io.File(root).mkdirs()
        import s.implicits._
        val nEvents = Tables.events(s, d).count()
        val nShards = math.min(256L, math.max(4L, nEvents / 100000L)).toInt
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            expr("unix_micros(ts) DIV 1000000").as("ts_sec"),
            col("value"), col("event_type"),
            expr(s"event_id DIV $TxnW").as("txn_id"))
          .repartitionByRange(nShards, col("txn_id"))
          .sortWithinPartitions("event_id")
          .as[(Long, Long, Long, Double, String, Long)]
          .foreachPartition { (it: Iterator[(Long, Long, Long, Double, String, Long)]) =>
            val rows = it.map { case (id, uid, ts, v, et, _) =>
              (id, uid, ts, v, et) }.toVector
            if (rows.nonEmpty) {
              val shard = (rows.head._1 / TxnW) % 1000000
              java.nio.file.Files.write(
                java.nio.file.Paths.get(root, f"shard_$shard%07d.binlog"),
                synthesize(rows.iterator))
            }
            ()
          }
        shardWritten.add(root)
        ()
      }
    }
    root
  }

  /** binaryFile scan over the shard dir → parallel per-shard parse. */
  def parseBinlogDir(s: org.apache.spark.sql.SparkSession,
      root: String): Dataset[BinlogRow] = {
    import s.implicits._
    s.read.format("binaryFile").option("pathGlobFilter", "*.binlog")
      .load(root)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (path, bytes) =>
          val shard = "shard_(\\d+)".r.findFirstMatchIn(path)
            .map(_.group(1).toInt).getOrElse(0)
          val (rows, _, truncated) = parseShard(shard, bytes)
          require(!truncated, s"$path: truncated mid-write")
          rows
        }
      }
  }

  override def ops: Seq[Op] = Seq(

    Op("cdc_binlog_roundtrip",
      // events → genuine binlog-v4 bytes (4 server shards, executor-
      // side) → binaryFile scan → REAL protocol parse (magic, FDE,
      // TABLE_MAP registry, row images, BEGIN…XID txn buffering) →
      // the events projection back out, under the hash gate: the
      // oracle reads the original parquet, so a single wrong byte —
      // endianness, a bitmap off by one, a packed-int boundary —
      // fails 10 000 rows loudly. xid is the committed transaction id
      // (== position DIV 16, the envelopeTxn grouping); value rides
      // as its 8 IEEE bytes (bit-exact, no rounding).
      (s, d) => {
        val root = binlogFixtureDir(s, d)
        parseBinlogDir(s, root).toDF()
          .select(col("event_id"), col("user_id"), col("op"), col("xid"),
            col("ts_sec"), col("value"), col("event_type"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
                CASE WHEN event_type = 'signup' THEN 'I'
                     WHEN event_type = 'error' THEN 'D'
                     ELSE 'U' END AS op,
                event_id // 16 AS xid,
                epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS ts_sec,
                value, event_type
              FROM events ORDER BY event_id"""))
  )
}
