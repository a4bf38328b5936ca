package graft

import graft.ops.BinlogWire
import org.apache.spark.sql.functions._

/** The binlog-v4 wire layer: genuine-format synthesis, the real
  * parser's protocol walk, transaction buffering, and the
  * crash-resume contract. The deep gate is the `cdc_binlog_roundtrip`
  * DuckDB hash (a single wrong byte anywhere in the layout fails
  * 10 000 rows); these pin the protocol-level behaviors the oracle
  * can't see — positions, truncation, commit atomicity.
  */
class BinlogSpec extends SparkSpec {

  private def synthOne(n: Int = 40): Array[Byte] = {
    val rows = (0 until n).map { i =>
      (i.toLong, (i % 7).toLong, 1700000000L + i,
        i * 1.25 + 0.1, if (i % 16 == 0) "signup" else if (i % 16 == 5) "error" else "click")
    }
    BinlogWire.synthesize(rows.iterator)
  }

  test("binlog round-trip: parse(synthesize(events)) == the events projection") {
    val got = SparkEntry.queries("cdc_binlog_roundtrip")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getString(6))).toSeq
    val expect = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D").otherwise("U").as("op"),
        expr("event_id DIV 16").as("xid"),
        expr("unix_micros(ts) DIV 1000000").as("ts_sec"),
        col("value"), col("event_type"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getString(6))).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
    // doubles rode the wire bit-exactly (no tolerance needed above),
    // and all three ops appear
    assert(got.map(_._3).toSet == Set("I", "U", "D"))
  }

  test("binlog positions: log_pos is monotone and resume lands on an event boundary") {
    val bytes = synthOne()
    val (rows, resume, truncated) = BinlogWire.parseShard(0, bytes)
    assert(!truncated)
    assert(resume == bytes.length.toLong, "clean log resumes at EOF")
    val positions = rows.map(_.log_pos)
    assert(positions == positions.sorted)
    assert(positions.distinct.size == positions.size)
  }

  test("binlog truncation: a torn tail stops at the last complete event, uncommitted rows withheld") {
    val bytes = synthOne()
    val (full, _, _) = BinlogWire.parseShard(0, bytes)
    // cut mid-event: drop the last 5 bytes (the XID of the final txn
    // and part of whatever precedes it survives only partially)
    val (rows, resume, truncated) = BinlogWire.parseShard(0,
      bytes.take(bytes.length - 5))
    assert(truncated, "torn tail must be reported")
    assert(resume < bytes.length - 5 + 1)
    // every emitted row belongs to a COMMITTED txn: the final txn's
    // XID was cut, so its rows are withheld (replay-after-resume
    // territory, the at-least-once contract)
    val lastXid = full.map(_.xid).max
    assert(rows.nonEmpty && rows.forall(_.xid < lastXid))
    // and what WAS emitted is a strict prefix of the clean parse
    assert(rows == full.takeWhile(_.xid < lastXid))
  }

  test("binlog guards: bad magic and update before-images") {
    intercept[IllegalArgumentException] {
      BinlogWire.parseShard(0, "not a binlog at all".getBytes)
    }
    // UPDATE rows carry a before image on the wire: the parser walks
    // it (a mis-sized before image would desync every later field and
    // fail the round-trip test above); here just pin that an
    // update-heavy log parses and every U row's value survived
    val (rows, _, _) = BinlogWire.parseShard(0, synthOne())
    val us = rows.filter(_.op == "U")
    assert(us.nonEmpty)
    us.foreach(r => assert(r.value == r.event_id * 1.25 + 0.1))
  }
}
