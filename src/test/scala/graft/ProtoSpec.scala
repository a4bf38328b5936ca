package graft

import graft.ops.{AvroWire, ProtoWire}
import org.apache.spark.sql.functions._

/** Conformance pins for the hand-rolled protobuf wire codec
  * (ops/ProtoWire.scala). The DuckDB hash gate already proves
  * decode∘encode is the identity over the whole envelope corpus;
  * these tests pin the byte-level contract against the PUBLISHED
  * encoding (developers.google.com/protocol-buffers/docs/encoding) —
  * golden bytes derivable by hand from the spec — so the codec is
  * checked against protobuf, not merely against its own reader.
  */
class ProtoSpec extends SparkSpec {

  private def rec(position: Long = 0L, pk: Long = 0L, tsUs: Long = 0L,
      op: String = "", txnId: Long = 0L, txnSeq: Long = 0L,
      before: Option[Double] = None, after: Option[Double] = None,
      ddl: Option[String] = None) =
    AvroWire.EnvRecord(position, pk, tsUs, op, txnId, txnSeq,
      before, after, ddl)

  test("golden bytes: tags, varints, fixed64 little-endian, frame length") {
    // hand-derived from the spec:
    //   1:varint=1 → 08 01 ; 2:varint=2 → 10 02 ; 3:varint=3 → 18 03
    //   4:string "I" → tag (4<<3)|2 = 22, len 01, 'I' = 49
    //   5:varint=4 → 28 04 ; 6:varint=5 → 30 05
    //   8:double 1.5 → tag (8<<3)|1 = 41, bits 0x3FF8000000000000 LE
    //   frame = varint body length (0x16 = 22) + body
    val bytes = ProtoWire.encodeOne(rec(position = 1, pk = 2, tsUs = 3,
      op = "I", txnId = 4, txnSeq = 5, after = Some(1.5)))
    val expect = Array(
      0x16,
      0x08, 0x01, 0x10, 0x02, 0x18, 0x03,
      0x22, 0x01, 0x49,
      0x28, 0x04, 0x30, 0x05,
      0x41, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0xf8, 0x3f
    ).map(_.toByte)
    assert(bytes.toSeq == expect.toSeq,
      s"golden mismatch: ${bytes.map(b => f"${b & 0xff}%02x").mkString(" ")}")
  }

  test("golden bytes: proto3 zero/empty singulars are skipped; multi-byte varint") {
    // all-default record → empty body, frame = just the 0 length byte
    assert(ProtoWire.encodeOne(rec()).toSeq == Seq(0x00.toByte))
    // 300 = 0b10_0101100 → AC 02 (low 7 bits first, msb = continue)
    val b300 = ProtoWire.encodeOne(rec(position = 300))
    assert(b300.toSeq == Seq(0x03, 0x08, 0xac.toByte, 0x02).map(_.toByte))
    // Long.MaxValue → 9-byte varint (63 bits / 7 per byte)
    val bMax = ProtoWire.encodeOne(rec(position = Long.MaxValue))
    assert(bMax.length == 1 + 1 + 9)
    assert(bMax.drop(2).dropRight(1).forall(b => (b & 0x80) != 0))
    assert((bMax.last & 0x80) == 0)
  }

  test("round trip: edge shapes incl. zero-valued optionals vs absent fields") {
    import spark.implicits._
    val in = Seq(
      rec(),                                             // all defaults
      rec(position = 1, op = "I", after = Some(0.0)),    // present 0.0 ≠ absent
      rec(position = 2, op = "U", before = Some(-1.25),
        after = Some(Double.MaxValue), txnSeq = 300),
      rec(position = 3, op = "DDL", ddl = Some("ALTER TABLE t ADD x"),
        txnId = Long.MaxValue),
      rec(position = 4, op = "D", before = Some(0.0), tsUs = 1L << 40))
    val out = ProtoWire.fromProtoBytes(ProtoWire.toProtoBytes(in.toDS()))
      .collect().sortBy(_.position)
    assert(out.toSeq == in.sortBy(_.position))
    // the Some(0.0) survives as PRESENT — field presence, not value,
    // carries nullability (the reason the optionals aren't proto3
    // singulars)
    assert(out(1).after_value.contains(0.0) && out(1).before_value.isEmpty)
  }

  test("evolution: old writer's txn_seq skipped as unknown, source defaulted") {
    import spark.implicits._
    val in = Seq(rec(position = 7, pk = 1, op = "U", txnSeq = 999,
      after = Some(2.5)))
    val v2 = ProtoWire.fromProtoBytesEvolved(ProtoWire.toProtoBytes(in.toDS()))
      .collect()
    assert(v2.length == 1)
    assert(v2(0).position == 7 && v2(0).after_value.contains(2.5))
    assert(v2(0).source == "binlog") // absent on v1 wire → default
    // and a FUTURE writer's field 10 is honored by the evolved reader
    // while the V1 reader skips it: splice a source field onto the
    // wire by hand (tag (10<<3)|2 = 52, len, bytes) and re-frame
    val framed = ProtoWire.encodeOne(in.head)
    val bodyLen = framed(0).toInt // < 128 here
    val srcBytes = "mysql".getBytes("UTF-8")
    val spliced = (Array((bodyLen + 2 + srcBytes.length).toByte) ++
      framed.drop(1) ++ Array(0x52.toByte, srcBytes.length.toByte) ++
      srcBytes)
    val wdf = Seq((7L, spliced)).toDF("position", "wire")
    val v2b = ProtoWire.fromProtoBytesEvolved(wdf).collect()
    assert(v2b(0).source == "mysql")
    val v1b = ProtoWire.fromProtoBytes(wdf).collect()
    assert(v1b(0) == in.head) // unknown field 10 skipped cleanly
  }
}
