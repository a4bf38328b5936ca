package graft.ops

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.functions._

/** JSON wire twin of the CDC envelope, beside the Avro ([[AvroWire]])
  * and protobuf ([[ProtoWire]]) twins — JSON is the wire format
  * database-event broadcast systems in the meepo family actually ship
  * first (human-readable, schema-registry-free, the default of every
  * MQ console), and the one Spark can run END-TO-END in codegen:
  * `to_json`/`from_json` are Catalyst expressions, so unlike the
  * Avro/proto codecs there is no `mapPartitions` boundary — the whole
  * encode∘decode round trip stays inside one whole-stage-codegen'd
  * projection over the corpus scan (the "functions, not UDFs"
  * preference order applied to serde).
  *
  * Determinism: Jackson writes longs as exact decimal integers and
  * doubles in shortest-round-trip form, and both directions of the
  * trip run inside the SAME engine (the oracle compares the decoded
  * OUTPUT, not the wire text), so decode∘encode is the identity on
  * every field including nullable doubles — which lets both queries
  * share `cdc_envelope_full`'s DuckDB oracle verbatim, exactly like
  * the other two wire twins.
  *
  * Evolution semantics (cdc_envelope_json_evolve) — JSON's untyped
  * resolution rules, both directions at once:
  *   - writer-ahead (forward): the v2 writer appends a `shard` field
  *     and still carries `txn_seq`; the evolved reader's schema names
  *     neither, and `from_json` SKIPS unknown keys — a consumer never
  *     breaks on a producer upgrade.
  *   - reader-ahead (backward): the evolved reader declares `source`,
  *     absent from the wire; `from_json` yields NULL for missing
  *     fields and the consumer applies the reader-side default
  *     (`coalesce`) — the Avro default-value rule, spelled explicitly
  *     because JSON has no schema to carry it.
  *
  * At 100 TB: one narrow codegen pass per direction, no shuffle, no
  * state — the cheapest of the three wire twins by construction.
  */
object JsonWire extends OpModule {

  /** Reader schema (DDL form) of the v1 envelope — field-for-field
    * the Avro [[AvroWire.EnvelopeSchemaJson]]. */
  private val ReaderSchemaV1 =
    "position BIGINT, pk BIGINT, ts_us BIGINT, op STRING, " +
      "txn_id BIGINT, txn_seq BIGINT, before_value DOUBLE, " +
      "after_value DOUBLE, ddl_stmt STRING"

  /** Evolved reader: txn_seq dropped (writer-only fields skip),
    * `source` added (reader-only field, defaulted after decode). */
  private val ReaderSchemaV2 =
    "position BIGINT, pk BIGINT, ts_us BIGINT, op STRING, " +
      "txn_id BIGINT, before_value DOUBLE, after_value DOUBLE, " +
      "ddl_stmt STRING, source STRING"

  override def ops: Seq[Op] = Seq(

    Op("cdc_envelope_json",
      // envelope → JSON text → envelope: the readable wire format
      // under the hash gate. Oracle = cdc_envelope_full's SQL
      // verbatim — hash equality proves decode∘encode is the identity
      // on every field (nullable doubles and strings included).
      (s, d) => {
        val flat = AvroWire.flatEnvelope(Tables.events(s, d)).toDF()
        val wire = flat.select(
          to_json(struct(flat.columns.map(col): _*)).as("wire"))
        wire.select(from_json(col("wire"), ReaderSchemaV1,
            Map.empty[String, String]).as("r"))
          .select(col("r.*"))
          .orderBy("position")
      },
      Some(AvroWire.EnvelopeOracleSql)),

    Op("cdc_envelope_json_evolve",
      // v2 WRITER bytes (extra `shard` field) read through the
      // EVOLVED reader schema (txn_seq dropped, `source` defaulted):
      // both JSON resolution directions in one query — unknown keys
      // skipped, missing keys null-then-defaulted. Shares the evolved
      // envelope oracle with the Avro and proto twins.
      (s, d) => {
        val flat = AvroWire.flatEnvelope(Tables.events(s, d)).toDF()
        val v2cols = flat.columns.map(col) :+ (col("pk") % 4).as("shard")
        val wire = flat.select(to_json(struct(v2cols: _*)).as("wire"))
        wire.select(from_json(col("wire"), ReaderSchemaV2,
            Map.empty[String, String]).as("r"))
          .select(col("r.*"))
          .withColumn("source", coalesce(col("source"), lit("binlog")))
          .orderBy("position")
      },
      Some(AvroWire.EnvelopeEvolveOracleSql)))
}
