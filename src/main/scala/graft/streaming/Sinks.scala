package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}

/** Sink abstraction for the fan-out layer (VERDICT r3 next-round #7):
  * meepo broadcasts one change feed to N heterogeneous consumers; this
  * trait is the per-consumer contract.
  *
  * Delivery contract: the engine (foreachBatch) delivers each
  * micro-batch AT LEAST once per sink — a crash between sinks or
  * before the checkpoint commit redelivers the same (batch, batchId)
  * on restart. An implementation must therefore be IDEMPOTENT PER
  * batchId: writing the same batch twice must leave the same state as
  * writing it once. SinkContractSpec pins this property for every
  * bundled implementation; a new sink earns its place by passing the
  * same contract test.
  *
  * 100 TB notes: `write` runs on the driver but must only issue
  * distributed actions (df.write…) — never collect the batch. The one
  * exception, [[MemorySink]], is a test double and says so.
  */
trait Sink extends Serializable {
  def name: String

  /** Write one micro-batch. MUST be idempotent per batchId. */
  def write(batch: DataFrame, batchId: Long): Unit
}

/** Parquet directory sink: batchId-keyed subdirectory, full overwrite
  * on redelivery — idempotence by path. The layout doubles as a replay
  * log (`root/batch_N` in commit order). */
class ParquetDirSink(root: String) extends Sink {
  override def name: String = s"parquet:$root"
  override def write(batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$root/batch_$batchId")
}

/** TEST DOUBLE: collects each batch to driver memory, keyed by
  * batchId so redelivery replaces rather than appends. Never use at
  * scale — it materializes the batch on the driver by design. */
class MemorySink(override val name: String) extends Sink {
  val batches = scala.collection.concurrent.TrieMap[Long, Seq[Row]]()
  override def write(batch: DataFrame, batchId: Long): Unit =
    batches.put(batchId, batch.collect().toSeq)
}

/** The Kafka shape (compile-checked; the kafka connector jar and any
  * broker are unavailable in this offline environment, so it is not
  * registered or tested here). Idempotence per batchId cannot come
  * from overwrite on an append-only log; production options, in
  * preference order:
  *
  *  1. transactional producer: `kafka.transactional.id` derived from
  *     (sink name, batchId); redelivery aborts the duplicate epoch —
  *     exactly-once within Kafka's transaction guarantees;
  *  2. consumer-side dedup: embed (batchId, partitionId, rowIndex) in
  *     each record key; downstream compaction or consumers drop
  *     duplicates — at-least-once transport, effectively-once state;
  *  3. accept at-least-once where the payload is naturally idempotent
  *     (upserts keyed by pk).
  *
  * The write body is the standard Spark batch-to-Kafka path: project
  * to (key, value) and `format("kafka")`.
  */
class KafkaShapeSink(bootstrapServers: String, topic: String) extends Sink {
  override def name: String = s"kafka:$topic"
  override def write(batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    batch
      .select(to_json(struct(col("*"))).as("value"),
        concat_ws(":", lit(batchId), monotonically_increasing_id()).as("key"))
      .write
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()
  }
}
