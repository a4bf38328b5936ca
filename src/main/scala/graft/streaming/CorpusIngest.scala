package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus ingest — the training-data funnel as a CONTINUOUS
  * pipeline, bridging the engine's streaming side (state-backed dedup,
  * stream-static joins) and its LLM-pipeline side (content hashing,
  * quality signals). An incoming document stream is:
  *
  *  1. quality-gated by the codegen'd top-bigram-run projection
  *     ([[graft.ops.PipelineOps.contentSignals]] — pure per-row
  *     columns, so the identical logic runs under `read` and
  *     `readStream`);
  *  2. exact-deduped WITHIN the stream by content hash
  *     (`dropDuplicates("h")` — keyed state, so re-deliveries and
  *     cross-micro-batch repeats collapse);
  *  3. deduped AGAINST the already-ingested corpus by a stream-static
  *     LEFT ANTI join on the corpus hash table.
  *
  * Every step is per-row or per-key state — no global barrier — so
  * the query runs unchanged at any scale: the hash state shards by
  * key, and the static corpus side is an ordinary table the planner
  * may broadcast (or, at 100 TB, a bucketed hash table the anti join
  * co-locates with). Batch↔stream equivalence is pinned in
  * CorpusIngestSpec.
  */
object CorpusIngest {

  /** Accepted documents: quality-pass AND novel (in-stream + vs
    * corpus). `docs` may be a streaming or batch frame of
    * (doc_id, text); `corpusHashes` is a static (h) table.
    */
  def ingest(docs: DataFrame, corpusHashes: DataFrame,
      maxTopBigramFrac: Double = 0.5): DataFrame =
    graft.ops.PipelineOps.contentSignals(docs)
      .filter(col("tbf") <= maxTopBigramFrac)
      .dropDuplicates("h")
      .join(corpusHashes.select(col("h")), Seq("h"), "left_anti")
      .select("doc_id", "h", "bucket")

  /** The corpus-hash side of [[ingest]]: one row per distinct content
    * hash already ingested. */
  def corpusHashes(corpus: DataFrame): DataFrame =
    graft.ops.PipelineOps.contentSignals(corpus).select("h").distinct()

  /** [[ingest]] with BOUNDED dedup state for an indefinitely-running
    * query: `dropDuplicatesWithinWatermark` keeps a content hash in
    * state only while it can still collide within the watermark
    * window, then evicts it. The trade is explicit and standard:
    * re-deliveries inside the lateness bound collapse exactly;
    * repeats arriving further apart than the watermark may pass
    * in-stream dedup — and are then caught by the corpus anti join
    * once the earlier copy is folded into the corpus hash table
    * (which is the long-term memory; keyed state is only the
    * short-term buffer). `docs` must carry an event-time `ts`.
    */
  def ingestBounded(docs: DataFrame, corpusHashes: DataFrame,
      delay: String = "10 minutes",
      maxTopBigramFrac: Double = 0.5): DataFrame =
    graft.ops.PipelineOps.contentSignals(docs, passthrough = Seq("ts"))
      .filter(col("tbf") <= maxTopBigramFrac)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("h")
      .join(corpusHashes.select(col("h")), Seq("h"), "left_anti")
      .select("doc_id", "h", "bucket", "ts")
}
