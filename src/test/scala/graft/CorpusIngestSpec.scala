package graft

import graft.streaming.CorpusIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch↔stream equivalence for the streaming corpus ingest: the
  * accepted-document SET must be identical whether the batch arrives
  * as one frame or dribbles in file-sized micro-batches, in-stream
  * duplicates must collapse across micro-batch boundaries (keyed
  * state), and corpus collisions must never pass the anti join.
  */
class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest equals batch ingest; state dedups across micro-batches") {
    val docs = Tables.documents(spark, sf001).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val hashes = CorpusIngest.corpusHashes(corpus)

    // incoming: novel docs, a clone of a corpus doc (anti-join drop),
    // an in-stream dup pair SPLIT ACROSS FILES (state must collapse
    // it), and a degenerate doc (quality drop)
    val novel = docs.filter(col("doc_id") % 10 === 0)
    val corpusClone = corpus.limit(1)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    val dupText = (1 to 30).map(i => s"fresh$i").mkString(" ")
    val degenText = Seq.fill(50)("spam").mkString(" ")
    val fileA = novel.unionByName(
      Seq((3000001L, dupText), (3000003L, degenText)).toDF("doc_id", "text"))
    val fileB = corpusClone.unionByName(
      Seq((3000002L, dupText)).toDF("doc_id", "text"))

    val dir = tmpDir("ingest")
    fileA.coalesce(1).write.parquet(s"$dir/in/a")
    fileB.coalesce(1).write.parquet(s"$dir/in/b")

    // batch reference over the union
    val all = spark.read.parquet(s"$dir/in/a", s"$dir/in/b")
    val batchAccepted = CorpusIngest.ingest(all, hashes)
    val batchHashes = batchAccepted.select("h").as[String].collect().toSet

    // stream: one file per trigger so the dup pair spans micro-batches
    val stream = spark.readStream
      .schema(all.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in/*")
    val out = CorpusIngest.ingest(stream, hashes)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("t_ingest").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_ingest")
    val streamedHashes = streamed.select("h").as[String].collect().toSet

    assert(streamedHashes == batchHashes)
    assert(streamed.count() == streamed.select("h").distinct().count())
    // exactly one of the dup pair survived, the clone and degen none
    def hOf(df: DataFrame) = graft.ops.PipelineOps.contentSignals(df)
      .select("h").as[String].collect().toSet
    val dupH = hOf(Seq((0L, dupText)).toDF("doc_id", "text"))
    val degenH = hOf(Seq((0L, degenText)).toDF("doc_id", "text"))
    val cloneH = hOf(corpusClone)
    assert(dupH.subsetOf(streamedHashes))
    assert(streamed.filter(col("h").isin(dupH.toSeq: _*)).count() == 1)
    assert(degenH.intersect(streamedHashes).isEmpty)
    assert(cloneH.intersect(streamedHashes).isEmpty)
    // and the novel set is actually non-trivial
    assert(streamed.count() >= novel.count())
  }

  test("ingestBounded: dups inside the watermark collapse, state evicts beyond it") {
    val dupText = (1 to 25).map(i => s"bounded$i").mkString(" ")
    val lateText = (1 to 25).map(i => s"evicted$i").mkString(" ")
    // base well above epoch: a streaming query's initial watermark is
    // 0, and rows AT the watermark count as late — epoch-0 event
    // times would be dropped in the very first batch
    def ts(min: Int) = new java.sql.Timestamp(1577836800000L + min * 60000L)
    // file A: the dup pair at t=0/t=1 (inside the 10-min watermark)
    // and the first copy of the far-apart repeat at t=0
    val fileA = Seq((1L, dupText, ts(0)), (2L, dupText, ts(1)),
      (3L, lateText, ts(0))).toDF("doc_id", "text", "ts")
    // file B advances the watermark to ~50min; file C runs one more
    // batch at that watermark (eviction of expired keys happens at
    // batch END, after the in-batch dedup check); file D then replays
    // lateText — its hash state is gone
    val fileB = Seq((4L, (1 to 25).map(i => s"adv$i").mkString(" "), ts(60)))
      .toDF("doc_id", "text", "ts")
    val fileC = Seq((6L, (1 to 25).map(i => s"mid$i").mkString(" "), ts(61)))
      .toDF("doc_id", "text", "ts")
    val fileD = Seq((5L, lateText, ts(61))).toDF("doc_id", "text", "ts")
    val dir = tmpDir("bounded")
    // the file source orders batches by modification time: force
    // distinct mtimes so a → b → c → d is the actual replay order
    for ((f, n) <- Seq(fileA -> "a", fileB -> "b", fileC -> "c", fileD -> "d")) {
      f.coalesce(1).write.parquet(s"$dir/in/$n")
      Thread.sleep(1100)
    }
    val emptyCorpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val stream = spark.readStream.schema(fileA.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in/*")
    val out = graft.streaming.CorpusIngest.ingestBounded(
      stream, graft.streaming.CorpusIngest.corpusHashes(emptyCorpus),
      delay = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("t_bounded").start()
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("t_bounded").select("doc_id").as[Long]
      .collect().toSet
    // in-watermark dup collapsed to one of {1,2}; state eviction let
    // BOTH copies of lateText through (3 then 5) — the documented
    // trade; the corpus anti join is the long-term memory
    assert(ids.intersect(Set(1L, 2L)).size == 1, s"got $ids")
    assert(Set(3L, 4L, 5L, 6L).subsetOf(ids), s"got $ids")
  }
}
