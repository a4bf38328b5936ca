package graft

import graft.ops.PipelineOps
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Semantic pins for the training-data pipeline operators
  * (PII scrub, repetition filter, global shuffle, domain mix,
  * sequence packing, dedup clusters) — properties the DuckDB oracle
  * can't express: redaction actually redacts, packing respects the
  * budget, components are exactly transitive closures.
  */
class PipelineSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val r = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(r.passed, r.status.toString)
  }
  import spark.implicits._

  test("piiScrub redacts planted emails/ips/ids/phones and counts them") {
    val docs = Seq(
      (1L, "mail me at alice.smith+x@corp-mail.co.uk or bob@x.io today"),
      (2L, "server 192.168.0.1 and 10.255.3.77 are up"),
      (3L, "card 4111111111111111 ref 12345678901234567 ok"),
      (4L, "call 555-867-5309 or 020-7946-0958 now"),
      (5L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val out = PipelineOps.piiScrub(docs).orderBy("doc_id").collect()
    assert(out.map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSeq == Seq((2, 0, 0, 0), (0, 2, 0, 0), (0, 0, 2, 0),
        (0, 0, 0, 2), (0, 0, 0, 0)))
    // the digest is of the SCRUBBED text: recompute independently
    val clean = docs
      .withColumn("t", regexp_replace(col("text"),
        "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"))
      .withColumn("t", regexp_replace(col("t"),
        "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"))
      .withColumn("t", regexp_replace(col("t"), "\\b\\d{13,19}\\b", "<ID>"))
      .withColumn("t", regexp_replace(col("t"),
        "\\b\\d{3}-\\d{3,4}-\\d{4}\\b", "<PHONE>"))
      .orderBy("doc_id").select("t").as[String].collect()
    assert(clean(0) == "mail me at <EMAIL> or <EMAIL> today")
    assert(clean(1) == "server <IP> and <IP> are up")
    assert(clean(2) == "card <ID> ref <ID> ok")
    assert(clean(3) == "call <PHONE> or <PHONE> now")
    val digests = out.map(_.getString(5))
    val expected = clean.map(t => java.security.MessageDigest
      .getInstance("MD5").digest(t.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
    assert(digests.toSeq == expected.toSeq)
  }

  test("repetitionStats flags a degenerate doc and keeps a clean one") {
    val docs = Seq(
      (1L, Seq.fill(40)("spam ham").mkString(" ")), // one bigram dominates
      (2L, (1 to 60).map(i => s"w$i").mkString(" ")) // all tokens distinct
    ).toDF("doc_id", "text")
    val out = PipelineOps.repetitionStats(docs).orderBy("doc_id").collect()
    val bad = out(0); val good = out(1)
    assert(!bad.getBoolean(5) && good.getBoolean(5))
    assert(bad.getDouble(2) < 0.05)           // uniq_ratio ~ 2/80
    assert(bad.getDouble(3) > 0.49)           // top bigram ("ham spam" or
    assert(bad.getDouble(4) > 0.9)            //  "spam ham") covers half
    assert(good.getDouble(2) == 1.0 && good.getDouble(3) < 0.02)
  }

  test("shuffleGlobal is a permutation: shards partition, pos is dense") {
    val docs = Tables.documents(spark, sf001)
    val out = PipelineOps.shuffleGlobal(docs, nShards = 16)
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // pos is 1..n_shard within each shard, no gaps or dups
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"),
        countDistinct("pos").as("d"))
      .filter(col("n") =!= col("mx") || col("n") =!= col("d"))
    assert(bad.count() == 0)
    // deterministic: two runs agree exactly
    val again = PipelineOps.shuffleGlobal(docs, nShards = 16)
    assert(out.exceptAll(again).count() == 0)
  }

  test("domainMix hits the target mixture within quantization error") {
    val docs = Tables.documents(spark, sf01)
    val out = PipelineOps.domainMix(docs,
      Map("src0" -> 0.2, "src1" -> 0.1), defaultWeight = 0.7 / 18)
    val kept = out.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    // src0 is the binding domain (weight 4× its uniform share): kept whole
    assert(kept("src0") == 25)
    val total = kept.values.sum.toDouble
    // each share within ±40% relative of target (md5-bucket quantization
    // on 25-doc domains is coarse; the CONTRACT is determinism + cap math,
    // accuracy tightens with domain size)
    assert(math.abs(kept("src0") / total - 0.2) < 0.08)
    assert(math.abs(kept("src1") / total - 0.1) < 0.04)
  }

  test("packSequences: every doc exactly once, bins respect the budget") {
    val gen = Gen.listOfN(120,
      Gen.zip(Gen.choose(1L, 100000L), Gen.choose(1, 260)))
      .map(_.distinctBy(_._1))
    check(Prop.forAll(gen) { xs =>
      val docs = xs.map { case (id, n) => (id, Seq.fill(n)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val out = PipelineOps.packSequences(docs, cap = 200, nBuckets = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      val everyDocOnce = out.map(_._1).sorted.toSeq == xs.map(_._1).sorted
      // a bin exceeds cap only if it holds a single oversized doc
      val binsOk = out.groupBy(x => (x._2, x._4)).values.forall { b =>
        b.map(_._3).sum <= 200 || b.size == 1
      }
      // bins are dense 0..max per bucket (NB: `b` is an Array here —
      // convert before comparing, Array == Seq is reference equality)
      val dense = out.groupBy(_._2).values.forall { b =>
        val bins = b.map(_._4).distinct.sorted.toSeq
        bins == (0 to bins.max).toSeq
      }
      everyDocOnce && binsOk && dense
    })
  }

  test("dedupIncremental: clones match their source, novel docs pass, best wins") {
    val base = (1 to 20).map(i => s"tok$i")
    val corpus = Seq(
      (1L, base.mkString(" ")),
      (2L, (base :+ "x").mkString(" ")),           // near-identical to 1
      (3L, (1 to 20).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val batch = Seq(
      (100L, base.mkString(" ")),                  // exact dup of 1 AND near 2
      (101L, (1 to 20).map(i => s"q$i").mkString(" ")) // novel
    ).toDF("doc_id", "text")
    val out = PipelineOps.dedupIncremental(corpus, batch, tau = 0.6, shingleN = 3)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    // 100 matches both 1 (J=1.0) and 2; the best (highest J) is 1
    assert(out(0).getLong(0) == 100L && out(0).getLong(1) == 1L
      && out(0).getDouble(2) == 1.0 && out(0).getBoolean(3))
    assert(out(1).getLong(0) == 101L && out(1).isNullAt(1) && !out(1).getBoolean(3))
    // corpus docs never appear in the output
    assert(!out.exists(r => r.getLong(0) <= 3))
  }

  test("dedupIncrementalNear: clones match their source, corpus never self-pairs") {
    val docs = Tables.documents(spark, sf001).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val clones = corpus.filter(col("doc_id") % 7 === 1)
      .select((col("doc_id") + 7000000L).as("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 10 === 0).unionByName(clones)
    val out = PipelineOps.dedupIncrementalNear(corpus, batch).cache()
    // output is exactly one row per batch doc
    assert(out.count() == batch.count())
    assert(out.select("doc_id").distinct().count() == batch.count())
    // every exact clone is flagged with jaccard 1.0 against its source
    val flaggedClones = out.filter(col("doc_id") >= 7000000L)
    assert(flaggedClones.filter(!col("is_dup")).count() == 0)
    assert(flaggedClones.filter(col("jaccard") =!= 1.0).count() == 0)
    assert(flaggedClones.filter(
      col("dup_of") =!= col("doc_id") - 7000000L).count() == 0)
    // corpus ids never appear as output rows
    assert(out.join(corpus.select(col("doc_id")), "doc_id").count() == 0)
    out.unpersist()
  }

  test("dedupIncrementalAgainst materialized postings equals the from-text path") {
    val docs = Tables.documents(spark, sf001).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .unionByName(corpus.limit(3)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text")))
    val dir = tmpDir("postings")
    PipelineOps.writeCorpusPostings(corpus, dir, tau = 0.8, shingleN = 5)
    // bucketed layout exists on disk
    val buckets = new java.io.File(s"$dir/postings").listFiles()
      .map(_.getName).count(_.startsWith("bucket="))
    assert(buckets > 1, s"expected shingle-bucketed postings dirs, got $buckets")
    val direct = PipelineOps.dedupIncremental(corpus, batch, 0.8, 5)
      .orderBy("doc_id").collect().toSeq
    val viaDisk = PipelineOps.dedupIncrementalAgainst(spark, dir, batch)
      .orderBy("doc_id").collect().toSeq
    assert(viaDisk == direct)
    // the planted exact clones are all flagged against their source
    assert(viaDisk.count(r => r.getLong(0) >= 5000000L && r.getBoolean(3)) == 3)

    // the maintenance cycle: append batch-1's novel docs, then a
    // second batch containing a clone of one of them must be flagged
    // against the APPENDED doc — and the combined table must equal a
    // from-text run over the grown corpus
    val accepted = batch.join(
      viaDisk.filter(_.getBoolean(3)).map(_.getLong(0)).toDF("doc_id"),
      Seq("doc_id"), "left_anti")
    PipelineOps.appendCorpusPostings(accepted, dir)
    val novelId = accepted.agg(min("doc_id")).first().getLong(0)
    val batch2 = accepted.filter(col("doc_id") === novelId)
      .select((col("doc_id") + 6000000L).as("doc_id"), col("text"))
    val out2 = PipelineOps.dedupIncrementalAgainst(spark, dir, batch2)
      .collect()
    assert(out2.length == 1 && out2(0).getBoolean(3)
      && out2(0).getLong(1) == novelId, out2.mkString(","))
    val grown = PipelineOps.dedupIncremental(
      corpus.unionByName(accepted), batch2, 0.8, 5).collect()
    assert(out2.toSeq == grown.toSeq)
  }

  test("dedupClusters equals the transitive closure on a chain + island") {
    // docs: a≈b≈c (chain via shared text), d≈e, f alone
    val mk = (id: Long, words: Seq[String]) => (id, words.mkString(" "))
    val base = (1 to 12).map(i => s"tok$i")
    val docs = Seq(
      mk(1L, base),                      // 1~2 (11/13 shingles shared)
      mk(2L, base :+ "x"),               // 2~3
      mk(3L, base :+ "x" :+ "y"),
      mk(10L, (1 to 12).map(i => s"z$i")),
      mk(11L, (1 to 12).map(i => s"z$i") :+ "q"),
      mk(20L, (1 to 12).map(i => s"solo$i"))
    ).toDF("doc_id", "text")
    val out = PipelineOps.dedupClusters(docs, tau = 0.6, shingleN = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 1,2,3 one component rooted at 1 even though 1~3 may not be an edge
    assert(out.filter(_._1 <= 3).forall(x => x._2 == 1L && x._3 == 3L))
    assert(out.filter(x => x._1 >= 10 && x._1 < 20)
      .forall(x => x._2 == 10L && x._3 == 2L))
    // no edges for the singleton → not emitted
    assert(!out.exists(_._1 == 20L))
  }

  test("star contraction: 64-node path graph converges in <=8 rounds, equal clusters") {
    // the pathological case for label propagation (rounds = diameter =
    // 63 here, O(n) on a chain at 100 TB); the alternating large-star/
    // small-star fallback contracts it in O(log n) rounds
    val path = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = PipelineOps.starContract(
      path.unionByName(path.select(col("doc_b").as("doc_a"),
        col("doc_a").as("doc_b"))))
    info(s"star contraction rounds: $rounds")
    assert(rounds <= 8, s"expected <=8 rounds on a 64-node path, took $rounds")
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 64 && got.values.forall(_ == 0L),
      s"expected one component rooted at 0, got ${got.toSeq.sortBy(_._1).take(8)}...")

    // the public path: connectedComponents engages the fallback when
    // propagation is capped below the diameter and still produces the
    // exact min-label result
    val viaCc = PipelineOps.connectedComponents(path, propagationCap = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaCc == got, "fallback path diverged from direct star contraction")
    // two disjoint chains keep distinct roots
    val two = (0L until 15L).map(i => (i, i + 1)) ++
      (100L until 115L).map(i => (i, i + 1))
    val cc2 = PipelineOps.connectedComponents(
      two.toDF("doc_a", "doc_b"), propagationCap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cc2.filter(_._1 < 100).forall(_._2 == 0L))
    assert(cc2.filter(_._1 >= 100).forall(_._2 == 100L))
  }
}
