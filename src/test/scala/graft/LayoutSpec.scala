package graft

import graft.ops.LayoutOps
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Pins for the layout/statistics operators: the Z-value expression
  * against a bit-twiddling reference, the locality claim (Z-order
  * bounds BOTH dimensions per file; a linear sort bounds one), and
  * the end-to-end write path (real parquet files whose per-file
  * ranges a reader's pruning would consult).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def zRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue matches the bit-interleave reference on random inputs") {
    val gen = Gen.listOfN(50,
      Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)))
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(gen) { xs =>
        val out = xs.toDF("x", "y")
          .select(LayoutOps.zValue(col("x"), col("y"), 16).as("z"))
          .as[Long].collect()
        out.toSeq == xs.map { case (x, y) => zRef(x, y, 16) }
      })
    assert(r.passed, r.status.toString)
  }

  private def zRefN(ds: Seq[Long], bits: Int): Long = {
    var z = 0L
    val k = ds.length
    for (i <- 0 until bits; j <- 0 until k)
      z |= ((ds(j) >> i) & 1L) << (k * i + j)
    z
  }

  test("zValueN matches the k-dim interleave reference (3 dims)") {
    val gen = Gen.listOfN(50, Gen.listOfN(3, Gen.choose(0L, 65535L)))
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(gen) { xs =>
        val out = xs.map(l => (l(0), l(1), l(2))).toDF("a", "b", "c")
          .select(LayoutOps.zValueN(
            Seq(col("a"), col("b"), col("c")), 16).as("z"))
          .as[Long].collect()
        out.toSeq == xs.map(zRefN(_, 16))
      })
    assert(r.passed, r.status.toString)
    // and the 2-dim zValue IS zValueN at k=2 (same bit layout)
    assert(zRefN(Seq(5L, 9L), 16) == zRef(5L, 9L, 16))
  }

  test("hilbertStats walks a true Hilbert curve: bijective and Manhattan-1 adjacent") {
    // full 3-bit grid; quantization is the identity when the data
    // covers [0, 2^bits) exactly, and fileBits = 2·bits makes
    // file_id = the raw Hilbert index with one cell per group — so
    // the op's own output exposes the whole curve for the pin.
    val cells = for (x <- 0 until 8; y <- 0 until 8) yield (x.toLong, y.toLong)
    val out = LayoutOps.hilbertStats(cells.toDF("x", "y"), "x", "y",
        bits = 3, fileBits = 6)
      .orderBy("file_id")
      .select("file_id", "min_x", "min_y")
      .as[(Long, Long, Long)].collect()
    assert(out.length == 64)
    assert(out.map(_._1).toSeq == (0L until 64L), "indices must be 0..63 once each")
    out.sliding(2).foreach { case Array((_, x0, y0), (_, x1, y1)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"consecutive Hilbert cells must be grid neighbors: ($x0,$y0)->($x1,$y1)")
    }
  }

  test("3-dim zorder bounds ALL THREE dimensions per file") {
    // 64 files at fileBits=6 over a 48-bit key = the top 2 bits of
    // each of the three dims — a 4×4×4 grid, so every file's range on
    // EVERY dimension is ≈ span/4 (≤ span/2 with quantization slack)
    val li = Tables.lineitem(spark, sf01)
    val zs = LayoutOps.zorderStatsN(li,
      Seq("l_partkey", "l_suppkey", "l_orderkey")).collect()
    assert(zs.length == 64)
    Seq(2 -> 3, 4 -> 5, 6 -> 7).foreach { case (lo, hi) =>
      val span = zs.map(_.getLong(hi)).max - zs.map(_.getLong(lo)).min
      val avg = zs.map(r => r.getLong(hi) - r.getLong(lo)).sum.toDouble / zs.length
      assert(avg <= span / 2.0,
        s"dim at col $lo: avg width $avg vs span $span")
    }
  }

  test("zorder bounds BOTH dimensions per file; linear sort only one") {
    val li = Tables.lineitem(spark, sf01)
    val zs = LayoutOps.zorderStats(li, "l_partkey", "l_suppkey").collect()
    assert(zs.length == 64)
    def widthX(r: org.apache.spark.sql.Row) = r.getLong(3) - r.getLong(2)
    def widthY(r: org.apache.spark.sql.Row) = r.getLong(5) - r.getLong(4)
    val xSpan = zs.map(_.getLong(3)).max - zs.map(_.getLong(2)).min
    val ySpan = zs.map(_.getLong(5)).max - zs.map(_.getLong(4)).min
    val avgX = zs.map(widthX).sum.toDouble / zs.length
    val avgY = zs.map(widthY).sum.toDouble / zs.length
    // 64 files = an 8×8 grid over the two top-3-bit prefixes: each
    // file's range on EITHER dimension is ≈ span/8 (≤ span/4 with
    // generous slack for quantization boundaries)
    assert(avgX <= xSpan / 4.0, s"avg x-width $avgX vs span $xSpan")
    assert(avgY <= ySpan / 4.0, s"avg y-width $avgY vs span $ySpan")
    // the same 64-way split ordered by l_partkey alone leaves the
    // OTHER dimension unbounded per file (full span) — the thing
    // Z-order exists to fix
    val lin = li.select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
      .withColumn("file_id", ntile(64).over(
        org.apache.spark.sql.expressions.Window.orderBy("x")))
      .groupBy("file_id").agg(min("y").as("mny"), max("y").as("mxy"))
      .collect()
    val avgYLin = lin.map(r => r.getLong(2) - r.getLong(1)).sum.toDouble / lin.length
    assert(avgYLin > ySpan * 0.9, s"linear sort should leave y unbounded, got $avgYLin")
    assert(avgY < avgYLin / 2.0, "zorder must bound y far tighter than a linear sort")
  }

  test("histogram: constant column degenerates to one bin, not NaN") {
    val out = LayoutOps.histogram(
      Seq.fill(10)(7.5).toDF("v"), "v", nBins = 8).collect()
    assert(out.length == 1 && out(0).getLong(0) == 0L && out(0).getLong(1) == 10L)
  }

  test("compaction: tiny files coalesce to disjoint sorted ranges, no row lost") {
    val li = Tables.lineitem(spark, sf001)
    val srcDir = tmpDir("compact_src")
    li.repartition(64).write.mode("overwrite").parquet(srcDir) // 64 tiny files
    val dstDir = tmpDir("compact_dst")
    val (before, after, rows) =
      LayoutOps.compact(spark, srcDir, dstDir, "l_orderkey",
        targetRowsPerFile = 2000L)
    assert(before == 64 && after == 3 && rows == 6000L)
    val back = spark.read.parquet(dstDir)
    assert(back.count() == 6000L)
    // every compacted file owns a DISJOINT l_orderkey range — the
    // property that turns footer stats into file pruning
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("mn"), max("l_orderkey").as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == 3)
    ranges.sliding(2).foreach { case Array((_, mx1), (mn2, _)) =>
      assert(mx1 <= mn2, s"overlapping file ranges: $ranges")
    }
  }

  test("end-to-end: z-ordered parquet write yields files pruned on both dims") {
    val li = Tables.lineitem(spark, sf01)
    val dir = tmpDir("zorder")
    // quantize both dims to the full 16-bit range first (as
    // zorderStats does) so the interleave weights them equally
    val e = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).first()
    val (mnx, mxx, mny, mxy) =
      (e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3))
    val xq = expr(s"((l_partkey - $mnx) * 65536) DIV (${mxx - mnx + 1})")
    val yq = expr(s"((l_suppkey - $mny) * 65536) DIV (${mxy - mny + 1})")
    val z = LayoutOps.zValue(xq, yq, 16)
    // real write path: range-partition on z so each output file owns a
    // contiguous z-interval, sort within so row groups are ordered too
    li.select(col("l_partkey"), col("l_suppkey"), z.as("z"))
      .repartitionByRange(16, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("l_partkey"), col("l_suppkey"))
    val files = back.groupBy("f")
      .agg(min("l_partkey").as("mnx"), max("l_partkey").as("mxx"),
        min("l_suppkey").as("mny"), max("l_suppkey").as("mxy"))
      .collect()
    assert(files.length == 16)
    // a two-sided point-range predicate touches few files: count the
    // files whose [min,max] box intersects the query box — that is
    // precisely the footer-stats pruning a scan performs
    val hit = files.count { r =>
      !(r.getLong(2) < 3000 || r.getLong(1) > 4000) &&
        !(r.getLong(4) < 200 || r.getLong(3) > 300)
    }
    assert(hit <= 6, s"box query should touch few of 16 z-ordered files, hit $hit")
  }
}
