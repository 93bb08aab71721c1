package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  /** Reference Morton interleave, bit by bit. */
  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue2 matches the reference interleave on random coordinates") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zValue2($"x", $"y", bits = 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == zRef(x, y, 16), s"($x, $y)") }
  }

  test("zValue2 is a bijection on the bounded grid") {
    val n = 64 // 6 bits x 6 bits
    val all = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
    val zs = all.toDF("x", "y")
      .select(Layout.zValue2($"x", $"y", bits = 6).as("z"))
      .as[Long].collect()
    assert(zs.distinct.length == n * n)
    assert(zs.min == 0L && zs.max == (n * n - 1).toLong)
  }

  test("zValue2 rejects out-of-range bit widths") {
    intercept[IllegalArgumentException](Layout.zValue2($"x", $"y", bits = 0))
    intercept[IllegalArgumentException](Layout.zValue2($"x", $"y", bits = 32))
  }

  test("zorderWrite clusters BOTH dimensions; single-column sort only one") {
    // uniform 128x128 grid; 16 files. A z-ordered layout gives every file
    // a compact envelope in x AND y, so a predicate on either column can
    // skip most files via parquet min/max stats. An x-sorted layout leaves
    // the y envelope at full width in every file.
    val grid = (0 until 128).flatMap(x => (0 until 128).map(y => (x.toLong, y.toLong)))
    val df = grid.toDF("x", "y").repartition(8)

    def fileEnvelopes(path: String): Seq[(Long, Long, Long, Long)] = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.toString).toSeq
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min($"x"), max($"x"), min($"y"), max($"y"))
          .as[(Long, Long, Long, Long)].head()
        r
      }
    }

    // a file can be skipped for a predicate iff its min/max envelope
    // misses the predicate's range — exactly parquet stats pruning
    def overlapping(env: Seq[(Long, Long, Long, Long)],
        xr: Option[(Long, Long)], yr: Option[(Long, Long)]): Int =
      env.count { case (x0, x1, y0, y1) =>
        xr.forall { case (a, b) => x1 >= a && x0 <= b } &&
          yr.forall { case (a, b) => y1 >= a && y0 <= b }
      }

    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Layout.zorderWrite(df, $"x", $"y", bits = 7, zDir, numFiles = 16)
    val zEnv = fileEnvelopes(zDir)
    assert(zEnv.size == 16)

    val xDir = java.nio.file.Files.createTempDirectory("graft_xsort").toString
    df.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(xDir)
    val xEnv = fileEnvelopes(xDir)

    // predicate on x: both layouts skip most files (bounds are sampled by
    // repartitionByRange, so allow straddling-file slack)
    assert(overlapping(zEnv, Some((0L, 15L)), None) <= 8)
    assert(overlapping(xEnv, Some((0L, 15L)), None) <= 8)
    // predicate on y: the z-order layout still skips most files; the
    // x-sorted layout reads ALL of them (full-width y envelopes)
    assert(overlapping(zEnv, None, Some((0L, 15L))) <= 8,
      s"z-order should prune on y too: $zEnv")
    assert(overlapping(xEnv, None, Some((0L, 15L))) == 16,
      s"x-sort cannot prune on y: $xEnv")
  }
}

/** r16: the parallelism floor used by flops-bound broadcast products
  * (q280 hubness). Row-content no-op; partition count only ever rises. */
class LayoutSpreadSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._

  test("spread raises a narrow frame to default parallelism, rows identical") {
    import spark.implicits._
    val df = (1 to 97).toDF("v").coalesce(1)
    assert(df.rdd.getNumPartitions == 1)
    val out = Layout.spread(df)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(out.select(sum($"v")).head.getLong(0) == (1 to 97).sum.toLong)
    assert(out.count() == 97L)
  }

  test("spread is the identity when the source already has enough splits") {
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    val df = (1 to 100).toDF("v").repartition(p + 3)
    val out = Layout.spread(df)
    assert(out.rdd.getNumPartitions == p + 3) // untouched — no extra exchange
  }
}
