package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed() = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k$i", i.toLong)
  }.toDF("key", "v")

  private val dims = Seq(("hot", "H"), ("k901", "A"), ("k950", "B"))
    .toDF("key", "name")

  test("saltedJoin equals the plain join row-for-row") {
    val expected = skewed().join(dims, "key")
      .select("key", "v", "name").collect().toSet
    val got = Skew.saltedJoin(skewed(), dims, "key", salts = 8, saltBy = $"v")
      .select("key", "v", "name").collect().toSet
    assert(got == expected)
    assert(got.count(_.getString(0) == "hot") == 900)
  }

  test("salted aggregation equals plain aggregation") {
    val expected = skewed().groupBy($"key")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = Skew.saltedSumCount(skewed(), "key", "v", salts = 8, saltBy = $"v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("salt actually spreads the hot key across groups") {
    val partials = skewed()
      .withColumn("_salt", pmod(hash($"v"), lit(8)))
      .filter($"key" === "hot")
      .select("_salt").distinct().count()
    assert(partials > 4, s"hot key only reached $partials salt groups")
  }
}
