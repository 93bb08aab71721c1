package graft.tools

import graft._
import org.apache.spark.sql.functions._
object ProbeQ124 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import spark.implicits._
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"PROBE $name rows=$n time=${(System.nanoTime - t0) / 1e9}%.2f")
    }
    val docs = Tables.documents(spark, dir)
    // warm
    docs.count()
    time("kernel_only") {
      docs.select($"doc_id",
        graft.expr.DedupKernel.featureBucketsCol(graft.ops.Dedup.normText($"text"), 1024).as("b"))
        .select(sum(size($"b"))).as[Long].head()
    }
    time("explode_agg_nojoin") {
      docs.select($"doc_id", explode(
          graft.expr.DedupKernel.featureBucketsCol(graft.ops.Dedup.normText($"text"), 1024)).as("bucket"))
        .withColumn("w", ((col("bucket") * 69069L + 12345L) % 2000001L) - 1000000L)
        .groupBy($"doc_id").agg(count(lit(1)).as("n"), sum($"w").as("sm"))
        .count()
    }
    time("full_with_join") {
      graft.ops.QualityModel.classifierScore(docs, "doc_id", "text").count()
    }
    time("full_with_join_again") {
      graft.ops.QualityModel.classifierScore(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
