package graft.sources

import graft.SparkSpecBase
import java.nio.file.Files

class SourcesSinksSpec extends SparkSpecBase {
  import spark.implicits._

  test("carReviews CSV projection (reference embeddings.rs:592-618)") {
    val dir = Files.createTempDirectory("graft_csv_")
    val csv = dir.resolve("reviews.csv")
    Files.writeString(csv,
      """idx,review_date,author_name,vehicle_title,review_title,review,rating
        |0,01/01/18,alice,2018 Tesla Model 3,nice,Great car overall,5
        |1,02/02/17,bob,2017 Tesla Model S,meh,Could be better,3
        |""".stripMargin)
    val df = Sources.carReviews(spark, csv.toString)
    val rows = df.select("document", "Year", "Rating")
      .as[(String, Long, Long)].collect().toSet
    assert(rows == Set(("Great car overall", 2018L, 5L), ("Could be better", 2017L, 3L)))
    val meta = df.filter($"Year" === 2018)
      .select("metadata").as[Seq[String]].head()
    assert(meta == Seq("""{"Year": 2018}""", """{"Rating": 5}"""))
  }

  test("partitioned parquet write produces prunable layout") {
    val df = Seq((1L, "en", "a"), (2L, "fr", "b"), (3L, "en", "c"))
      .toDF("id", "lang", "text")
    val out = Files.createTempDirectory("graft_part_").toString + "/docs"
    Sinks.partitionedParquet(df, out, Seq("lang"))
    assert(new java.io.File(s"$out/lang=en").exists())
    val back = spark.read.parquet(out).filter($"lang" === "en")
    assert(back.count() == 2)
    // partition filter must prune, not scan-and-filter
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("lang=fr"))
  }

  test("bucketed tables join without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (0L until 1000L).map(i => (i % 97, i)).toDF("k", "v")
      val dims = (0L until 97L).map(i => (i, s"name$i")).toDF("k", "name")
      Sinks.bucketedTable(facts, "graft_facts_b", "k", 8)
      Sinks.bucketedTable(dims, "graft_dims_b", "k", 8)
      val joined = spark.table("graft_facts_b")
        .join(spark.table("graft_dims_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }
}
