package graft

/** Smoke main: replicates the driver's t1 check (entry() rows > 0 at
  * sf0.001) plus a few library error-path probes. Run:
  *   sbt "runMain graft.Smoke"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val rows = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$rows")
    require(rows > 0, "entry() must return rows > 0")
    // error-path probes: typed errors, not silent mis-parses
    def expectThrow(label: String)(f: => Any): Unit =
      try { f; println(s"$label=NO_ERROR (BUG)") }
      catch { case e: Throwable => println(s"$label=${e.getMessage.take(70)}") }
    expectThrow("PROBE_UNKNOWN_OP")(expr.MetaFilter.parse("""{"Year": {"like": 2017}}"""))
    expectThrow("PROBE_MALFORMED")(expr.MetaFilter.parse("not json"))
    println("PROBE_IN=" + expr.MetaFilter.parse("""{"lang": {"in": ["en","fr"]}}"""))
    // drive the centroid aggregator + streaming ingest through public API
    import org.apache.spark.sql.functions.udaf
    import spark.implicits._
    val centroid = udaf(new expr.CentroidAggregator(4))
    val c = Seq((0, Array(1f, 2f, 3f, 4f)), (0, Array(3f, 2f, 1f, 0f)))
      .toDF("label", "embedding").groupBy($"label")
      .agg(centroid($"embedding").as("c")).head()
      .getAs[scala.collection.Seq[Float]]("c")
    println(s"PROBE_CENTROID=$c")
    require(c == Seq(2f, 2f, 2f, 2f))
    val wh = java.nio.file.Files.createTempDirectory("graft_smoke_wh_").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_smoke_ck_").toString
    val emb = embed.HashEmbedder(dim = 16)
    val coll = core.Collection.create(spark, wh, "smoke_ingest",
      Seq(("id0", "seed doc", Seq.empty[String])).toDF("id", "document", "metadata"), emb)
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String, Seq[String])]
    val q = streaming.CollectionIngest.appendStream(
      coll, mem.toDF().toDF("id", "document", "metadata"), emb, ck)
    mem.addData(("id1", "streamed doc", Seq.empty[String]))
    q.processAllAvailable(); q.stop()
    println(s"PROBE_INGEST_ROWS=${coll.df.count()}")
    require(coll.df.count() == 2)
    spark.stop()
  }
}
