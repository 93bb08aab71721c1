package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Dev probe: where does q98/q109 time go? Counts Spark jobs and times
  * each phase of the ExactRank path at a given SF dir. Not part of the
  * driver contract. */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    import spark.implicits._

    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)

    def phase[T](name: String)(f: => T): T = {
      val j0 = jobs
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $name%-28s ${dt}%8.3f s   jobs=${jobs - j0}")
      r
    }

    // warm-up whole query once
    graft.RelationalQueries.winsorizedStats(spark, sfDir).count()

    println("=== q98 phases (steady state) ===")
    val dec2c = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", (dec2c($"l_extendedprice") * 100).cast("long").as("c"))
    phase("parquet scan count")(li.count())
    li.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    phase("cache build (count)")(li.count())
    phase("cached count")(li.count())
    phase("radix agg alone (cached)") {
      li.withColumn("radix_m",
          when($"c" >= 0, $"c").otherwise(-($"c" + 1)))
        .withColumn("radix_k", length(bin($"radix_m")).cast("long"))
        .withColumn("slot",
          when($"radix_k" <= 10, $"radix_k" * 2048L + $"radix_m")
            .otherwise($"radix_k" * 2048L +
              expr("shiftright(radix_m, cast(radix_k as int) - 11)")))
        .groupBy($"l_returnflag", $"slot")
        .agg(count(lit(1)).as("cnt"), min($"c").as("mn"), max($"c").as("mx"))
        .collect()
        .length
    }
    phase("radix agg again (cached)") {
      li.withColumn("radix_m",
          when($"c" >= 0, $"c").otherwise(-($"c" + 1)))
        .withColumn("radix_k", length(bin($"radix_m")).cast("long"))
        .withColumn("slot",
          when($"radix_k" <= 10, $"radix_k" * 2048L + $"radix_m")
            .otherwise($"radix_k" * 2048L +
              expr("shiftright(radix_m, cast(radix_k as int) - 11)")))
        .groupBy($"l_returnflag", $"slot")
        .agg(count(lit(1)).as("cnt"), min($"c").as("mn"), max($"c").as("mx"))
        .collect()
        .length
    }
    // A/B: DataFrame radix agg with AQE off + 1 shuffle partition, on parquet
    val li3 = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag".as("g"), (dec2c($"l_extendedprice") * 100).cast("long").as("c"))
    def dfRadix(src: org.apache.spark.sql.DataFrame): Long = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      try {
        src.withColumn("radix_m",
            when($"c" >= 0, $"c").otherwise(-($"c" + 1)))
          .withColumn("radix_k", length(bin($"radix_m")).cast("long"))
          .withColumn("slot",
            when($"radix_k" <= 10, $"radix_k" * 2048L + $"radix_m")
              .otherwise($"radix_k" * 2048L +
                expr("shiftright(radix_m, cast(radix_k as int) - 11)")))
          .groupBy($"g", $"slot")
          .agg(count(lit(1)).as("cnt"), min($"c").as("mn"), max($"c").as("mx"))
          .collect().length.toLong
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
      }
    }
    phase("DF radix p=1 aqe=off parquet #1")(dfRadix(li3))
    phase("DF radix p=1 aqe=off parquet #2")(dfRadix(li3))
    val rddRadixSrc = li3
    // the REAL production kernel (per-group HashMap radix histogram),
    // so the A/B against the DataFrame variant is apples-to-apples
    phase("RDD radix parquet #1") {
      import org.apache.spark.sql.Encoders
      val enc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
      graft.ops.ExactRank.radixHistogram(
        rddRadixSrc.as[(String, Long)](enc).rdd).size
    }
    phase("RDD radix parquet #2") {
      import org.apache.spark.sql.Encoders
      val enc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
      graft.ops.ExactRank.radixHistogram(
        rddRadixSrc.as[(String, Long)](enc).rdd).size
    }
    val thresholds0 = phase("valuesAtRanks 1st (cached li)") {
      graft.ops.ExactRank.valuesAtRanks(spark, li, "l_returnflag", "c",
        n => Seq("p05_c" -> (n + 19) / 20, "p95_c" -> (n * 19 + 19) / 20))
    }
    val thresholds = phase("valuesAtRanks (cached li)") {
      graft.ops.ExactRank.valuesAtRanks(spark, li, "l_returnflag", "c",
        n => Seq("p05_c" -> (n + 19) / 20, "p95_c" -> (n * 19 + 19) / 20))
    }
    phase("final agg (cached li)") {
      li.join(broadcast(thresholds), "l_returnflag")
        .withColumn("clamped", greatest($"p05_c", least($"p95_c", $"c")))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"))
        .count()
    }
    li.unpersist(blocking = true)
    val li2 = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", (dec2c($"l_extendedprice") * 100).cast("long").as("c"))
    phase("valuesAtRanks (no caller cache)") {
      graft.ops.ExactRank.valuesAtRanks(spark, li2, "l_returnflag", "c",
        n => Seq("p05_c" -> (n + 19) / 20, "p95_c" -> (n * 19 + 19) / 20))
    }
    phase("q98 end-to-end")(graft.RelationalQueries.winsorizedStats(spark, sfDir).count())
    phase("q109 end-to-end")(graft.RelationalQueries.madOutliers(spark, sfDir).count())
    spark.stop()
  }
}
