package graft.expr

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKByAggregateSpec extends SparkSpecBase {
  import spark.implicits._

  // seeded random (group, score, id) rows, spread over many partitions so
  // the partial-heap merge path (serialize/deserialize included) runs
  private def randomRows(seed: Int, n: Int, groups: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (rnd.nextInt(groups).toLong, rnd.nextInt(1000).toDouble, i.toLong)
    }.toDF("g", "score", "id").repartition(16)
  }

  test("topk_by matches row_number window ranking exactly (desc + asc)") {
    val df = randomRows(3, 5000, 40)
    for (desc <- Seq(true, false)) {
      val order = if (desc) Seq($"score".desc, $"id".desc) else Seq($"score".asc, $"id".asc)
      val w = Window.partitionBy($"g").orderBy(order: _*)
      val expected = df.withColumn("rk", row_number().over(w))
        .filter($"rk" <= 5)
        .select($"g", $"rk".cast("long"), $"id")
        .as[(Long, Long, Long)].collect().toSet
      val got = df.groupBy($"g")
        .agg(TopKBy(struct($"id"), struct($"score", $"id"), 5, desc).as("top"))
        .select($"g", posexplode($"top").as(Seq("i", "t")))
        .select($"g", ($"i" + 1).cast("long"), $"t.id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"desc=$desc")
    }
  }

  test("groups smaller than k return all rows; null order keys are skipped") {
    val df = Seq(
      (1L, Some(3.0), 10L), (1L, Some(1.0), 11L),
      (2L, None, 20L), (2L, Some(5.0), 21L)
    ).toDF("g", "score", "id")
    // bare (non-struct) order key: a null key means "skip this row" —
    // wrapping in struct() would instead compare null fields as values
    val got = df.groupBy($"g")
      .agg(TopKBy.top(struct($"id"), $"score", 4).as("top"))
      .select($"g", explode($"top.id").as("id"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 21L)))
  }

  test("string payloads and order keys survive buffer reuse (copy semantics)") {
    val df = (1 to 200).map(i => (i % 5, f"name_$i%03d")).toDF("g", "name")
      .repartition(8)
    val got = df.groupBy($"g")
      .agg(TopKBy.top(struct($"name"), $"name", 2).as("top"))
      .select($"g", explode($"top.name").as("name"))
      .as[(Int, String)].collect().toSet
    val expected = (1 to 200).map(i => (i % 5, f"name_$i%03d"))
      .groupBy(_._1).toSeq.flatMap { case (g, xs) =>
        xs.map(_._2).sorted(Ordering[String].reverse).take(2).map(g -> _)
      }.toSet
    assert(got == expected)
  }

  test("topk_by is registered as a SQL aggregate") {
    graft.GraftExtensions.register(spark)
    randomRows(5, 500, 10).createOrReplaceTempView("tkb")
    val got = spark.sql(
      """SELECT g, topk_by(id, struct(score, id), 3) AS top
        |FROM tkb GROUP BY g""".stripMargin)
      .select($"g", explode($"top").as("id"))
      .as[(Long, Long)].collect().toSet
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id".desc)
    val expected = randomRows(5, 500, 10)
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .select($"g", $"id").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("plan shape: aggregate form has partial+final agg and no Sort below the exchange") {
    val df = randomRows(7, 1000, 10)
    val agg = df.groupBy($"g")
      .agg(TopKBy.top(struct($"id"), struct($"score", $"id"), 3).as("top"))
    val plan = agg.queryExecution.executedPlan.toString
    // ObjectHashAggregate runs TypedImperativeAggregate in partial + final
    // mode around the exchange; no Sort node anywhere in the fragment
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("(?i)partial".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("Sort "), plan)
  }
}

/** r16 focused spec for the q280 rewrite: bottom-k by the PACKED
  * (−sim_micro, id) long selects exactly the rows
  * row_number() OVER (ORDER BY sim DESC, id) ≤ k selects. */
class TopKByPackedOrderSpec extends SparkSpecBase {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.expressions.Window

  test("packed long order ≡ (sim desc, id asc) window selection, per group") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for (g <- 1 to 17; i <- 1 to 50) yield
      (g.toLong, i.toLong, math.rint(rnd.nextDouble() * 2e6 - 1e6) / 1e6)
    val df = rows.toDF("g", "id", "sim")
    val w = Window.partitionBy($"g").orderBy($"sim".desc, $"id")
    val viaWindow = df.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 10).select($"g", $"id")
      .as[(Long, Long)].collect().toSet
    val ord = (lit(1000000L) -
      round($"sim" * 1e6d, 0).cast("long")) * lit(4000000000L) + $"id"
    val viaHeap = df.groupBy($"g")
      .agg(graft.expr.TopKBy.bottom($"id", ord, 10).as("top"))
      .select($"g", explode($"top").as("id"))
      .as[(Long, Long)].collect().toSet
    assert(viaHeap == viaWindow)
  }
}
