package graft

import org.apache.spark.sql.functions._

/** Driver-side naive recomputes of the trickier round-5 relational
  * entries at sf0.001 — independent of both Spark's plan AND the DuckDB
  * oracle (a third implementation voting on the semantics). */
class RelationalSemanticsSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("q96 gap-fill: grid is dense per user, zeros on gaps, fill carries last value") {
    val rows = SparkEntry.queries("q96_gap_fill")(spark, sfDir)
      .as[(Long, Long, Long, Option[Double])].collect()
    val byUser = rows.groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, rs) =>
      val hours = rs.map(_._2)
      // dense hourly grid: consecutive epochs, no holes, no dups
      assert(hours.distinct.length == hours.length, s"user $u: duplicate hours")
      assert(hours.max - hours.min == 3600L * (hours.length - 1),
        s"user $u: grid has holes")
      // forward fill: value changes ONLY on hours with events
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, n1, v1), (_, h2, n2, v2)) =>
          if (n2 == 0L) assert(v2 == v1, s"user $u @ $h2: gap must carry $v1, got $v2")
        case _ =>
      }
      // the first grid hour is an active hour by construction (min(hr))
      assert(sorted.head._3 > 0, s"user $u: grid must start at first active hour")
    }
  }

  test("q101 attribution matches a naive in-memory replay") {
    val events = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type", $"value", $"props")
      .as[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .collect()
    val naive = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      var channel = "organic"
      evs.sortBy(e => (e._2.getTime, e._3)).flatMap { e =>
        e._4 match {
          case "click" =>
            val k = """"k"\s*:\s*(\d+)""".r.findFirstMatchIn(e._6)
            k.foreach(m => channel = s"ch${m.group(1).toLong % 4}")
            None
          case "purchase" => Some(channel -> BigDecimal(e._5).setScale(2))
          case _ => None
        }
      }
    }
    val want = naive.groupBy(_._1).map { case (ch, xs) =>
      ch -> ((xs.size.toLong, xs.map(_._2).sum.toDouble))
    }
    val got = SparkEntry.queries("q101_attribution")(spark, sfDir)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == want, s"got $got want $want")
  }

  test("q109 MAD: outlier count matches a naive recompute") {
    val prices = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_extendedprice")
      .as[(String, Double)].collect()
      .map { case (f, p) => f -> BigDecimal(p).setScale(2) }
    val want = prices.groupBy(_._1).map { case (f, xs) =>
      val vs = xs.map(_._2).sorted
      def lowerMedian(s: Seq[BigDecimal]) = s((s.length + 1) / 2 - 1)
      val med = lowerMedian(vs)
      val devs = vs.map(v => (v - med).abs).sorted
      val mad = lowerMedian(devs)
      f -> ((vs.length.toLong, devs.count(_ > mad * 3).toLong))
    }
    val got = SparkEntry.queries("q109_mad_outliers")(spark, sfDir)
      .select($"l_returnflag", $"n", $"n_outliers")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == want, s"got $got want $want")
  }
}
