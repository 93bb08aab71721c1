package graft.ops

import graft.SparkSpecBase

class IntegritySpec extends SparkSpecBase {
  import spark.implicits._

  private val rows = (0L until 500L).map(i => (i, s"name$i", i % 7))

  test("tableChecksum is invariant to partitioning and row order") {
    val a = rows.toDF("id", "name", "grp")
    val b = rows.reverse.toDF("id", "name", "grp").repartition(13)
    val ca = Integrity.tableChecksum(a, "t", Seq("id", "name", "grp")).collect()
    val cb = Integrity.tableChecksum(b, "t", Seq("id", "name", "grp")).collect()
    assert(ca.sameElements(cb))
    assert(ca.head.getLong(1) == 500L)
  }

  test("tableChecksum detects a single changed value") {
    val a = rows.toDF("id", "name", "grp")
    val tampered = rows.updated(250, (250L, "nameX", 250L % 7))
      .toDF("id", "name", "grp")
    val ca = Integrity.tableChecksum(a, "t", Seq("id", "name", "grp"))
      .select($"checksum").as[String].head()
    val cb = Integrity.tableChecksum(tampered, "t", Seq("id", "name", "grp"))
      .select($"checksum").as[String].head()
    assert(ca != cb, "checksum must change when a row changes")
  }

  test("benfordAudit: hand-traced digit counts, full 1..9 spine, closed-form expectations") {
    // digits: 1.0×3 → '1', 0.19 → 190000 → '1', 2.5×2 → '2', 9000×4 → '9'
    val vals = (Seq.fill(3)(1.0d) ++ Seq(0.19d) ++ Seq.fill(2)(2.5d) ++
      Seq.fill(4)(9000.0d)).toDF("v")
    val got = Integrity.benfordAudit(vals, "v")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) == (1L to 9L).toSeq, got.toString)
    val byD = got.map(r => r._1 -> r).toMap
    assert(byD(1L)._2 == 4L && byD(2L)._2 == 2L && byD(9L)._2 == 4L)
    assert((3L to 8L).forall(byD(_)._2 == 0L), got.toString)
    assert(byD(1L)._3 == 0.4d && byD(1L)._4 == 0.30103d, got.toString)
    assert(byD(9L)._4 == 0.045757d, got.toString)
    assert(byD(1L)._5 == 0.09897d, got.toString)
    // mad identical on every row and strictly positive here
    assert(got.map(_._6).distinct.size == 1 && got.head._6 > 0.0d)
  }

  test("benfordAudit: typed domain guards") {
    intercept[IllegalArgumentException](
      Integrity.benfordAudit(Seq(1.0d, 0.0d).toDF("v"), "v"))
    intercept[IllegalArgumentException](
      Integrity.benfordAudit(Seq(1.0d, -3.0d).toDF("v"), "v"))
    intercept[IllegalArgumentException](
      Integrity.benfordAudit(Seq(1.0d, 4e-7d).toDF("v"), "v"))
    intercept[IllegalArgumentException](
      Integrity.benfordAudit(Seq(Option(1.0d), None).toDF("v"), "v"))
  }
}
