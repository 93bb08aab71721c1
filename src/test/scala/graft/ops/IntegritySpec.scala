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
}
