package graft

/** Driver-contract smoke: every declared query runs at sf0.001, entry()
  * returns rows, and queries/oracleSql stay consistent. (Value-level
  * correctness is the DuckDB oracle gate — tools/check_correctness.py.) */
class QueriesSmokeSpec extends SparkSpecBase {
  private val sfDir = "/root/testdata/sf0.001"

  test("entry() returns rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 and is deterministic") {
      val df1 = fn(spark, sfDir)
      val rows1 = df1.collect()
      assert(rows1 != null)
      // determinism: a second run yields the identical ordered result
      val rows2 = fn(spark, sfDir).collect()
      assert(rows1.toSeq == rows2.toSeq, s"$name nondeterministic")
    }
  }
}
