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
    spark.stop()
  }
}
