package graft

class GraftSqlSpec extends SparkSpecBase {

  test("full engine surface reachable from pure SQL") {
    GraftSql.init(spark, "/root/testdata/sf0.001")
    val top = spark.sql(
      """SELECT d.doc_id, vec_cosine(e.embedding, q.embedding) AS sim
        |FROM documents d
        |JOIN embeddings e ON d.doc_id = e.vec_id
        |JOIN embeddings q ON q.vec_id = 0
        |WHERE d.lang = 'en' AND d.doc_id <> 0
        |ORDER BY sim DESC, d.doc_id
        |LIMIT 5""".stripMargin).collect()
    assert(top.length == 5)
    assert(top.map(_.getDouble(1)).toSeq == top.map(_.getDouble(1)).sortBy(-_).toSeq)

    val rev = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(rev.nonEmpty)

    // events view has the normalized timestamp type
    assert(spark.table("events").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }
}
