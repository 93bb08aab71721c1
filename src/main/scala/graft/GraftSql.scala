package graft

import org.apache.spark.sql.SparkSession

/** SQL-facing facade: registers the testdata tables as temp views and
  * graft's vector kernels as SQL functions, so the whole engine surface is
  * reachable from `spark.sql(...)` — e.g.
  *
  *   GraftSql.init(spark, "/root/testdata/sf0.01")
  *   spark.sql("""
  *     SELECT d.doc_id, vec_cosine(e.embedding, q.embedding) AS sim
  *     FROM documents d
  *     JOIN embeddings e ON d.doc_id = e.vec_id
  *     JOIN embeddings q ON q.vec_id = 0
  *     WHERE d.lang = 'en'
  *     ORDER BY sim DESC LIMIT 10""")
  */
object GraftSql {
  def init(spark: SparkSession, sfDir: String): Unit = {
    GraftExtensions.register(spark)
    Tables.names.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
    // events gets the nanos→timestamp normalization from Tables.events
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
  }
}
