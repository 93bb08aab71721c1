package graft

class GraftExtensionsSpec extends SparkSpecBase {

  test("vector kernels callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  vec_dot(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
        |          CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d,
        |  vec_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |             CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c,
        |  vec_l2(CAST(array(0.0, 3.0) AS ARRAY<FLOAT>),
        |         CAST(array(4.0, 0.0) AS ARRAY<FLOAT>)) AS l
      """.stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getDouble(2) == 5.0)
  }

  test("wrong arity raises a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT vec_dot(CAST(array(1.0) AS ARRAY<FLOAT>))").head())
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("vec_dot"))
  }
}
