package graft.expr

import graft.SparkSpecBase
import graft.core.{MalformedFilter, UnknownFilterOp}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import scala.util.Random

/** DSL truth table from FIXTURES.md §3 / SURVEY.md §2.2, plus ScalaCheck
  * properties checking the compiled Column against a plain-Scala reference
  * evaluator of the *intended* semantics (AND across filters, EXISTS
  * across a row's metadata entries; gt = metadata > filter value).
  */
class MetaFilterSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("metadata", ArrayType(StringType))))

  private def df(rows: Seq[(String, Seq[String])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, m) => Row(i, m) }),
      schema)

  private def run(rows: Seq[(String, Seq[String])], filters: Seq[String]): Set[String] =
    df(rows).filter(MetaFilter.compileArray(col("metadata"), filters))
      .select("id").as[String].collect().toSet

  // the reference e2e filter (embeddings.rs:635-638): Year eq 2017 AND Rating gt 3
  test("reference cosine_etl_test filters: eq AND gt") {
    val rows = Seq(
      "pass" -> Seq("""{"Year": 2017}""", """{"Rating": 4}"""),
      "failYear" -> Seq("""{"Year": 2016}""", """{"Rating": 5}"""),
      "failRating" -> Seq("""{"Year": 2017}""", """{"Rating": 3}"""))
    assert(run(rows, Seq("""{"Year": {"eq": 2017}}""", """{"Rating": {"gt": 3}}"""))
      == Set("pass"))
  }

  test("gt/gte/lt/lte direction: metadata value compared against filter value") {
    val rows = Seq(
      "r5" -> Seq("""{"Rating": 5}"""),
      "r3" -> Seq("""{"Rating": 3}"""),
      "r1" -> Seq("""{"Rating": 1}"""))
    assert(run(rows, Seq("""{"Rating": {"gt": 3}}""")) == Set("r5"))
    assert(run(rows, Seq("""{"Rating": {"gte": 3}}""")) == Set("r5", "r3"))
    assert(run(rows, Seq("""{"Rating": {"lt": 3}}""")) == Set("r1"))
    assert(run(rows, Seq("""{"Rating": {"lte": 3}}""")) == Set("r3", "r1"))
  }

  test("string values: eq and in work") {
    val rows = Seq(
      "en" -> Seq("""{"lang": "en"}"""),
      "fr" -> Seq("""{"lang": "fr"}"""),
      "de" -> Seq("""{"lang": "de"}"""))
    assert(run(rows, Seq("""{"lang": {"eq": "en"}}""")) == Set("en"))
    assert(run(rows, Seq("""{"lang": {"in": ["en", "fr"]}}""")) == Set("en", "fr"))
  }

  test("string values reject ordering ops (reference md2f.rs:194-203)") {
    intercept[MalformedFilter](MetaFilter.parse("""{"lang": {"gt": "en"}}"""))
  }

  test("unknown op raises (divergence from reference's silent eq, md2f.rs:32)") {
    intercept[UnknownFilterOp](MetaFilter.parse("""{"Year": {"within": 3}}"""))
  }

  test("malformed JSON raises (reference md2f.rs:79-84)") {
    intercept[MalformedFilter](MetaFilter.parse("""{"Year": """))
    intercept[MalformedFilter](MetaFilter.parse("""[1,2]"""))
    intercept[MalformedFilter](MetaFilter.parse("""{"a":1,"b":2}"""))
  }

  test("bare form compiles to eq (documented divergence from Noop)") {
    val f = MetaFilter.parse("""{"Year": 2017}""")
    assert(f == MetaFilter.Filter("Year", MetaFilter.Eq, MetaFilter.IntVal(2017)))
  }

  test("missing key never matches") {
    val rows = Seq("noyear" -> Seq("""{"Rating": 5}"""))
    assert(run(rows, Seq("""{"Year": {"gte": 0}}""")) == Set.empty[String])
  }

  test("array mode treats dotted keys as literal names (map extraction, not JSONPath)") {
    val rows = Seq(
      "flat" -> Seq("""{"a.b": 5}"""),
      "nested" -> Seq("""{"a": {"b": 5}}"""))
    assert(run(rows, Seq("""{"a.b": {"eq": 5}}""")) == Set("flat"))
  }

  test("typed mode treats dotted keys as literal column names, not paths") {
    import org.apache.spark.sql.functions.lit
    val df = spark.range(1).toDF("id").withColumn("a.b", lit(5L))
    assert(df.filter(MetaFilter.compileTyped(Seq("""{"a.b": {"gte": 5}}""")))
      .count() == 1)
  }

  test("typed-column compilation matches array compilation semantics") {
    val typed = Seq(("a", 2017L, "en"), ("b", 2016L, "fr"), ("c", 2018L, "en"))
      .toDF("id", "Year", "lang")
    val got = typed.filter(MetaFilter.compileTyped(Seq(
      """{"Year": {"gte": 2017}}""", """{"lang": {"eq": "en"}}""")))
      .select("id").as[String].collect().toSet
    assert(got == Set("a", "c"))
  }

  // property: compiled Column ≡ reference evaluator on random data
  private sealed trait V
  private case class IV(v: Long) extends V
  private case class SV(v: String) extends V

  private def evalOne(op: String, fv: V, mv: V): Boolean = (fv, mv) match {
    case (IV(f), IV(m)) => op match {
      case "eq" => m == f; case "gt" => m > f; case "gte" => m >= f
      case "lt" => m < f; case "lte" => m <= f
    }
    case (SV(f), SV(m)) => op == "eq" && m == f
    case _ => false
  }

  test("property: compiled predicate equals reference semantics (seeded random)") {
    val rnd = new Random(42)
    val keys = Seq("Year", "Rating", "tag")
    val strs = Seq("x", "y", "z")
    def randV(): V =
      if (rnd.nextBoolean()) IV(rnd.nextInt(6).toLong) else SV(strs(rnd.nextInt(3)))
    for (_ <- 1 to 15) {
      val rows = Seq.fill(6)(Seq.fill(2)((keys(rnd.nextInt(3)), randV())))
      val filters = Seq.fill(2) {
        val v = randV()
        val op = v match {
          case IV(_) => Seq("eq", "gt", "gte", "lt", "lte")(rnd.nextInt(5))
          case SV(_) => "eq"
        }
        (keys(rnd.nextInt(3)), op, v)
      }
      val metaRows = rows.zipWithIndex.map { case (entries, i) =>
        s"id$i" -> entries.map {
          case (k, IV(v)) => s"""{"$k": $v}"""
          case (k, SV(v)) => s"""{"$k": "$v"}"""
        }
      }
      val filterStrs = filters.map {
        case (k, op, IV(v)) => s"""{"$k": {"$op": $v}}"""
        case (k, op, SV(v)) => s"""{"$k": {"$op": "$v"}}"""
      }
      val expected = metaRows.zip(rows).collect {
        case ((id, _), entries) if filters.forall { case (fk, op, fv) =>
          entries.exists { case (mk, mv) => mk == fk && evalOne(op, fv, mv) }
        } => id
      }.toSet
      assert(run(metaRows, filterStrs) == expected,
        s"rows=$metaRows filters=$filterStrs")
    }
  }
}
