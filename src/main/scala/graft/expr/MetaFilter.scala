package graft.expr

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.core.{MalformedFilter, UnknownFilterOp}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

import scala.jdk.CollectionConverters._

/** The metadata WHERE-filter DSL of the reference, compiled once on the
  * driver into a Catalyst `Column` predicate.
  *
  * Reference grammar (src/md2f.rs:78-153, SURVEY.md §2.2): each filter is a
  * one-key JSON object, either the operator form `{"Key": {"op": v}}` with
  * op ∈ {eq, gt, gte, lt, lte} or the bare form `{"Key": v}`. Values are
  * u64 (all five ops, md2f.rs:210-223) or strings (eq only, md2f.rs:194-203).
  * Comparison direction: `gt` passes when metadata-value > filter-value
  * (md2f.rs:160-183).
  *
  * Documented divergences (SURVEY.md §7.4):
  *  - `in` is documented by the reference (embeddings.rs:331) but never
  *    implemented — we implement it (`isin`) for both strings and ints;
  *  - unknown ops raise [[graft.core.UnknownFilterOp]] instead of silently
  *    becoming `eq` (md2f.rs:32);
  *  - the bare form compiles to `eq` instead of the reference's never-
  *    matching Noop (md2f.rs:108-122,155-158);
  *  - conjunction is a true AND across filters with EXISTS across a row's
  *    metadata entries, not the reference's double-countable pair tally
  *    (md2f.rs:232-247).
  *
  * Two compilation targets:
  *  - [[compileTyped]]: metadata already promoted to typed top-level
  *    columns — predicates like `col("Year") > lit(2017)`, which Catalyst
  *    pushes down to the Parquet scan (the 100 TB path);
  *  - [[compileArray]]: reference-fidelity mode over an
  *    `ArrayType(StringType)` column of one-key JSON-object strings —
  *    `EXISTS(meta, m -> get_json_object(m, '$.Key') cmp v)`.
  */
object MetaFilter {

  sealed trait Op
  case object Eq extends Op
  case object Gt extends Op
  case object Gte extends Op
  case object Lt extends Op
  case object Lte extends Op
  case object In extends Op

  sealed trait FValue
  final case class IntVal(v: Long) extends FValue
  final case class StrVal(v: String) extends FValue
  final case class ListVal(vs: Seq[FValue]) extends FValue

  final case class Filter(key: String, op: Op, value: FValue)

  private val mapper = new ObjectMapper()

  private def scalar(node: JsonNode, raw: String): FValue =
    if (node.isIntegralNumber) IntVal(node.asLong())
    else if (node.isTextual) StrVal(node.asText())
    else throw MalformedFilter(raw,
      s"unsupported value type ${node.getNodeType} (expected integer or string)")

  /** Parse one filter string into its (key, op, value) triple. */
  def parse(raw: String): Filter = {
    val root =
      try mapper.readTree(raw)
      catch { case e: Exception => throw MalformedFilter(raw, e.getMessage) }
    if (root == null || !root.isObject || root.size() != 1)
      throw MalformedFilter(raw, "filter must be a one-key JSON object")
    val key = root.fieldNames().next()
    val value = root.get(key)
    if (value.isObject) {
      if (value.size() != 1)
        throw MalformedFilter(raw, "operator object must have exactly one op")
      val opName = value.fieldNames().next()
      val inner = value.get(opName)
      val op = opName match {
        case "eq" => Eq; case "gt" => Gt; case "gte" => Gte
        case "lt" => Lt; case "lte" => Lte; case "in" => In
        case other => throw UnknownFilterOp(other)
      }
      val fv =
        if (op == In) {
          if (!inner.isArray) throw MalformedFilter(raw, "'in' expects an array value")
          ListVal(inner.elements().asScala.map(scalar(_, raw)).toSeq)
        } else scalar(inner, raw)
      (op, fv) match {
        case (Eq | In, _) => ()
        case (_, StrVal(_)) =>
          throw MalformedFilter(raw, "strings support only eq/in (reference md2f.rs:194-203)")
        case _ => ()
      }
      Filter(key, op, fv)
    } else if (value.isArray) {
      Filter(key, In, ListVal(value.elements().asScala.map(scalar(_, raw)).toSeq))
    } else {
      Filter(key, Eq, scalar(value, raw))
    }
  }

  /** TRY-mode cast to long: a non-numeric metadata value simply fails the
    * numeric filter (reference semantics: type mismatch ⇒ no match,
    * md2f.rs:186-225) instead of raising under ANSI mode. */
  private def tryCastLong(c: Column): Column =
    ColumnBridge.column(Cast(ColumnBridge.expression(c), LongType, None, EvalMode.TRY))

  private def cmp(op: Op, lhs: Column, value: FValue): Column = (op, value) match {
    case (Eq, IntVal(v))  => lhs === lit(v)
    case (Eq, StrVal(v))  => lhs === lit(v)
    case (Gt, IntVal(v))  => lhs > lit(v)
    case (Gte, IntVal(v)) => lhs >= lit(v)
    case (Lt, IntVal(v))  => lhs < lit(v)
    case (Lte, IntVal(v)) => lhs <= lit(v)
    case (In, ListVal(vs)) =>
      val lits = vs.map { case IntVal(v) => v: Any; case StrVal(v) => v: Any
                          case other => throw MalformedFilter(other.toString, "nested list") }
      lhs.isin(lits: _*)
    case (op, v) => throw MalformedFilter(s"$op $v", "unsupported op/value combination")
  }

  private def isIntFilter(f: Filter): Boolean = f.value match {
    case IntVal(_) => true
    case ListVal(vs) => vs.forall(_.isInstanceOf[IntVal])
    case _ => false
  }

  /** Compile to a predicate over typed top-level columns (pushdown path). */
  def compileTyped(filters: Seq[String]): Column =
    filters.map(parse).map { f =>
      // backtick-quote: a key like "a.b" is a literal column name in the
      // DSL, never a nested-field path
      val base = col(s"`${f.key}`")
      val lhs = if (isIntFilter(f)) tryCastLong(base) else base
      cmp(f.op, lhs, f.value)
    }.reduceOption(_ && _).getOrElse(lit(true))

  /** Compile to a predicate over an array-of-JSON-strings metadata column
    * (reference-fidelity mode): AND across filters, EXISTS across entries. */
  def compileArray(metaCol: Column, filters: Seq[String]): Column =
    filters.map(parse).map { f =>
      exists(metaCol, { m =>
        // extract via a string map, not a get_json_object path: the DSL key
        // is a literal name, and '$.a.b'-style paths would reinterpret
        // dotted/special keys as nesting (mirrors compileTyped's quoting)
        val extracted = element_at(
          from_json(m, org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)),
          f.key)
        val lhs = if (isIntFilter(f)) tryCastLong(extracted) else extracted
        lhs.isNotNull && cmp(f.op, lhs, f.value)
      })
    }.reduceOption(_ && _).getOrElse(lit(true))
}
