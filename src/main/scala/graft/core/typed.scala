package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed row models — the `Dataset[T]` facade over the untyped core
  * (SURVEY.md §1.5: "a thin Dataset[T] typed API can wrap it").
  * DataFrame stays the engine currency; these give compile-time field
  * checks at the API boundary where a user wants them.
  */
final case class DocumentRow(
    id: String,
    document: String,
    metadata: Seq[String],
    embedding: Array[Float])

/** The reference's `CosineQueryResult` row (embeddings.rs:144-177),
  * plus the id (the reference recovers rows positionally; we key them). */
final case class QueryHit(
    id: String,
    document: String,
    similarity: Double,
    metadata: Seq[String])

object typed {
  implicit class TypedCollection(private val coll: Collection) {
    def typedDf(implicit spark: SparkSession): Dataset[DocumentRow] = {
      import spark.implicits._
      coll.df.as[DocumentRow]
    }

    def cosineQueryTyped(
        queryVec: Array[Float],
        numResults: Int,
        whereFilters: Seq[String] = Seq.empty)(
        implicit spark: SparkSession): Dataset[QueryHit] = {
      import spark.implicits._
      coll.cosineQueryVec(queryVec, numResults, whereFilters).as[QueryHit]
    }
  }
}
