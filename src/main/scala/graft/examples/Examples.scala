package graft.examples

import graft.GraftSession
import graft.core.Collection
import graft.embed.HashEmbedder

/** Runnable twins of the reference's examples/ directory.
  *
  * cosine: examples/cosine_query_example.rs — build a collection from
  * car-review-shaped rows, run a filtered cosine query.
  * nearest: examples/nearest_query_example.rs — 10-sentence corpus,
  * 1-nearest-neighbor for a food query.
  *
  *   sbt "runMain graft.examples.Examples"
  */
object Examples {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_examples_").toString
    val embedder = HashEmbedder(dim = 64)

    // --- cosine_query_example ---
    val reviews = Seq(
      (2017, 5, "Great car, amazing autopilot and range."),
      (2017, 2, "Too many rattles for the price."),
      (2018, 4, "The newer model fixed most issues."),
      (2017, 4, "Charging network makes road trips painless."))
      .zipWithIndex.map { case ((y, r, text), i) =>
        (s"id$i", text, Seq(s"""{"Year": $y}""", s"""{"Rating": $r}"""))
      }.toDF("id", "document", "metadata")
    val coll = Collection.create(spark, wh, "tesla_reviews", reviews, embedder)
    println("=== cosine_query (Year eq 2017 AND Rating gt 3, k=10) ===")
    coll.cosineQuery("Find the best reviews.", embedder, 10,
      Seq("""{"Year": {"eq": 2017}}""", """{"Rating": {"gt": 3}}"""))
      .show(truncate = false)

    // --- nearest_query_example ---
    val sentences = Seq(
      "The latest iPhone model comes with impressive features and a powerful camera.",
      "Exploring the beautiful beaches and vibrant culture of Bali is a dream for many travelers.",
      "Einstein's theory of relativity revolutionized our understanding of space and time.",
      "Traditional Italian pizza is famous for its thin crust, fresh ingredients, and wood-fired ovens.",
      "The American Revolution had a profound impact on the birth of the United States as a nation.",
      "Regular exercise and a balanced diet are essential for maintaining good physical health.",
      "Leonardo da Vinci's Mona Lisa is considered one of the most iconic paintings in art history.",
      "Climate change poses a significant threat to the planet's ecosystems and biodiversity.",
      "Startup companies often face challenges in securing funding and scaling their operations.",
      "Beethoven's Symphony No. 9 is celebrated for its powerful choral finale, 'Ode to Joy.'")
    val docs = sentences.zipWithIndex
      .map { case (s, i) => (s"id$i", s, Seq.empty[String]) }
      .toDF("id", "document", "metadata")
    val nColl = Collection.create(spark, wh, "sentences", docs, embedder)
    println("=== nearest_query('Find me some delicious food!') ===")
    nColl.nearestQuery("Find me some delicious food!", embedder)
      .select("id", "document", "l2_distance").show(truncate = false)

    spark.stop()
  }
}
