package graft.tools

import graft.GraftSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: q266 funnel cardinalities at one or more scale dirs —
  * feature rows, prefix rows, candidate JOIN rows (pre-distinct),
  * DISTINCT candidate pairs, verified output pairs, wall-clock. The
  * r17 evidence for whether the AllPairs verify is floor: if
  * candidates ≈ output, no tighter filter can cut work that matters.
  * Mirrors [[graft.ops.Dedup.cosineTfJoin]]'s internals (w = 3,
  * τ = 0.8 — the q266 parameters). */
object ProbeQ266 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[16]", "16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (threshold, w) = (0.8d, 3)
    args.foreach { dir =>
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.cosineTfJoin(
        graft.Tables.documents(spark, dir), "doc_id", "text",
        threshold, w).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // funnel counts (replicates the op's stages for instrumentation)
      val dec = "decimal(38,0)"
      val tm = math.round(threshold * 1e12d)
      val df = graft.Tables.documents(spark, dir)
      val tok = df.select(col("doc_id").as("_id"),
          filter(split(graft.ops.Dedup.normText(col("text")), " "),
            t => length(t) > 0).as("_ws"))
        .select(col("_id"), explode(expr(
          s"CASE WHEN size(_ws) >= $w THEN " +
            s"transform(sequence(1, size(_ws) - ${w - 1}), " +
            s"i -> concat_ws(' ', slice(_ws, i, $w))) " +
            "ELSE array() END")).as("_w"))
        .groupBy(col("_id"), col("_w")).agg(count(lit(1)).as("_c"))
      val feats = tok
        .withColumn("_nrm", sqrt(sum(col("_c").cast("double") *
          col("_c").cast("double")).over(Window.partitionBy(col("_id")))))
        .withColumn("_u", round(col("_c").cast("double") * 1e6d / col("_nrm"))
          .cast("long"))
        .select(col("_id"), col("_w"), col("_u"))
        .localCheckpoint(true)
      val nFeats = feats.count()
      val norm2 = feats.groupBy(col("_id")).agg(sum(col("_u") * col("_u")).as("_n2"))
      val mx = norm2.agg(max(col("_n2")).as("_mx"))
      val dfreq = feats.groupBy(col("_w")).agg(count(lit(1)).as("_df"))
      val wTail = Window.partitionBy(col("_id"))
        .orderBy(col("_df").desc, col("_w").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val pref = feats.join(dfreq, Seq("_w"))
        .withColumn("_tail2", sum(col("_u") * col("_u")).over(wTail))
        .crossJoin(broadcast(mx))
        .filter(col("_tail2").cast(dec) * col("_mx") >=
          lit(tm).cast(dec) * lit(tm))
        .select(col("_id"), col("_w"), col("_tail2"))
        .localCheckpoint(true)
      val nPref = pref.count()
      val joinRows = pref.as("a").join(pref.as("b"), Seq("_w"))
        .filter(col("a._id") < col("b._id")).count()
      val survived = pref.as("a").join(pref.as("b"), Seq("_w"))
        .filter(col("a._id") < col("b._id"))
        .filter(col("a._tail2").cast(dec) * col("b._tail2") >=
          lit(tm).cast(dec) * lit(tm))
        .select(col("a._id").as("a_id"), col("b._id").as("b_id"))
      val nCand = survived.distinct().count()
      println(f"$dir: feat_rows=$nFeats prefix_rows=$nPref " +
        f"join_rows=$joinRows distinct_candidates=$nCand " +
        f"verified_pairs=$out query_sec=$sec%.1f")
    }
    spark.stop()
  }
}
