package graft.tools

import graft.{GraftSession, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: stage-size probe for the q266 AllPairs cosine join. */
object ProbeCosine {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    val df = Tables.documents(spark, sfDir)
    val tok = df.select(col("doc_id").as("_id"),
        explode(filter(split(Dedup.normText(col("text")), " "),
          t => length(t) > 0)).as("_w"))
      .groupBy(col("_id"), col("_w")).agg(count(lit(1)).as("_c"))
    val feats = tok
      .withColumn("_nrm", sqrt(sum(col("_c").cast("double") *
        col("_c").cast("double")).over(Window.partitionBy(col("_id")))))
      .withColumn("_u", round(col("_c").cast("double") * 1e6d / col("_nrm"))
        .cast("long"))
      .select(col("_id"), col("_w"), col("_u"))
      .localCheckpoint(true)
    println(s"FEATS=${feats.count()}")
    val norm2 = feats.groupBy(col("_id")).agg(sum(col("_u") * col("_u")).as("_n2"))
    val mx = norm2.agg(max(col("_n2")).as("_mx"))
    val dfreq = feats.groupBy(col("_w")).agg(count(lit(1)).as("_df"))
    val tm = math.round(0.8d * 1e12d)
    val wTail = Window.partitionBy(col("_id"))
      .orderBy(col("_df").desc, col("_w").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val pref = feats.join(dfreq, Seq("_w"))
      .withColumn("_tail2", sum(col("_u") * col("_u")).over(wTail))
      .crossJoin(broadcast(mx))
      .filter(col("_tail2").cast("decimal(38,0)") * col("_mx") >=
        lit(tm).cast("decimal(38,0)") * lit(tm))
      .select(col("_id"), col("_w"), col("_tail2"))
      .localCheckpoint(true)
    println(s"PREFIX=${pref.count()}")
    val hot = pref.groupBy(col("_w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(10).collect()
    println("HOT_PREFIX_TOKENS=" + hot.map(r => s"${r.get(0)}:${r.getLong(1)}").mkString(", "))
    val t0 = System.nanoTime()
    val cand = pref.as("a").join(pref.as("b"), Seq("_w"))
      .filter(col("a._id") < col("b._id"))
      .filter(col("a._tail2").cast("decimal(38,0)") * col("b._tail2") >=
        lit(tm).cast("decimal(38,0)") * lit(tm))
      .select(col("a._id").as("a_id"), col("b._id").as("b_id"))
      .distinct()
      .localCheckpoint(true)
    println(f"CAND=${cand.count()} in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val out = cand
      .join(feats.as("fa"), col("a_id") === col("fa._id"))
      .join(feats.as("fb"),
        col("b_id") === col("fb._id") && col("fa._w") === col("fb._w"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(sum(col("fa._u").cast("decimal(38,0)") * col("fb._u")).as("_sim"))
      .filter(col("_sim") >= lit(tm).cast("decimal(38,0)"))
    println(f"OUT=${out.count()} in ${(System.nanoTime() - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
