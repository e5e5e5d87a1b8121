package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot diagnostic for the simhash stress adjudication (r9): at
  * factor 20, split verified (dist<=3) candidate pairs into within-copy
  * vs cross-copy and print the per-copy distribution — run via
  * `sbt "Test/runMain graft.tools.SimVerProbe"`, not part of the suite.
  */
object SimVerProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("simver").getOrCreate()
    import graft.ext.Dedup
    import graft.Tables
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val factor = sys.env.getOrElse("SPARK_GRAFT_STRESS_FACTOR", "20").toInt
    val big = (0 until factor).map { f =>
      docs.select((col("doc_id") + lit(f.toLong * 10000000L)).as("doc_id"),
        array_join(transform(split(col("text"), "\\s+"),
          t => concat(lit(s"c$f"), t)), " ").as("text"))
    }.reduce(_ unionByName _)
    val cands = Dedup.hammingCandidatePairs(
      Dedup.withSimhash(big.select(col("doc_id"), col("text").as("__text")),
        "__text", "sig").select("doc_id", "sig"))
      .withColumn("copy_a", floor(col("id_a") / 10000000L))
      .withColumn("copy_b", floor(col("id_b") / 10000000L))
      .cache()
    val ver = cands.filter(col("dist") <= 3)
    val byKind = ver.groupBy((col("copy_a") === col("copy_b")).as("same_copy"))
      .agg(count(lit(1)).as("n")).collect()
    println("KIND " + byKind.mkString(" | "))
    val perCopy = ver.filter(col("copy_a") === col("copy_b"))
      .groupBy("copy_a").agg(count(lit(1)).as("n")).orderBy("copy_a").collect()
    println("PERCOPY " + perCopy.map(_.getLong(1)).mkString(","))
    val distHist = cands.groupBy(col("dist")).agg(count(lit(1)).as("n"))
      .orderBy("dist").limit(12).collect()
    println("DISTHIST " + distHist.map(r => s"${r.get(0)}:${r.getLong(1)}").mkString(","))
    spark.stop()
  }
}
