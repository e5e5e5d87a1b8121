import org.apache.spark.sql.{SparkSession, functions => F}
import F._
object SigDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[16]")
      .config("spark.sql.shuffle.partitions", 16).getOrCreate()
    import graft.ext.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (f <- 0 until 10) {
      val copy = docs.select(col("doc_id"),
        array_join(transform(split(col("text"), "\\s+"),
          t => concat(lit(s"c$f"), t)), " ").as("text"))
      val sigs = Dedup.withSimhash128(copy.select(col("doc_id"), col("text").as("__text")), "__text", "sig")
        .select(col("doc_id"), col("sig"))
      println(s"COPY $f cands128=" + Dedup.hammingCandidatePairs128(sigs).count())
      graft.Caches.releaseAll(spark)
    }
    spark.stop()
  }
}
