package graft
import org.apache.spark.sql.SparkSession
/** Prints explain("formatted") for selected queries — plan-review aid. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // GraftSession: dump the same plan family the bench/verify sessions run
    val spark = GraftSession.tune(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg", "q2_join_broadcast", "q21_in_list")
    for (n <- names) {
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
