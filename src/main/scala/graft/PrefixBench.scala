package graft
import org.apache.spark.sql.SparkSession
object PrefixBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    // warm
    docs.count()
    for (variant <- Seq("exact", "prefix"); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = variant match {
        case "exact" => ops.SimilarityJoin.jaccardSelf(docs, "doc_id", "text", Seq("lang","source"), 0.8).count()
        case "prefix" => ops.SimilarityJoin.jaccardSelfPrefix(docs, "doc_id", "text", Seq("lang","source"), 0.8).count()
      }
      println(f"$variant rep$rep: ${(System.nanoTime()-t0)/1e9}%.2f s, $n pairs")
    }
    spark.stop()
  }
}
