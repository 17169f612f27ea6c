package graft
import org.apache.spark.sql.SparkSession
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val p = Tables.part(spark, d)
    p.count() // warm scan
    def time(tag: String)(f: => Long): Unit = {
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $tag rep$r: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
      }
    }
    time("brute")(graft.ops.EditDistanceJoin.selfJoinBrute(p, "p_partkey", "p_name", Seq("p_brand"), 2).count())
    time("edjoin")(graft.ops.EditDistanceJoin.selfJoin(p, "p_partkey", "p_name", Seq("p_brand"), 2, vocabBroadcast = Some(true)).count())
    spark.stop()
  }
}
