package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    import graft.functions.PolyHash.poly_hash
    def t(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val c0 = osBean.getProcessCpuTime; val t0 = System.nanoTime()
        f
        println(f"[probe] $name pass$i wall=${(System.nanoTime()-t0)/1e9}%.2f cpu=${(osBean.getProcessCpuTime-c0)/1e9}%.2f")
        System.gc()
      }
    }
    val dir = args(0)
    // caption scan: norm + hash over image docs
    t("cap_scan") {
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          poly_hash(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fp"))
        .write.format("noop").mode("overwrite").save()
    }
    // full x1
    t("x1") {
      graft.operators.Multimodal.crossModalDedup(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
