package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: drive the GraftExtensions SQL-function surface end-to-end. */
object ExtDriveMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(
      """SELECT poly_hash('abc') AS h,
         vec_dot(array(1.0d,2.0d,3.0d), array(1.0d,2.0d,3.0d)) AS d,
         array_stats(array(1.0d,3.0d)).mean AS m""").show()
    spark.stop()
  }
}
