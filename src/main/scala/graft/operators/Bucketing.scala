package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bucketed-layout support — the "remove the pairing shuffle for
  * recurring runs" path (ARCHITECTURE.md, J1 scale note).
  *
  * The reference re-pairs and re-joins the same keys continuously; on a
  * cluster the recurring cost is the shuffle of both join sides on
  * (log_id). Writing both sides bucketed by the join key once lets every
  * subsequent join run shuffle-free: Catalyst sees the bucketed
  * distribution and plans a SortMergeJoin with NO Exchange on either
  * side. At 100 TB that converts the dominant per-run network cost into
  * a one-time layout cost.
  */
object Bucketing {

  /** Materialize the entry/exit sides of the pairing join (J1) as
    * bucketed tables on the join key.
    */
  def writePairingTables(spark: SparkSession, sfDir: String,
      nBuckets: Int = 8): Unit = {
    val ev = Tables.load(spark, sfDir, "events")
    val base = ev.select(
      col("event_id").as("log_id"),
      col("event_type").as("service"),
      Tables.tsMillis(ev).as("end_ms"),
      col("value").as("elapsed"),
      col("user_id"))
    base.select(col("log_id"), col("service"), col("end_ms"), col("elapsed"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "log_id", "service").sortBy("log_id", "service")
      .saveAsTable("graft_exits")
    base.filter(pmod(col("user_id"), lit(7)) =!= 0)
      .select(col("log_id"), col("service"),
        (col("end_ms") - ceil(col("elapsed")).cast("long")).as("start_ms"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, "log_id", "service").sortBy("log_id", "service")
      .saveAsTable("graft_entries")
  }

  /** The J1 pairing join over the bucketed tables — same semantics as
    * [[Correlation.pairing]], but co-located: no shuffle on either side.
    */
  def pairingBucketed(spark: SparkSession): DataFrame = {
    val exits = spark.table("graft_exits")
    val entries = spark.table("graft_entries")
    exits.join(entries, Seq("log_id", "service"), "left")
      .withColumn("start_ms",
        when(col("end_ms").between(col("start_ms"),
          col("start_ms") + Correlation.TtlMs), col("start_ms")))
      .select(col("log_id"), col("service"), col("start_ms"), col("end_ms"),
        col("elapsed"),
        when(col("start_ms").isNull, lit("N")).otherwise(lit("Y")).as("complete"))
  }
}
