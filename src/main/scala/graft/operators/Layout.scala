package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Output-layout maintenance — the two file-level concerns that dominate
  * large-table operations and that no query-time optimizer can fix after
  * the fact:
  *
  *  1. SMALL FILES: a streaming sink or over-parallel batch write leaves
  *     thousands of KB-size parquet files per partition; every later
  *     scan then pays one task + one footer read per file, and the
  *     NameNode/list cost grows unbounded. [[compactDir]] rewrites a
  *     directory to `ceil(bytes / targetBytes)` files, sizing from the
  *     ACTUAL input byte count (known exactly from the file statuses —
  *     no row-size guessing).
  *
  *  2. CLUSTERING: parquet row-group pruning only helps if each file
  *     covers a narrow range of the filter key. Compaction therefore
  *     range-partitions on the caller's sort key before writing, so
  *     file key-ranges are pairwise disjoint and a point/range filter
  *     touches O(1) of the files instead of all of them.
  *
  * The rewrite is one range-shuffle of the data (the sampling pass of
  * `repartitionByRange` is metadata-cheap), embarrassingly parallel at
  * any scale; for recurring joins use [[Bucketing]] instead — bucketed
  * layout trades the range clustering for shuffle-free equi-joins.
  */
object Layout {

  /** Total bytes of the parquet files under `dir` (exact, from the
    * filesystem — this is the one number the engine can know without
    * reading data).
    */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
    }
    total
  }

  /** Rewrite `inDir` to `outDir` as `ceil(inputBytes / targetBytes)`
    * range-clustered files sorted by `sortCols` within each file.
    * Returns the file count written.
    */
  def compactDir(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, sortCols: Seq[Column]): Int = {
    val bytes = dirBytes(spark, inDir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartitionByRange(nFiles, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Per-file (min, max) of a column across the files of a parquet dir —
    * the data-skipping quality check: disjoint ranges mean a range
    * filter prunes to O(1) files.
    */
  def fileRanges(spark: SparkSession, dir: String,
      column: String): DataFrame =
    spark.read.parquet(dir)
      .select(col(column), input_file_name().as("f"))
      .groupBy("f")
      .agg(min(column).as("lo"), max(column).as("hi"))
}
