package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding: array<float>`, `label`).
  *
  * - [[knnBrute]] — exact brute-force cosine top-k: the correctness
  *   baseline. Query set x corpus join, ordered-fold dot products (both
  *   engines fold in index order -> bit-stable), rank by rounded
  *   similarity with id tie-break (deterministic top-k).
  * - [[knnLsh]] — the scale path: sign-random-projection LSH. Each vector
  *   is bucketed by the sign pattern of `nBits` fixed pseudo-random
  *   hyperplanes (deterministic constants shared with the oracle);
  *   candidates only meet within a bucket, so the join is equi-key and
  *   shuffle-partitioned by bucket instead of all-pairs. At 100 TB this is
  *   the difference between O(Q*N) and O(Q*N/2^bits) comparisons; recall
  *   is tunable via bits/band count (classic SRP-LSH).
  *
  * Implementation is pure `functions._` (zip_with + aggregate folds) —
  * no UDFs; floats are cast to double before arithmetic so both engines
  * compute IEEE-754 double folds over identical operands.
  */
object Similarity {

  import graft.functions.VecDot.vec_dot
  private def dot(a: Column, b: Column): Column = vec_dot(a, b)
  private def norm(a: Column): Column = sqrt(vec_dot(a, a))

  private def vecsDouble(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "embeddings").select(
      col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  private val vecsDoubleSql =
    """SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"""

  // list_reduce (sequential left fold) rather than list_sum: matches
  // Spark's aggregate() fold bit-for-bit (list_sum's accumulation order
  // is unspecified).
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a)+1), i -> $a[i] * $b[i])), (acc, v) -> acc + v)"
  private def normSql(a: String): String =
    s"sqrt(list_reduce(list_prepend(0.0, list_transform($a, x -> x*x)), (acc, v) -> acc + v))"

  /** Exact top-k cosine neighbors for query vectors (vec_id < nQueries). */
  def knnBrute(spark: SparkSession, sfDir: String,
      k: Int = 5, nQueries: Int = 20): DataFrame = {
    val vecs = vecsDouble(spark, sfDir)
    val q = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val c = vecs.select(col("vec_id").as("n_id"), col("v").as("nv"))
    val sims = q.join(c, col("q_id") =!= col("n_id"))
      .withColumn("cos",
        dot(col("qv"), col("nv")) / (norm(col("qv")) * norm(col("nv"))))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "cos", "rank")
  }

  def knnBruteSql(k: Int = 5, nQueries: Int = 20): String =
    s"""WITH vecs AS ($vecsDoubleSql),
        q AS (SELECT vec_id AS q_id, v AS qv FROM vecs WHERE vec_id < $nQueries),
        c AS (SELECT vec_id AS n_id, v AS nv FROM vecs),
        sims AS (
          SELECT q_id, n_id,
            ${dotSql("qv", "nv")} / (${normSql("qv")} * ${normSql("nv")}) AS cos
          FROM q JOIN c ON q_id <> n_id),
        ranked AS (
          SELECT q_id, n_id, cos,
            row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
          FROM sims)
        SELECT q_id, n_id, cos, rank FROM ranked WHERE rank <= $k"""

  /** Fixed pseudo-random hyperplane component for (bit, dim): a cheap
    * deterministic LCG-ish constant in [-0.5, 0.5), identical in both
    * engines (pure integer arithmetic then scale).
    */
  private def planeCoef(bit: Int, dim: Int): Double =
    (((bit * 73L + dim * 179L + 11L) * 2654435761L % 1000L) - 500L) / 1000.0

  val LshBits = 8

  /** SRP-LSH bucketing + within-bucket exact cosine top-k. */
  def knnLsh(spark: SparkSession, sfDir: String,
      k: Int = 5, nQueries: Int = 20): DataFrame = {
    val vecs = vecsDouble(spark, sfDir)
    val dim = 64
    val bucket = (0 until LshBits).map { bit =>
      val proj = (0 until dim).map(d =>
        element_at(col("v"), d + 1) * lit(planeCoef(bit, d))).reduce(_ + _)
      when(proj >= 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
    val bucketed = vecs.withColumn("bucket", bucket)
    val q = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
    val c = bucketed.select(col("vec_id").as("n_id"), col("v").as("nv"), col("bucket"))
    val sims = q.join(c, Seq("bucket")).filter(col("q_id") =!= col("n_id"))
      .withColumn("cos",
        dot(col("qv"), col("nv")) / (norm(col("qv")) * norm(col("nv"))))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "bucket", "cos", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: SRP-LSH bucketing, exact
    * cosine within buckets, pairs >= threshold (the embedding-space
    * analogue of MinHash dedup; at scale only bucket-mates meet).
    */
  def embedNearDup(spark: SparkSession, sfDir: String,
      threshold: Double = 0.3): DataFrame = {
    val vecs = vecsDouble(spark, sfDir)
    val dim = 64
    val bucket = (0 until LshBits).map { bit =>
      val proj = (0 until dim).map(d =>
        element_at(col("v"), d + 1) * lit(planeCoef(bit, d))).reduce(_ + _)
      when(proj >= 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
    val b = vecs.withColumn("bucket", bucket)
    val a = b.select(col("vec_id").as("id_a"), col("v").as("va"), col("bucket"))
    val c = b.select(col("vec_id").as("id_b"), col("v").as("vb"), col("bucket"))
    a.join(c, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) /
        (norm(col("va")) * norm(col("vb"))))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  def embedNearDupSql(threshold: Double = 0.3): String = {
    val dim = 64
    val bucket = (0 until LshBits).map { bit =>
      val proj = (0 until dim).map(d => s"v[${d + 1}] * ${planeCoef(bit, d)}")
        .mkString(" + ")
      s"CASE WHEN ($proj) >= 0 THEN ${1L << bit} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH vecs AS (SELECT *, CAST($bucket AS BIGINT) AS bucket FROM ($vecsDoubleSql)),
        a AS (SELECT vec_id AS id_a, v AS va, bucket FROM vecs),
        c AS (SELECT vec_id AS id_b, v AS vb, bucket FROM vecs),
        sims AS (
          SELECT id_a, id_b,
            ${dotSql("va", "vb")} / (${normSql("va")} * ${normSql("vb")}) AS cos
          FROM a JOIN c ON a.bucket = c.bucket AND id_a < id_b)
        SELECT id_a, id_b, cos FROM sims WHERE cos >= $threshold"""
  }

  /** IVF-Flat ANN: a coarse quantizer of `nCells` centroids (taken
    * deterministically as the first `nCells` corpus vectors — a k-means
    * iteration would refine them, but the *search* structure is the
    * point), every vector assigned to its nearest centroid by cosine,
    * queries probing only their own cell (nprobe=1). At scale the
    * centroid assignment is a broadcast map-side pass and the search
    * shuffle is keyed by cell — O(Q*N/nCells) comparisons.
    */
  val IvfCells = 8

  private def cellAssign(vecs: DataFrame, cents: Seq[(Long, Seq[Double])]): Column = {
    // argmin over centroids of negative cosine == argmax cosine;
    // left-to-right strict-greater fold matches the SQL CASE chain.
    val scored = cents.map { case (cid, cv) =>
      val cvCol = array(cv.map(lit): _*)
      (cid, dot(col("v"), cvCol) / (norm(col("v")) * norm(cvCol)))
    }
    scored.foldLeft((lit(-1L), lit(Double.MinValue))) {
      case ((bc, bs), (cid, sc)) =>
        (when(sc > bs, lit(cid)).otherwise(bc), when(sc > bs, sc).otherwise(bs))
    }._1
  }

  def knnIvf(spark: SparkSession, sfDir: String,
      k: Int = 5, nQueries: Int = 20): DataFrame = {
    val vecs = vecsDouble(spark, sfDir)
    val cents = vecs.filter(col("vec_id") < IvfCells)
      .select("vec_id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq
    val assigned = vecs.withColumn("cell", cellAssign(vecs, cents))
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("cell"))
    val c = assigned.select(col("vec_id").as("n_id"), col("v").as("nv"), col("cell"))
    val sims = q.join(c, Seq("cell")).filter(col("q_id") =!= col("n_id"))
      .withColumn("cos",
        dot(col("qv"), col("nv")) / (norm(col("qv")) * norm(col("nv"))))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "cell", "cos", "rank")
  }

  def knnIvfSql(k: Int = 5, nQueries: Int = 20): String = {
    // centroid cosine per cell, as columns of the same fold shape
    val centSql = (0 until IvfCells).map { cid =>
      val cv = s"(SELECT v FROM vecs0 WHERE vec_id = $cid)"
      (cid, s"${dotSql("v", s"c$cid")} / (${normSql("v")} * ${normSql(s"c$cid")})")
    }
    val centCols = (0 until IvfCells)
      .map(cid => s"(SELECT v FROM vecs0 WHERE vec_id = $cid) AS c$cid").mkString(", ")
    val (cellExpr, _) = centSql.foldLeft(("CAST(-1 AS BIGINT)", "-1.7976931348623157E308")) {
      case ((bc, bs), (cid, sc)) =>
        (s"CASE WHEN ($sc) > ($bs) THEN $cid ELSE ($bc) END",
         s"CASE WHEN ($sc) > ($bs) THEN ($sc) ELSE ($bs) END")
    }
    s"""WITH vecs0 AS ($vecsDoubleSql),
        withc AS (SELECT vec_id, v, $centCols FROM vecs0),
        assigned AS (SELECT vec_id, v, CAST($cellExpr AS BIGINT) AS cell FROM withc),
        q AS (SELECT vec_id AS q_id, v AS qv, cell FROM assigned WHERE vec_id < $nQueries),
        c AS (SELECT vec_id AS n_id, v AS nv, cell FROM assigned),
        sims AS (
          SELECT q_id, n_id, q.cell AS cell,
            ${dotSql("qv", "nv")} / (${normSql("qv")} * ${normSql("nv")}) AS cos
          FROM q JOIN c ON q.cell = c.cell AND q_id <> n_id),
        ranked AS (
          SELECT q_id, n_id, cell, cos,
            row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
          FROM sims)
        SELECT q_id, n_id, cell, cos, rank FROM ranked WHERE rank <= $k"""
  }

  def knnLshSql(k: Int = 5, nQueries: Int = 20): String = {
    val dim = 64
    val bucket = (0 until LshBits).map { bit =>
      val proj = (0 until dim).map(d => s"v[${d + 1}] * ${planeCoef(bit, d)}")
        .mkString(" + ")
      s"CASE WHEN ($proj) >= 0 THEN ${1L << bit} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH vecs AS (SELECT *, CAST($bucket AS BIGINT) AS bucket FROM ($vecsDoubleSql)),
        q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM vecs WHERE vec_id < $nQueries),
        c AS (SELECT vec_id AS n_id, v AS nv, bucket FROM vecs),
        sims AS (
          SELECT q_id, n_id, q.bucket AS bucket,
            ${dotSql("qv", "nv")} / (${normSql("qv")} * ${normSql("nv")}) AS cos
          FROM q JOIN c ON q.bucket = c.bucket AND q_id <> n_id),
        ranked AS (
          SELECT q_id, n_id, bucket, cos,
            row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
          FROM sims)
        SELECT q_id, n_id, bucket, cos, rank FROM ranked WHERE rank <= $k"""
  }
}
