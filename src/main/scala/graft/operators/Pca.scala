package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.FixedPointMoments.fixed_point_moments

/** Distributed PCA over the embedding corpus — the
  * whitening/dim-reduction preprocessor of embedding-space curation
  * (SemDeDup-style pipelines whiten before cosine thresholds; IVF/PQ
  * indexes train better on decorrelated axes).
  *
  * The scale-critical piece is the covariance pass, and it is ONE
  * aggregate: vectors are quantized to fixed point (`round(x * 2^14)`)
  * and [[graft.functions.FixedPointMoments]] accumulates count, per-dim
  * sums and the upper-triangle raw products in O(d^2) integer state per
  * partition — no explode, no per-cell shuffle, one buffer per partition
  * crossing the wire, and the result is EXACTLY row-order independent
  * (integer sums), which is what lets a DuckDB oracle hash-match the
  * covariance of a 1000-executor run. Covariance then derives in doubles
  * from those exact integers with a pinned operation order.
  *
  * The eigenvector step is driver-side by design: the collected payload
  * is the single moments row (2 144 longs at d=64) — model-scale
  * metadata, like k-means centroids — and `Iters` power-iteration steps
  * on a 64x64 matrix are data-independent. Every fold ascends index order, so
  * the DuckDB oracle reproduces the iteration bit-for-bit as a recursive
  * CTE over LIST(DOUBLE) state (list_reduce folds left like the Scala
  * loop). Projection is a per-row ordered fold (zip_with + aggregate),
  * the same shape as every dot product in [[Similarity]].
  *
  * Reference scope note: the reference has no linear algebra (its
  * pipeline is APM aggregation, stream_calc_z_score.js etc.) — this
  * module is part of the beyond-reference LLM-data-pipeline surface.
  */
object Pca {

  val Dim = 64
  /** Fixed-point scale: 2^14. |x| <= 2 keeps each product < 2^31 —
    * headroom for ~2^32 rows per covariance cell before the aggregate's
    * addExact trips; larger corpora lower the scale.
    */
  val Scale = 16384.0
  /** Validated fixed-point domain: |x| <= 2, i.e. |q| <= 2*Scale. The
    * covariance aggregate's overflow headroom (see [[Scale]]) assumes
    * it, so [[quantized]] RAISES on any vector element outside it —
    * a per-row diagnostic naming the value, instead of a
    * Math.multiplyExact ArithmeticException from deep inside the
    * aggregate with no row context.
    */
  val MaxAbsQ = 2L * Scale.toLong
  /** Power-iteration step count. Synthetic embeddings have a flat
    * spectrum (lambda2/lambda1 ~ 0.9), so convergence needs
    * 0.9^k << 1: 200 steps puts the residual below 1e-9 relative.
    * Cross-engine parity is per-step exact, so the count only buys
    * convergence, never divergence.
    */
  val Iters = 200

  /** Quantize one embedding element, asserting the fixed-point domain:
    * out-of-range input raises a diagnostic naming the offending value
    * (a defined, catchable failure) rather than overflowing the moments
    * aggregate mid-job. In-range data compiles to the identical
    * round/cast expression as before — the `when` arm is dead — so the
    * e4–e7 oracles are unchanged.
    */
  private[graft] def quantizeElem(x: Column): Column = {
    val xd = x.cast("double")
    val qd = round(xd * lit(Scale)) // still a DOUBLE — see the guard
    val q = qd.cast("long")
    // The range test runs on the DOUBLE qd, never on q: the non-ANSI
    // double->long cast SATURATES at Long.MinValue for any
    // x <= ~-5.6e14 (not just -Infinity), and abs(Long.MinValue) wraps
    // negative — a finite out-of-range value would slip past an
    // abs(q)-based test and still overflow the aggregate. abs(qd) is
    // saturation-free (doubles carry the magnitude), represents every
    // in-domain value exactly (|qd| <= 2^15 << 2^53), and is Infinity
    // for Infinity input. NaN is checked explicitly (NaN compares false
    // against everything, so it would pass the > test and cast to 0 —
    // silent corruption). `when` short-circuits in codegen, so the q
    // branch never evaluates for raising rows.
    when(isnan(xd) || abs(qd) > lit(MaxAbsQ.toDouble),
      raise_error(concat(
        lit(s"pca: embedding element outside fixed-point domain |x| <= 2 "
          + s"(|q| <= $MaxAbsQ at scale ${Scale.toLong}): x="),
        x.cast("string"))).cast("long"))
      .otherwise(q)
  }

  private def quantized(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "embeddings").select(
      col("vec_id"), col("embedding"),
      transform(col("embedding"), x => quantizeElem(x)).as("q"))

  /** The single-row exact moments frame: n, s[d], m2[d(d+1)/2]. */
  def moments(spark: SparkSession, sfDir: String): DataFrame =
    quantized(spark, sfDir)
      .agg(fixed_point_moments(col("q"), Dim).as("m"))
      .select(col("m.n").as("n"), col("m.s").as("s"), col("m.m2").as("m2"))

  /** cov(i,j) from the exact integer moments — the ONE double formula
    * both engines and the driver-side eigen step all share:
    * (m2/S^2)/n - ((s_i/S)/n)*((s_j/S)/n).
    */
  private def covExpr(m2: Column, si: Column, sj: Column, n: Column): Column =
    m2.cast("double") / lit(Scale * Scale) / n.cast("double") -
      (si.cast("double") / lit(Scale) / n.cast("double")) *
      (sj.cast("double") / lit(Scale) / n.cast("double"))

  /** e4 — the covariance matrix itself (upper triangle, d(d+1)/2 rows),
    * oracle-verified cell by cell.
    */
  def pcaCov(spark: SparkSession, sfDir: String): DataFrame = {
    val m = moments(spark, sfDir)
    m.select(explode(sequence(lit(0), lit(Dim - 1))).as("i"),
        col("n"), col("s"), col("m2"))
      .select(col("i"), explode(sequence(col("i"), lit(Dim - 1))).as("j"),
        col("n"), col("s"), col("m2"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        covExpr(
          element_at(col("m2"),
            (col("i") * lit(Dim) - expr("(i * (i - 1)) div 2") +
              (col("j") - col("i")) + lit(1)).cast("int")),
          element_at(col("s"), col("i") + 1),
          element_at(col("s"), col("j") + 1),
          col("n")).as("cov"))
  }

  def pcaCovSql: String =
    s"""WITH q AS (
          SELECT vec_id, i,
            CAST(round(CAST(embedding[i] AS DOUBLE) * $Scale) AS BIGINT) AS qx
          FROM embeddings, range(1, ${Dim + 1}) t(i)),
        s AS (
          SELECT i - 1 AS i, CAST(sum(qx) AS BIGINT) AS s FROM q GROUP BY 1),
        n AS (SELECT count(*) AS n FROM embeddings),
        m2 AS (
          SELECT a.i - 1 AS i, b.i - 1 AS j,
            CAST(sum(a.qx * b.qx) AS BIGINT) AS m2
          FROM q a JOIN q b USING (vec_id) WHERE a.i <= b.i
          GROUP BY 1, 2)
        SELECT m2.i, m2.j,
          CAST(m2 AS DOUBLE) / ${Scale * Scale} / CAST(n AS DOUBLE) -
            (CAST(sa.s AS DOUBLE) / $Scale / CAST(n AS DOUBLE)) *
            (CAST(sb.s AS DOUBLE) / $Scale / CAST(n AS DOUBLE)) AS cov
        FROM m2, n
        JOIN s sa ON m2.i = sa.i
        JOIN s sb ON m2.j = sb.i"""

  /** Driver-side deterministic eigen step shared by e5/e6: builds the
    * full symmetric cov matrix from the collected moments row, runs
    * `Iters` power-iteration steps from the exact start vector
    * 1/sqrt(64) = 0.125, every sum folding ascending — the identical
    * operation sequence the oracle's recursive CTE performs.
    */
  /** Power-iterate a (deflated) matrix: `Iters` steps from the exact
    * 0.125 start, every sum folding ascending; returns the unit
    * eigenvector and its Rayleigh eigenvalue — the identical operation
    * sequence the oracle's recursive CTE performs.
    */
  private def powerIter(cov: Array[Array[Double]]): (Array[Double], Double) = {
    def matvec(v: Array[Double]): Array[Double] = Array.tabulate(Dim) { i =>
      var acc = 0.0
      var j = 0
      while (j < Dim) { acc += cov(i)(j) * v(j); j += 1 }
      acc
    }
    var v = Array.fill(Dim)(0.125)
    var k = 0
    while (k < Iters) {
      val w = matvec(v)
      var nrm2 = 0.0
      var i = 0
      while (i < Dim) { nrm2 += w(i) * w(i); i += 1 }
      val nrm = math.sqrt(nrm2)
      v = w.map(_ / nrm)
      k += 1
    }
    val w = matvec(v)
    var lam = 0.0
    var i = 0
    while (i < Dim) { lam += v(i) * w(i); i += 1 }
    (v, lam)
  }

  /** Driver-side deterministic eigen step shared by e5/e6: full
    * symmetric cov from the collected moments row, top component by
    * power iteration, second component by power iteration on the
    * DEFLATED matrix C - lam1 v1 v1^T (classic Hotelling deflation,
    * same arithmetic order as the oracle).
    */
  private def topComponents(spark: SparkSession, sfDir: String)
      : (Array[Double], Array[Double], Array[Double], Double, Double) = {
    val row = moments(spark, sfDir).head()
    val n = row.getLong(0)
    val s = row.getSeq[Long](1).toArray
    val m2 = row.getSeq[Long](2).toArray
    val nD = n.toDouble
    def covAt(i: Int, j: Int): Double = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      val k = a * Dim - a * (a - 1) / 2 + (b - a)
      m2(k).toDouble / (Scale * Scale) / nD -
        (s(a).toDouble / Scale / nD) * (s(b).toDouble / Scale / nD)
    }
    val cov = Array.tabulate(Dim, Dim)(covAt)
    val mu = Array.tabulate(Dim)(i => s(i).toDouble / Scale / nD)
    val (v1, lam1) = powerIter(cov)
    val cov2 = Array.tabulate(Dim, Dim)((i, j) =>
      cov(i)(j) - lam1 * v1(i) * v1(j))
    val (v2, lam2) = powerIter(cov2)
    (v1, v2, mu, lam1, lam2)
  }

  /** e5 — the top two principal components:
    * (i, loading1, loading2, eigval1, eigval2).
    */
  def pcaComponent(spark: SparkSession, sfDir: String): DataFrame = {
    val (v1, v2, _, lam1, lam2) = topComponents(spark, sfDir)
    import spark.implicits._
    (0 until Dim).map(i => (i.toLong, v1(i), v2(i), lam1, lam2))
      .toDF("i", "loading1", "loading2", "eigval1", "eigval2")
  }

  /** e6 — the 2-D embedding map: project every vector onto the top two
    * components, pc_k = sum_i (x_i - mu_i) * v_k(i), ascending fold
    * per row.
    */
  def pcaProject(spark: SparkSession, sfDir: String): DataFrame = {
    val (v1, v2, mu, _, _) = topComponents(spark, sfDir)
    val centered = zip_with(
      transform(col("embedding"), x => x.cast("double")),
      typedlit(mu.toSeq), (x, m) => x - m)
    def proj(v: Array[Double]): Column =
      // native vec_dot == the former aggregate(zip_with(_*_)) fold
      graft.functions.VecDot.vec_dot(centered, typedlit(v.toSeq))
    Tables.load(spark, sfDir, "embeddings").select(
      col("vec_id"), proj(v1).as("pc1"), proj(v2).as("pc2"))
  }

  /** e7 — PCA reconstruction-error outlier scores: per vector,
    * resid = ||(x - mu) - pc1*v1 - pc2*v2||^2, the squared distance to
    * the top-2 principal subspace. Embedding-curation pipelines use
    * this as an outlier/novelty signal (vectors the dominant factors
    * can't explain: corrupted inputs, off-distribution content). Pure
    * per-row column arithmetic over the broadcast loadings — a single
    * scan, no shuffle — with every fold ascending so the DuckDB oracle
    * reproduces it bit-for-bit (`p1`/`p2` are term-for-term the e6
    * projections; the residual fold squares a diff array built as
    * (c_i - p1*v1_i) - p2*v2_i in that exact order).
    */
  def pcaResidual(spark: SparkSession, sfDir: String): DataFrame = {
    val (v1, v2, mu, _, _) = topComponents(spark, sfDir)
    val centered = zip_with(
      transform(col("embedding"), x => x.cast("double")),
      typedlit(mu.toSeq), (x, m) => x - m)
    def proj(c: Column, v: Array[Double]): Column =
      // native vec_dot == the former aggregate(zip_with(_*_)) fold
      graft.functions.VecDot.vec_dot(c, typedlit(v.toSeq))
    val v1l = typedlit(v1.toSeq)
    val v2l = typedlit(v2.toSeq)
    // p1/p2 ride in the fold's INITIAL accumulator, evaluated once per
    // row: a plain scalar-column formulation gets CollapseProject'd into
    // the per-element lambda (Catalyst counts references, not lambda
    // iterations), silently re-folding each projection d times per
    // element — O(d^2) per row instead of O(d). The index counter makes
    // the loadings addressable per element; the arithmetic sequence
    // (d_i = (c_i - p1*v1_i) - p2*v2_i, s += d_i*d_i ascending) is
    // bit-identical to the oracle's.
    Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), centered.as("c"))
      .select(col("vec_id"),
        aggregate(
          col("c"),
          struct(lit(0.0).as("s"),
            proj(col("c"), v1).as("p1"), proj(col("c"), v2).as("p2"),
            lit(0).as("i")),
          (acc, ci) => {
            val d = (ci - acc.getField("p1") *
                element_at(v1l, acc.getField("i") + 1)) -
              acc.getField("p2") * element_at(v2l, acc.getField("i") + 1)
            struct((acc.getField("s") + d * d).as("s"),
              acc.getField("p1").as("p1"), acc.getField("p2").as("p2"),
              (acc.getField("i") + lit(1)).as("i"))
          },
          acc => acc.getField("s")).as("resid"))
  }

  /** The shared oracle scaffolding: exact integer moments, the double
    * cov/mu derivation, and the `Iters`-step power iteration as a
    * recursive CTE over LIST(DOUBLE) state (left folds via list_reduce
    * on a 0.0 prepend, matching the Scala loops term for term).
    */
  private def eigCte: String =
    s"""q AS MATERIALIZED (
          SELECT vec_id, i,
            CAST(round(CAST(embedding[i] AS DOUBLE) * $Scale) AS BIGINT) AS qx
          FROM embeddings, range(1, ${Dim + 1}) t(i)),
        n AS MATERIALIZED (SELECT count(*) AS n FROM embeddings),
        s AS MATERIALIZED (
          SELECT list(sv ORDER BY i) AS s FROM (
            SELECT i, CAST(sum(qx) AS BIGINT) AS sv FROM q GROUP BY i)),
        mu AS MATERIALIZED (
          SELECT list_transform(s, sv ->
            CAST(sv AS DOUBLE) / $Scale / CAST(n AS DOUBLE)) AS mu
          FROM s, n),
        covm AS MATERIALIZED (
          SELECT list(rowv ORDER BY i) AS c FROM (
            SELECT a_i AS i, list(cv ORDER BY j) AS rowv FROM (
              SELECT a.i AS a_i, b.i AS j,
                CAST(sum(a.qx * b.qx) AS DOUBLE) / ${Scale * Scale} /
                  CAST(n AS DOUBLE) -
                  (CAST(sa.s[a.i] AS DOUBLE) / $Scale / CAST(n AS DOUBLE)) *
                  (CAST(sb.s[b.i] AS DOUBLE) / $Scale / CAST(n AS DOUBLE))
                  AS cv
              FROM q a JOIN q b USING (vec_id), n, s sa, s sb
              GROUP BY a.i, b.i, n.n, sa.s, sb.s)
            GROUP BY a_i)),
        it AS (
          SELECT 0 AS k,
            list_transform(range(1, ${Dim + 1}),
              i -> CAST(0.125 AS DOUBLE)) AS v
          UNION ALL
          SELECT k + 1,
            list_transform(w, e -> e / nrm) AS v
          FROM (
            SELECT k, w,
              sqrt(list_reduce(list_prepend(0.0,
                list_transform(w, e -> e * e)), (acc, e) -> acc + e)) AS nrm
            FROM (
              SELECT it.k AS k,
                list_transform(range(1, ${Dim + 1}), i ->
                  list_reduce(list_prepend(0.0,
                    list_transform(range(1, ${Dim + 1}), j ->
                      c[i][j] * v[j])), (acc, e) -> acc + e)) AS w
              FROM it, covm WHERE it.k < $Iters))),
        fin1 AS MATERIALIZED (SELECT v FROM it WHERE k = $Iters),
        lam1 AS MATERIALIZED (
          SELECT v, list_reduce(list_prepend(0.0,
            list_transform(range(1, ${Dim + 1}), i -> v[i] * w[i])),
            (acc, e) -> acc + e) AS eigval
          FROM (
            SELECT v, list_transform(range(1, ${Dim + 1}), i ->
              list_reduce(list_prepend(0.0,
                list_transform(range(1, ${Dim + 1}), j ->
                  c[i][j] * v[j])), (acc, e) -> acc + e)) AS w
            FROM fin1, covm)),
        covm2 AS MATERIALIZED (
          SELECT list_transform(range(1, ${Dim + 1}), i ->
            list_transform(range(1, ${Dim + 1}), j ->
              c[i][j] - eigval * v[i] * v[j])) AS c
          FROM covm, lam1),
        it2 AS (
          SELECT 0 AS k,
            list_transform(range(1, ${Dim + 1}),
              i -> CAST(0.125 AS DOUBLE)) AS v
          UNION ALL
          SELECT k + 1,
            list_transform(w, e -> e / nrm) AS v
          FROM (
            SELECT k, w,
              sqrt(list_reduce(list_prepend(0.0,
                list_transform(w, e -> e * e)), (acc, e) -> acc + e)) AS nrm
            FROM (
              SELECT it2.k AS k,
                list_transform(range(1, ${Dim + 1}), i ->
                  list_reduce(list_prepend(0.0,
                    list_transform(range(1, ${Dim + 1}), j ->
                      c[i][j] * v[j])), (acc, e) -> acc + e)) AS w
              FROM it2, covm2 WHERE it2.k < $Iters))),
        fin2 AS MATERIALIZED (SELECT v FROM it2 WHERE k = $Iters),
        lam2 AS MATERIALIZED (
          SELECT v, list_reduce(list_prepend(0.0,
            list_transform(range(1, ${Dim + 1}), i -> v[i] * w[i])),
            (acc, e) -> acc + e) AS eigval
          FROM (
            SELECT v, list_transform(range(1, ${Dim + 1}), i ->
              list_reduce(list_prepend(0.0,
                list_transform(range(1, ${Dim + 1}), j ->
                  c[i][j] * v[j])), (acc, e) -> acc + e)) AS w
            FROM fin2, covm2))"""

  def pcaComponentSql: String =
    s"""WITH RECURSIVE $eigCte
        SELECT i - 1 AS i, a.v[i] AS loading1, b.v[i] AS loading2,
          a.eigval AS eigval1, b.eigval AS eigval2
        FROM lam1 a, lam2 b, range(1, ${Dim + 1}) t(i)"""

  def pcaResidualSql: String =
    s"""WITH RECURSIVE $eigCte
        SELECT vec_id,
          list_reduce(list_prepend(0.0,
            list_transform(
              list_transform(range(1, ${Dim + 1}), i ->
                (c[i] - p1 * av[i]) - p2 * bv[i]),
              d -> d * d)),
            (acc, e) -> acc + e) AS resid
        FROM (
          SELECT vec_id, c, av, bv,
            list_reduce(list_prepend(0.0,
              list_transform(range(1, ${Dim + 1}), i -> c[i] * av[i])),
              (acc, e) -> acc + e) AS p1,
            list_reduce(list_prepend(0.0,
              list_transform(range(1, ${Dim + 1}), i -> c[i] * bv[i])),
              (acc, e) -> acc + e) AS p2
          FROM (
            SELECT vec_id,
              list_transform(range(1, ${Dim + 1}), i ->
                CAST(embedding[i] AS DOUBLE) - mu[i]) AS c,
              a.v AS av, b.v AS bv
            FROM embeddings, lam1 a, lam2 b, mu))"""

  def pcaProjectSql: String =
    s"""WITH RECURSIVE $eigCte
        SELECT vec_id,
          list_reduce(list_prepend(0.0,
            list_transform(range(1, ${Dim + 1}), i ->
              (CAST(embedding[i] AS DOUBLE) - mu[i]) * a.v[i])),
            (acc, e) -> acc + e) AS pc1,
          list_reduce(list_prepend(0.0,
            list_transform(range(1, ${Dim + 1}), i ->
              (CAST(embedding[i] AS DOUBLE) - mu[i]) * b.v[i])),
            (acc, e) -> acc + e) AS pc2
        FROM embeddings, lam1 a, lam2 b, mu"""
}
