package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline — the composition the
  * individual operators exist for: quality-gate the corpus, drop
  * duplicates (keep the canonical doc per content fingerprint), and
  * annotate survivors with language, token counts and fingerprint.
  *
  * Everything is a composition of the already-verified operators
  * ([[TextAnalysis]], [[Dedup]]) — one scan feeds all annotations, the
  * only shuffle is the dedup groupBy on the fingerprint, and the quality
  * gate prunes before it (filter-early). At 100 TB this is the shape of
  * a pre-training data pass: scan -> cheap per-doc features -> one
  * content-key shuffle -> curated output.
  */
object Curation {

  def curate(spark: SparkSession, sfDir: String): DataFrame = {
    val quality = TextAnalysis.quality(spark, sfDir)
      .select("doc_id", "n_words", "stopword_ratio", "quality_ok")
    val lang = TextAnalysis.langId(spark, sfDir)
      .select("doc_id", "lang_pred")
    val fp = TextAnalysis.fingerprint(spark, sfDir)
    val qualified = quality.filter(col("quality_ok") === 1)
      .join(fp, Seq("doc_id"))
      .join(lang, Seq("doc_id"))
    val canon = qualified.groupBy("fingerprint")
      .agg(min("doc_id").as("doc_id"))
    qualified.join(canon, Seq("fingerprint", "doc_id"))
      .select("doc_id", "fingerprint", "lang_pred", "n_words", "stopword_ratio")
  }

  val curateSql: String =
    s"""WITH q AS (SELECT doc_id, n_words, stopword_ratio, quality_ok
          FROM (${TextAnalysis.qualitySql})),
        l AS (SELECT doc_id, lang_pred FROM (${TextAnalysis.langIdSql})),
        f AS (${TextAnalysis.fingerprintSql}),
        qualified AS (
          SELECT q.doc_id, f.fingerprint, l.lang_pred, q.n_words,
            q.stopword_ratio
          FROM q JOIN f ON q.doc_id = f.doc_id
                 JOIN l ON q.doc_id = l.doc_id
          WHERE q.quality_ok = 1),
        canon AS (SELECT fingerprint, min(doc_id) AS doc_id
                  FROM qualified GROUP BY fingerprint)
        SELECT qualified.doc_id, qualified.fingerprint, lang_pred, n_words,
          stopword_ratio
        FROM qualified JOIN canon
          ON qualified.fingerprint = canon.fingerprint
         AND qualified.doc_id = canon.doc_id"""
}
