package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over the shared `documents` /
  * `embeddings` tables: deduplication (exact, MinHash+LSH, n-gram Jaccard,
  * SimHash), similarity search (brute-force + IVF), text analysis
  * (lang-id, quality, tokens, fingerprint), and multimodal binary-column
  * plumbing. SQL-expressible ops carry DuckDB oracles; constructions use
  * only functions whose arithmetic is identical in both engines (md5,
  * replace/length counting, integer DIV, float→double widening).
  */
object DataOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
  private def embs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  // ------------------------------------------------------------ dedup

  /** Exact dedup: hash-groupBy on normalized text; keeper = min doc_id.
    * Scale path: pure hash aggregation — one shuffle on the text hash,
    * map-side combined.
    */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(md5(lower(trim(col("text")))).as("text_key"), col("doc_id"))
      .groupBy("text_key")
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("copies"))
      .orderBy("text_key")

  val dedupExactSql: String =
    """SELECT md5(lower(trim(text))) AS text_key, min(doc_id) AS keeper_id,
      |  count(*) AS copies
      |FROM documents GROUP BY 1 ORDER BY text_key""".stripMargin

  /** Word 3-gram shingles of a document (distinct). */
  private def shingles(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), split(trim(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws)-3), " +
          "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")).as("sh"))
      .distinct()

  private val shinglesSql: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id,
      |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      |  FROM (
      |    SELECT doc_id, ws,
      |      unnest(generate_series(1, greatest(len(ws)-2, 0))) AS i
      |    FROM (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents))
      |)""".stripMargin

  /** MinHash signatures: 4 independent min-hashes over word 3-gram shingles
    * (hash = md5 with a per-band salt — identical hex in any engine). At
    * scale this is one map + one combinable min-aggregate per band.
    */
  def minhashSignatures(spark: SparkSession, sfDir: String): DataFrame =
    shingles(spark, sfDir)
      .groupBy("doc_id")
      .agg(
        min(md5(concat(lit("0|"), col("sh")))).as("s0"),
        (1 until 4).map(k =>
          min(md5(concat(lit(s"$k|"), col("sh")))).as(s"s$k")): _*)
      .orderBy("doc_id")

  val minhashSignaturesSql: String =
    shinglesSql +
      """
        |SELECT doc_id,
        |  min(md5('0|' || sh)) AS s0, min(md5('1|' || sh)) AS s1,
        |  min(md5('2|' || sh)) AS s2, min(md5('3|' || sh)) AS s3
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** MinHash LSH candidate pairs: docs sharing any of the 4 bands (four
    * equi-joins, NOT an OR-join — each is a shuffle/broadcast hash join, so
    * the plan scales; an OR condition would force a nested-loop O(n²)).
    */
  def minhashLshPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = minhashSignatures(spark, sfDir)
    val pairs = (0 until 4).map { k =>
      val a = sig.select(col("doc_id").as("doc_a"), col(s"s$k").as("band"))
      val b = sig.select(col("doc_id").as("doc_b"), col(s"s$k").as("band"))
      a.join(b, Seq("band")).filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
    }.reduce(_ unionAll _)
    pairs.distinct().orderBy("doc_a", "doc_b")
  }

  val minhashLshPairsSql: String =
    shinglesSql + """,
      |sig AS (
      |  SELECT doc_id,
      |    min(md5('0|' || sh)) AS s0, min(md5('1|' || sh)) AS s1,
      |    min(md5('2|' || sh)) AS s2, min(md5('3|' || sh)) AS s3
      |  FROM sh GROUP BY doc_id)
      |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      |  AND (a.s0 = b.s0 OR a.s1 = b.s1 OR a.s2 = b.s2 OR a.s3 = b.s3)
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Exact n-gram Jaccard similarity (basis points) between consecutive doc
    * pairs — the verify stage after LSH candidate generation. Integer
    * arithmetic end-to-end (exact cross-engine).
    */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = shingles(spark, sfDir)
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("b.doc_id") === col("a.doc_id") + 1 && col("b.sh") === col("a.sh"))
      .groupBy(col("a.doc_id").as("doc_a"))
      .agg(count(lit(1)).as("i"))
    cnt.as("c1")
      .join(cnt.as("c2"), col("c2.doc_id") === col("c1.doc_id") + 1)
      .join(inter, col("doc_a") === col("c1.doc_id"), "left")
      .select(
        col("c1.doc_id").as("doc_a"),
        col("c2.doc_id").as("doc_b"),
        expr("(coalesce(i, 0) * 10000) DIV (c1.n + c2.n - coalesce(i, 0))")
          .as("jaccard_bp"))
      .orderBy("doc_a")
  }

  val ngramJaccardSql: String =
    shinglesSql + """,
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, count(*) AS i
      |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1 AND b.sh = a.sh
      |  GROUP BY a.doc_id)
      |SELECT c1.doc_id AS doc_a, c2.doc_id AS doc_b,
      |  (coalesce(i, 0) * 10000) // (c1.n + c2.n - coalesce(i, 0)) AS jaccard_bp
      |FROM cnt c1 JOIN cnt c2 ON c2.doc_id = c1.doc_id + 1
      |LEFT JOIN inter ON inter.doc_a = c1.doc_id
      |ORDER BY doc_a""".stripMargin

  /** SimHash (64-bit, word unigrams): per-bit majority vote over md5-derived
    * word hashes. Spark-only construction (bit algebra has no cheap
    * DuckDB-identical form) → rows-only driver check.
    */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val words = docs(spark, sfDir)
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("w"))
    // 60-bit hash of each word: first 15 hex chars of md5, base-16 → long
    val hashed = words.withColumn("h60",
      conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long"))
    val bitCols = (0 until 60).map(b =>
      sum(when(expr(s"(h60 DIV ${1L << b}) % 2") =!= 0, 1).otherwise(-1)).as(s"b$b"))
    val voted = hashed.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    val sig = (0 until 60).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    voted.select(col("doc_id"), sig.as("simhash60"))
      .withColumn("band", expr("simhash60 % 1024")) // LSH band for bucketing
      .orderBy("doc_id")
  }

  // ------------------------------------------------- similarity search

  /** Embeddings quantized to integer milli-units: float32→double widening
    * and floor(x*1000+0.5) are bit-identical in any engine, making the dot
    * product exact integer arithmetic (cross-engine verifiable).
    */
  private def quantized(spark: SparkSession, sfDir: String): DataFrame =
    embs(spark, sfDir).select(
      col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))")
        .as("q"))

  /** Brute-force top-20 by dot product against the query vector (vec_id 0).
    * Scale path: the query row broadcasts; score is a codegen'd
    * zip_with+aggregate over each partition; top-k = TakeOrdered.
    */
  def dotTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val q = quantized(spark, sfDir)
    val qv = q.filter(col("vec_id") === 0).select(col("q").as("qv"))
    q.crossJoin(broadcast(qv))
      .select(col("vec_id"), col("label"),
        expr("aggregate(zip_with(q, qv, (a, b) -> a * b), CAST(0 AS BIGINT), (acc, x) -> acc + x)")
          .as("dot"))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(20)
  }

  val dotTopKSql: String =
    """WITH qv AS (
      |  SELECT i, CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qx
      |  FROM (SELECT embedding,
      |          unnest(generate_series(1, len(embedding))) AS i
      |        FROM embeddings WHERE vec_id = 0)),
      |ev AS (
      |  SELECT vec_id, label, i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS ex
      |  FROM (SELECT vec_id, label, embedding,
      |          unnest(generate_series(1, len(embedding))) AS i
      |        FROM embeddings))
      |SELECT vec_id, label, CAST(sum(ex * qx) AS BIGINT) AS dot
      |FROM ev JOIN qv USING (i)
      |GROUP BY vec_id, label
      |ORDER BY dot DESC, vec_id LIMIT 20""".stripMargin

  /** IVF-style ANN: coarse quantizer = `label` clusters; probe the 3
    * centroids nearest the query, then brute-force only within probed
    * clusters (~70% of distance computations skipped at nprobe=3/10; the
    * recall/cost trade of a classic IVF index). Spark-only (float centroid
    * averages aren't cross-engine exact) → rows-only driver check.
    */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val q = quantized(spark, sfDir)
    val qv = q.filter(col("vec_id") === 0).select(col("q").as("qv"))
    // centroids: per-label mean vector (kept integer: sum and count)
    val cents = q.groupBy("label").agg(
      expr("aggregate(collect_list(q), cast(array() as array<bigint>), " +
        "(acc, v) -> CASE WHEN size(acc) = 0 THEN v ELSE zip_with(acc, v, (a, b) -> a + b) END)")
        .as("sumv"),
      count(lit(1)).as("n"))
    val probed = cents.crossJoin(broadcast(qv))
      .select(col("label"),
        expr("aggregate(zip_with(sumv, qv, (a, b) -> a * b), CAST(0 AS BIGINT), (acc, x) -> acc + x) DIV n")
          .as("cdot"))
      .orderBy(col("cdot").desc, col("label"))
      .limit(3)
      .select("label")
    q.join(broadcast(probed), "label")
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("label"),
        expr("aggregate(zip_with(q, qv, (a, b) -> a * b), CAST(0 AS BIGINT), (acc, x) -> acc + x)")
          .as("dot"))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(20)
  }

  /** Embedding-cosine near-duplicate detection, scale path: random-
    * hyperplane sign-LSH (16 deterministic pseudo-hyperplanes from the
    * dimension index) buckets candidates, then exact integer-dot cosine²
    * verifies within buckets — candidate generation is an equi-join on the
    * band, never an O(n²) cross join. Spark-only (float thresholding) →
    * rows-only driver check.
    */
  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val q = quantized(spark, sfDir)
    // sign bit b_k = sign(sum_i v[i] * h(k, i)); h = deterministic ±1 from
    // (k * 131 + i) — a fixed pseudo-random hyperplane, same for every row
    val sig = q.withColumn("band", expr(
      (0 until 16).map { k =>
        s"(CASE WHEN aggregate(zip_with(q, transform(sequence(0, size(q)-1), " +
          s"i -> CAST(1 - 2 * (hash(${k * 131} + i) & 1) AS BIGINT)), " +
          s"(a, b) -> a * b), CAST(0 AS BIGINT), (acc, x) -> acc + x) >= 0 " +
          s"THEN ${1 << k} ELSE 0 END)"
      }.mkString(" + ")))
    val a = sig.select(col("vec_id").as("id_a"), col("q").as("qa"), col("band"))
    val b = sig.select(col("vec_id").as("id_b"), col("q").as("qb"), col("band"))
    a.join(b, Seq("band")).filter(col("id_a") < col("id_b"))
      .withColumn("dot", expr(
        "aggregate(zip_with(qa, qb, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .withColumn("na2", expr(
        "aggregate(transform(qa, x -> x * x), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .withColumn("nb2", expr(
        "aggregate(transform(qb, x -> x * x), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      // cosine² ≥ 0.8² without any float sqrt: dot² * 10000 ≥ 6400 * na² * nb²
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * 10000 >= lit(6400) * col("na2") * col("nb2"))
      .select("id_a", "id_b", "dot")
      .orderBy("id_a", "id_b")
  }

  // ------------------------------------------------------ text analysis

  private def occurrences(textCol: String, needle: String) = {
    val t = concat(lit(" "), col(textCol), lit(" "))
    (length(t) - length(regexp_replace(t, java.util.regex.Pattern.quote(needle), ""))) / needle.length
  }

  /** Language-ID by stopword-marker frequency (n-gram heuristic). The
    * argmax is a fixed-order CASE over greatest() — deterministic ties.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val markers = Seq("en" -> " the ", "es" -> " el ", "de" -> " der ", "fr" -> " le ")
    val scored = markers.foldLeft(docs(spark, sfDir)) { case (df, (l, m)) =>
      df.withColumn(s"s_$l",
        ((length(concat(lit(" "), col("text"), lit(" "))) -
          length(regexp_replace(concat(lit(" "), col("text"), lit(" ")),
            java.util.regex.Pattern.quote(m), ""))) / m.length).cast("long"))
    }
    val g = greatest(col("s_en"), col("s_es"), col("s_de"), col("s_fr"))
    scored.select(
      col("doc_id"), col("lang").as("labeled_lang"),
      col("s_en"), col("s_es"), col("s_de"), col("s_fr"),
      when(g === 0, "und")
        .when(col("s_en") === g, "en").when(col("s_es") === g, "es")
        .when(col("s_de") === g, "de").otherwise("fr").as("predicted_lang"))
      .orderBy("doc_id")
  }

  val langIdSql: String =
    """WITH s AS (
      |  SELECT doc_id, lang AS labeled_lang,
      |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) // 5 AS s_en,
      |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' el ', ''))) // 4 AS s_es,
      |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' der ', ''))) // 5 AS s_de,
      |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' le ', ''))) // 4 AS s_fr
      |  FROM documents)
      |SELECT doc_id, labeled_lang, s_en, s_es, s_de, s_fr,
      |  CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
      |    WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
      |    WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
      |    WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
      |    ELSE 'fr' END AS predicted_lang
      |FROM s ORDER BY doc_id""".stripMargin

  /** Token counting: whitespace words + a BPE-ish chars/4 estimate. */
  def textTokens(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("chars"),
      (length(trim(col("text"))) -
        length(regexp_replace(trim(col("text")), " ", "")) + 1)
        .cast("long").as("words"),
      expr("(length(text) + 3) DIV 4").as("bpe_est"))
      .orderBy("doc_id")

  val textTokensSql: String =
    """SELECT doc_id, length(text) AS chars,
      |  (length(trim(text)) - length(replace(trim(text), ' ', '')) + 1) AS words,
      |  (length(text) + 3) // 4 AS bpe_est
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality scoring: length / avg word length / stopword ratio, integer
    * fixed-point (×1000) so the arithmetic is cross-engine exact.
    */
  def textQuality(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .withColumn("t", trim(col("text")))
      .withColumn("chars", length(col("t")).cast("long"))
      .withColumn("spaces",
        (length(col("t")) - length(regexp_replace(col("t"), " ", ""))).cast("long"))
      .withColumn("words", col("spaces") + 1)
      .withColumn("stops",
        ((length(concat(lit(" "), col("t"), lit(" "))) -
          length(regexp_replace(concat(lit(" "), col("t"), lit(" ")), " the ", ""))) / 5)
          .cast("long"))
      .select(
        col("doc_id"), col("chars"), col("words"),
        expr("((chars - spaces) * 1000) DIV words").as("avg_word_len_milli"),
        expr("(stops * 1000) DIV words").as("stopword_ratio_milli"),
        (col("chars").between(100, 4000) && col("words") >= 20).as("passes_quality"))
      .orderBy("doc_id")

  val textQualitySql: String =
    """WITH s AS (
      |  SELECT doc_id, trim(text) AS t,
      |    length(trim(text)) AS chars,
      |    length(trim(text)) - length(replace(trim(text), ' ', '')) AS spaces,
      |    (length(' ' || trim(text) || ' ') -
      |     length(replace(' ' || trim(text) || ' ', ' the ', ''))) // 5 AS stops
      |  FROM documents)
      |SELECT doc_id, chars, spaces + 1 AS words,
      |  ((chars - spaces) * 1000) // (spaces + 1) AS avg_word_len_milli,
      |  (stops * 1000) // (spaces + 1) AS stopword_ratio_milli,
      |  (chars BETWEEN 100 AND 4000 AND spaces + 1 >= 20) AS passes_quality
      |FROM s ORDER BY doc_id""".stripMargin

  /** Document fingerprinting: content hash + routing bucket. */
  def textFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      md5(lower(trim(col("text")))).as("fingerprint"),
      substring(md5(lower(trim(col("text")))), 1, 2).as("shard"))
      .orderBy("doc_id")

  val textFingerprintSql: String =
    """SELECT doc_id, md5(lower(trim(text))) AS fingerprint,
      |  substr(md5(lower(trim(text))), 1, 2) AS shard
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Multimodal plumbing: treat content as an opaque binary column with
    * typed metadata. The decode step is a clearly-marked deterministic STUB
    * (no image/audio codecs in this container); the Spark-side plumbing —
    * binary column, schema, batch shape — is real. In production the stub
    * body is replaced by a real codec inside the same mapPartitions.
    */
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val payloads = docs(spark, sfDir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"), // opaque binary content
      col("source"))
    payloads.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("bytes"),
      // STUB decode: deterministic fake metadata derived from byte length.
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      (length(col("payload")) % 640).cast("int").as("width"),
      ((length(col("payload")) * 7) % 480).cast("int").as("height"),
      (length(col("payload")) % 30 + 1).cast("int").as("frames"))
      .orderBy("doc_id")
  }

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS bytes,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |    ELSE 'video' END AS kind,
      |  CAST(octet_length(encode(text)) % 640 AS INT) AS width,
      |  CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height,
      |  CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS frames
      |FROM documents ORDER BY doc_id""".stripMargin
}
