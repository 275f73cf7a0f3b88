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

  // Result frames of the LSH-style ops stay persisted when returned (the
  // caller consumes a materialized plan whose cached intermediates are
  // already released). They are LEASED: registered here and unpersisted at
  // the next leasing-op invocation or an explicit releaseLeases() — so a
  // long session holds at most the last result's cache, not one entry per
  // past invocation (the round-3 ADVICE leak).
  private val leased =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  private def lease(df: DataFrame): DataFrame = { leased.add(df); df }

  /** Unpersist every previously returned (leased) result frame. */
  def releaseLeases(): Unit = {
    var df = leased.poll()
    while (df != null) { df.unpersist(); df = leased.poll() }
  }

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    graft.model.SessionTuning.tune(spark)
      .read.parquet(s"$sfDir/documents.parquet")
  private def embs(spark: SparkSession, sfDir: String): DataFrame =
    graft.model.SessionTuning.tune(spark)
      .read.parquet(s"$sfDir/embeddings.parquet")

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

  /** MinHash signatures from a shingle table (doc_id, sh): 8 independent
    * min-hashes (hash = md5 with a per-hash salt — identical hex in any
    * engine). At scale this is one map + one combinable min-aggregate per
    * hash.
    */
  private def signaturesFrom(sh: DataFrame): DataFrame =
    sh.groupBy("doc_id")
      .agg(
        min(md5(concat(lit("0|"), col("sh")))).as("s0"),
        (1 until 8).map(k =>
          min(md5(concat(lit(s"$k|"), col("sh")))).as(s"s$k")): _*)

  def minhashSignatures(spark: SparkSession, sfDir: String): DataFrame =
    signaturesFrom(shingles(spark, sfDir)).orderBy("doc_id")

  private val sigSelectSql: String =
    "SELECT doc_id,\n" +
      (0 until 8).map(k => s"    min(md5('$k|' || sh)) AS s$k")
        .mkString(",\n") +
      "\n  FROM sh GROUP BY doc_id"

  val minhashSignaturesSql: String =
    shinglesSql + "\n" + sigSelectSql + " ORDER BY doc_id"

  /** MinHash LSH candidate pairs: 4 bands of r=2 rows (band value = the
    * concatenated pair of min-hashes; P(candidate) = 1-(1-J²)⁴, so sharing
    * a single min-shingle no longer floods the candidate set the way the
    * old r=1 banding did). The plan is ONE exploded self-equi-join on
    * (band_idx, band_value) — a shuffle hash join that scales, never an
    * O(n²) OR-join — and the signature subtree is persisted so it is
    * computed exactly once, not once per band.
    */
  /** Candidate pairs from a shingle table. The banded subtree is persisted
    * only for the duration of the self-join: the (small) pair result is
    * materialized and cached, then the intermediate is unpersisted — round
    * 2 leaked one cached subtree per invocation across a long session.
    */
  private def lshPairsFrom(sh: DataFrame): DataFrame = {
    val bands = signaturesFrom(sh).select(
      col("doc_id"),
      explode(array((0 until 4).map(k => struct(
        lit(k).as("k"),
        concat(col(s"s${2 * k}"), col(s"s${2 * k + 1}")).as("v"))): _*)).as("b"))
      .select(col("doc_id"), col("b.k").as("k"), col("b.v").as("v"))
      .persist()
    val a = bands.select(col("doc_id").as("doc_a"), col("k"), col("v"))
    val b = bands.select(col("doc_id").as("doc_b"), col("k"), col("v"))
    val out = a.join(b, Seq("k", "v")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct().orderBy("doc_a", "doc_b")
      .persist()
    out.count() // materialize while `bands` is still cached
    bands.unpersist()
    lease(out)
  }

  def minhashLshPairs(spark: SparkSession, sfDir: String): DataFrame = {
    releaseLeases()
    // no sh persist here: unlike ngramJaccard/clusterAssignments, the
    // shingle subtree has exactly one consumer (the banded signatures),
    // so caching it is pure materialization overhead
    lshPairsFrom(shingles(spark, sfDir))
  }

  private val lshPairsCoreSql: String =
    shinglesSql + ",\nsig AS (\n  " + sigSelectSql + """),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
      |    (a.s0 = b.s0 AND a.s1 = b.s1) OR (a.s2 = b.s2 AND a.s3 = b.s3) OR
      |    (a.s4 = b.s4 AND a.s5 = b.s5) OR (a.s6 = b.s6 AND a.s7 = b.s7))
      |)""".stripMargin

  val minhashLshPairsSql: String =
    lshPairsCoreSql + "\nSELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b"

  /** Exact n-gram Jaccard similarity (basis points) over the LSH CANDIDATE
    * pairs — the verify stage consuming [[minhashLshPairs]] output, as in a
    * real dedup pipeline (candidates → exact check → keep/drop). Integer
    * arithmetic end-to-end (exact cross-engine); the intersection join
    * shuffles on (pair, shingle) — still an equi-join, never O(n²).
    */
  /** Exact n-gram Jaccard (basis points) of LSH candidate `pairs` over the
    * shingle table `sh` — the shared verify core of [[ngramJaccard]] and
    * the clustering subtree; no materialization here, callers decide.
    * `cnt` is pre-filtered to documents that actually appear in a pair
    * (guide §3.2: reduce the big side before aggregating/joining it —
    * candidates are a vanishing fraction of the corpus, so counting every
    * document's shingles would be ~all wasted work at scale).
    */
  private def jaccardFrom(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val pairDocs = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val cnt = sh.join(pairDocs, Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sh.as("b"),
        col("doc_b") === col("b.doc_id") && col("a.sh") === col("b.sh"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"))
    pairs
      .join(cnt.as("c1"), col("doc_a") === col("c1.doc_id"))
      .join(cnt.as("c2"), col("doc_b") === col("c2.doc_id"))
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .select(
        col("doc_a"), col("doc_b"),
        expr("(coalesce(i, 0) * 10000) DIV (c1.n + c2.n - coalesce(i, 0))")
          .as("jaccard_bp"))
  }

  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    releaseLeases()
    // ONE shingle subtree shared by the candidate generator and the exact
    // verify (round 2 computed it twice: once inside minhashLshPairs, once
    // here), persisted for the run and released before returning.
    val sh = shingles(spark, sfDir).persist()
    try {
      val pairs = lshPairsFrom(sh)
      val out = jaccardFrom(pairs, sh)
        .orderBy("doc_a", "doc_b")
        .persist()
      out.count()
      pairs.unpersist()
      lease(out)
    } finally {
      sh.unpersist()
      ()
    }
  }

  /** CTE chain ending in `jac(doc_a, doc_b, jaccard_bp)` — shared by the
    * pairwise oracle below and the clustering oracle.
    */
  private val ngramJaccardCoreSql: String =
    lshPairsCoreSql + """,
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT doc_a, doc_b, count(*) AS i
      |  FROM cand
      |  JOIN sh a ON a.doc_id = doc_a
      |  JOIN sh b ON b.doc_id = doc_b AND b.sh = a.sh
      |  GROUP BY doc_a, doc_b),
      |jac AS (
      |  SELECT doc_a, doc_b,
      |    (coalesce(i, 0) * 10000) // (c1.n + c2.n - coalesce(i, 0)) AS jaccard_bp
      |  FROM cand
      |  JOIN cnt c1 ON c1.doc_id = doc_a
      |  JOIN cnt c2 ON c2.doc_id = doc_b
      |  LEFT JOIN inter USING (doc_a, doc_b))""".stripMargin

  val ngramJaccardSql: String =
    ngramJaccardCoreSql +
      "\nSELECT doc_a, doc_b, jaccard_bp FROM jac ORDER BY doc_a, doc_b"

  /** Near-duplicate CLUSTERING: connected components over the verified
    * near-dup graph (LSH candidates → exact Jaccard ≥ 0.8), component
    * label = min doc_id. This is the step that turns pair-finding into a
    * dedup decision at corpus scale: keep `cluster_id == doc_id`, drop the
    * rest — and it must be transitive (a≈b, b≈c ⇒ one cluster) even when
    * the a–c edge was never scored, which no pairwise op provides.
    *
    * Scale path: min-label propagation with pointer jumping
    * ([[connectedComponents]]) — O(log diameter) rounds, each one shuffle
    * equi-join + min-aggregate over the label frame. Only vertices that
    * appear in an edge iterate — the vast singleton majority joins in once
    * at the end — so per-round work is O(near-dup docs), not O(corpus).
    * Reference point: dbmazz has no corpus-dedup stage; the construction
    * follows the public MapReduce-CC literature (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14).
    */
  /** Every doc's near-dup cluster label (singletons label themselves):
    * the verified-pair graph's connected components, left-joined back over
    * the corpus — shared by [[dedupCluster]] and [[dedupKeepBest]].
    * NOTE: runs ngramJaccard, which releases prior leases.
    */
  private def clusterAssignments(spark: SparkSession, sfDir: String): DataFrame = {
    releaseLeases()
    val sh = shingles(spark, sfDir).persist()
    try {
      val pairs = lshPairsFrom(sh)
      // the verified edge set is consumed exactly once (the CC edges
      // checkpoint materializes it immediately, while sh/pairs are still
      // cached), so unlike the standalone ngramJaccard query there is no
      // extra persist+count round here
      val verified = jaccardFrom(pairs, sh)
        .filter(col("jaccard_bp") >= 8000)
        .select(col("doc_a"), col("doc_b"))
      val labels = connectedComponents(verified)
      docs(spark, sfDir).select(col("doc_id"), col("n_chars"))
        .join(labels.withColumnRenamed("cluster_id", "cid"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("cid"), col("doc_id")).as("cluster_id"),
          col("n_chars"))
    } finally {
      sh.unpersist()
      ()
    }
  }

  def dedupCluster(spark: SparkSession, sfDir: String): DataFrame =
    clusterAssignments(spark, sfDir)
      .select("doc_id", "cluster_id")
      .withColumn("cluster_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
      .orderBy("doc_id")

  /** Keep-best dedup: within each near-dup cluster keep the HIGHEST-
    * quality doc (longest content, doc_id as the deterministic tiebreak) —
    * production dedup keeps best, not first. One window over the
    * cluster-labeled corpus on top of the clustering subtree; emits one
    * row per cluster with the keeper and what it beat.
    */
  def dedupKeepBest(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
    clusterAssignments(spark, sfDir)
      .withColumn("rn", row_number().over(
        w.orderBy(col("n_chars").desc, col("doc_id"))))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("keeper_id"),
        col("cluster_size"), col("n_chars").as("keeper_chars"))
      .orderBy("cluster_id")
  }

  /** Connected components of the undirected graph given as `(doc_a, doc_b)`
    * pairs: returns `(doc_id, cluster_id)` for every vertex that appears in
    * an edge, with `cluster_id` = the component's minimum vertex id. Each
    * round eagerly checkpoints the label frame, keeping plan lineage O(1)
    * in rounds (on a cluster, point `setCheckpointDir` at durable storage
    * and swap `localCheckpoint` for `checkpoint`); the per-round
    * convergence check is a single scalar agg over the materialized
    * checkpoint — the only driver-side read.
    */
  private[graft] def connectedComponents(pairs: DataFrame): DataFrame = {
    // both edge orientations from ONE pass over `pairs` (explode, not
    // union-of-two-selects: a union references the pair subtree twice and
    // recomputes it when the caller hands in an un-cached plan)
    val edges = pairs.select(explode(array(
      struct(col("doc_a").as("src"), col("doc_b").as("dst")),
      struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint(true)
    // Round-1 seed: the labels after one neighbor-min step come straight
    // from ONE aggregation over the edge list — label(v) = min(v, min
    // neighbor) — replacing the identity-label distinct checkpoint plus a
    // first-round join against it (3-4 micro-jobs per invocation at bench
    // scale; one fewer shuffle at any scale). `old_id` is the identity
    // label, so round-1 change detection is exactly the original's.
    var stepped = edges.groupBy("src").agg(min("dst").as("m"))
      .select(col("src").as("doc_id"), col("src").as("old_id"),
        least(col("src"), col("m")).as("cluster_id"))
      .localCheckpoint(true)
    // the checkpointed frame whose blocks back `stepped`/`labels` —
    // superseded frames are unpersisted as soon as the next checkpoint
    // materializes, so storage stays O(1) rounds, not O(rounds)
    // (ContextCleaner would only reclaim them after a driver GC)
    var live: DataFrame = stepped
    var labels: DataFrame = stepped.select("doc_id", "cluster_id")
    val maxRounds = 25
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // Each round: (1) neighbor-min — one shuffle equi-join + map-side-
      // combined min-aggregate (round 1: the seed aggregation above); (2)
      // pointer jumping — labels are vertex ids, so a self-join reads each
      // vertex's LABEL'S label (path halving). (1) alone converges in
      // O(diameter) rounds — a chain-shaped component of length L
      // (templated docs with gradual drift) would need L rounds; with (2)
      // the round count is O(log diameter), which is what survives
      // adversarial shapes at corpus scale. Labels only ever decrease and
      // stay inside their component, so the fixpoint is still the
      // component minimum, and new < old ⇔ changed — the change flag
      // rides INSIDE the checkpointed frame and convergence costs one
      // scalar agg over the materialized checkpoint, not a join of
      // consecutive label frames.
      val next = stepped.as("a")
        .join(stepped.select(col("doc_id").as("jd"), col("cluster_id").as("jc"))
          .as("b"), col("a.cluster_id") === col("jd"), "left")
        .select(col("a.doc_id").as("doc_id"),
          least(col("a.cluster_id"),
            coalesce(col("jc"), col("a.cluster_id"))).as("cluster_id"),
          (least(col("a.cluster_id"), coalesce(col("jc"), col("a.cluster_id")))
            < col("a.old_id")).cast("long").as("_chg"))
        .localCheckpoint(true)
      live.unpersist() // next is materialized; stepped's blocks are dead
      val changed = Option(next.agg(sum("_chg")).first().get(0))
        .fold(0L)(_.asInstanceOf[Long])
      labels = next.select("doc_id", "cluster_id")
      live = next
      converged = changed == 0
      round += 1
      if (!converged && round < maxRounds) {
        val nbrMin = edges
          .join(labels, edges("dst") === labels("doc_id"))
          .groupBy("src").agg(min("cluster_id").as("nbr_min"))
        stepped = labels.as("l")
          .join(nbrMin, col("l.doc_id") === col("src"), "left")
          .select(col("l.doc_id").as("doc_id"), col("l.cluster_id").as("old_id"),
            least(col("l.cluster_id"),
              coalesce(col("nbr_min"), col("l.cluster_id"))).as("cluster_id"))
          .localCheckpoint(true)
        live.unpersist() // stepped is materialized; next's blocks are dead
        live = stepped
      }
    }
    require(converged,
      s"connectedComponents: labels not stable after $maxRounds rounds")
    edges.unpersist() // the returned labels read only the last checkpoint
    lease(live)       // released once the caller's next leasing op runs
    labels
  }

  /** DuckDB oracle: same verified edge set, components via a recursive
    * reachability closure (min over the reachable set of an undirected
    * graph = the component minimum). Exact-integer throughout.
    */
  /** Shared recursive-closure CTE chain ending in `lab(doc_id, cluster_id)`
    * over every document — the oracle mirror of [[clusterAssignments]].
    */
  private lazy val clusterLabSql: String =
    (ngramJaccardCoreSql + """,
      |edges AS (
      |  SELECT doc_a AS a, doc_b AS b FROM jac WHERE jaccard_bp >= 8000
      |  UNION
      |  SELECT doc_b AS a, doc_a AS b FROM jac WHERE jaccard_bp >= 8000),
      |reach AS (
      |  SELECT doc_id AS src, doc_id AS dst FROM documents
      |  UNION
      |  SELECT r.src, e.b AS dst FROM reach r JOIN edges e ON e.a = r.dst),
      |lab AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY 1)""".stripMargin)
      .stripPrefix("WITH")

  val dedupClusterSql: String =
    "WITH RECURSIVE" + clusterLabSql + """
      |SELECT doc_id, cluster_id,
      |  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
      |FROM lab ORDER BY doc_id""".stripMargin

  val dedupKeepBestSql: String =
    "WITH RECURSIVE" + clusterLabSql + """,
      |asg AS (
      |  SELECT l.doc_id, l.cluster_id, d.n_chars
      |  FROM lab l JOIN documents d ON d.doc_id = l.doc_id),
      |rk AS (
      |  SELECT cluster_id, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY cluster_id
      |      ORDER BY n_chars DESC, doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
      |  FROM asg)
      |SELECT cluster_id, doc_id AS keeper_id,
      |  CAST(cluster_size AS BIGINT) AS cluster_size,
      |  CAST(n_chars AS BIGINT) AS keeper_chars
      |FROM rk WHERE rn = 1 ORDER BY cluster_id""".stripMargin

  /** SimHash (60-bit, word unigrams): per-bit majority vote over md5-derived
    * word hashes. The bit algebra is integer-exact, so the DuckDB oracle
    * reconstructs the same hash by parsing md5 hex digits positionally.
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

  /** Same construction in DuckDB: h60 = positional parse of the first 15
    * md5 hex digits (Σ digit(p)·16^(14-p) — what Spark's conv(,16,10)
    * computes), then per-bit ±1 majority sums and bit reassembly.
    */
  val simhashSql: String = {
    val h60 = (0 until 15).map { p =>
      s"(strpos('0123456789abcdef', substr(md5(w), ${p + 1}, 1)) - 1) * " +
        s"CAST(${1L << (4 * (14 - p))} AS BIGINT)"
    }.mkString(" + ")
    val votes = (0 until 60).map(b =>
      s"    sum(CASE WHEN (h60 >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(",\n")
    val sig = (0 until 60).map(b =>
      s"CASE WHEN b$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
       |  FROM documents),
       |h AS (SELECT doc_id, $h60 AS h60 FROM words),
       |v AS (
       |  SELECT doc_id,
       |$votes
       |  FROM h GROUP BY doc_id),
       |s AS (SELECT doc_id, CAST($sig AS BIGINT) AS simhash60 FROM v)
       |SELECT doc_id, simhash60, simhash60 % 1024 AS band
       |FROM s ORDER BY doc_id""".stripMargin
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
    * recall/cost trade of a classic IVF index). Centroid sums come from
    * posexplode + per-(label, dim) aggregation — combinable scalar sums
    * that never hold a cluster's vectors in one buffer (collect_list of
    * whole vectors OOMs at millions of vectors per cluster); only the
    * 64-element (dim, sum) pairs per label are reassembled. All-integer
    * arithmetic → cross-engine exact, DuckDB oracle below.
    */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val q = quantized(spark, sfDir)
    val qv = q.filter(col("vec_id") === 0).select(col("q").as("qv"))
    val dimSums = q
      .select(col("label"), posexplode(col("q")).as(Seq("i", "x")))
      .groupBy("label", "i").agg(sum("x").as("sx"))
    val cents = dimSums.groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(i, sx))), s -> s.sx)")
        .as("sumv"))
      .join(q.groupBy("label").agg(count(lit(1)).as("n")), "label")
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

  /** Same IVF probe in DuckDB. Spark's `DIV` truncates toward zero while
    * DuckDB's `//` floors, so the centroid division emulates truncation
    * explicitly (cdot can be negative).
    */
  val annIvfSql: String =
    """WITH ev AS (
      |  SELECT vec_id, label, i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS ex
      |  FROM (SELECT vec_id, label, embedding,
      |          unnest(generate_series(1, len(embedding))) AS i
      |        FROM embeddings)),
      |qv AS (SELECT i, ex AS qx FROM ev WHERE vec_id = 0),
      |n_by_label AS (
      |  SELECT label, count(DISTINCT vec_id) AS n FROM ev GROUP BY label),
      |dim_sums AS (
      |  SELECT label, i, CAST(sum(ex) AS BIGINT) AS sx
      |  FROM ev GROUP BY label, i),
      |cent AS (
      |  SELECT d.label, CAST(sum(sx * qx) AS BIGINT) AS cnum
      |  FROM dim_sums d JOIN qv USING (i) GROUP BY d.label),
      |probe AS (
      |  SELECT c.label,
      |    CASE WHEN cnum >= 0 THEN cnum // n ELSE -((-cnum) // n) END AS cdot
      |  FROM cent c JOIN n_by_label USING (label)
      |  ORDER BY cdot DESC, label LIMIT 3)
      |SELECT vec_id, label, CAST(sum(ex * qx) AS BIGINT) AS dot
      |FROM ev JOIN qv USING (i)
      |WHERE label IN (SELECT label FROM probe)
      |GROUP BY vec_id, label
      |ORDER BY dot DESC, vec_id LIMIT 20""".stripMargin

  /** The 64 sign-LSH hyperplanes (8 bands × 8 bits): entry (j, i) is ±1
    * from the parity of the first md5 hex digit of "j|i" — reproducible in
    * any engine that has md5, so the oracle derives the identical matrix.
    */
  private lazy val hyperplanes: Seq[Seq[Long]] = {
    def sign(j: Int, i: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j|$i".getBytes("UTF-8"))
      if ((((d(0) >> 4) & 0xf) % 2) == 0) 1L else -1L
    }
    (0 until 64).map(j => (0 until 64).map(i => sign(j, i)))
  }

  /** Embedding-cosine near-duplicate detection, scale path: random-
    * hyperplane sign-LSH with 8 OR'd bands of 8 bits each (a single wide
    * band has ~(1−θ/π)^bits recall — ≈4% at cos 0.8 for 16 bits; OR'ing
    * bands restores it: 1−(1−p⁸)⁸ ≈ 0.94 at cos 0.9). Candidate
    * generation is ONE exploded self-equi-join on (band_idx, band_value) —
    * never an O(n²) cross join — then exact integer-dot cosine² verifies
    * each candidate. With |q| ≤ ~1000 and dim 64, dot ≤ 6.6e7 and
    * dot²·10⁴ ≤ 4.3e19… so the threshold compare is done in DECIMAL(38,0)
    * to stay exact at any data scale (DuckDB widens to HUGEINT the same
    * way).
    */
  /** Banded sign-LSH candidate pairs of a quantized vector table
    * (vec_id: long, q: array<bigint> milli-units), exactly scored:
    * `(id_a < id_b, dot, na2, nb2)`. ONE exploded self-equi-join on
    * (band_idx, band_value) — never O(n²) — shared by the near-dup
    * threshold filter and the k-NN join. Returned persisted + leased
    * (materialized before the band frame is released).
    */
  private def lshScoredCandidates(q: DataFrame): DataFrame = {
    val hcol = typedLit(hyperplanes)
    def bitDot(j: Int) =
      s"aggregate(zip_with(q, H[$j], (a, h) -> a * h), " +
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    val bandVal = (k: Int) => (0 until 8).map(b =>
      s"(CASE WHEN ${bitDot(k * 8 + b)} >= 0 THEN ${1 << b} ELSE 0 END)")
      .mkString(" + ")
    // one row per vector with its norm² computed ONCE (not per candidate
    // pair); the heavy q arrays live only here
    val qt = q.select(col("vec_id"), col("q"), expr(
      "aggregate(transform(q, x -> x * x), CAST(0 AS BIGINT), (acc, x) -> acc + x)")
      .as("n2"))
      .persist()
    // bands carry ONLY (vec_id, band_idx, band_value): the 64-element q
    // arrays stay out of the 8×-exploded self-join shuffle, and the
    // candidate distinct compares scalars instead of arrays (guide §8:
    // decide with small rows, move the heavy payload once)
    val bands = qt.withColumn("H", hcol)
      .select(col("vec_id"),
        explode(array((0 until 8).map(k =>
          struct(lit(k).as("k"), expr(bandVal(k)).as("v"))): _*)).as("b"))
      .select(col("vec_id"), col("b.k").as("k"), col("b.v").as("v"))
      .persist()
    val a = bands.select(col("vec_id").as("id_a"), col("k"), col("v"))
    val b = bands.select(col("vec_id").as("id_b"), col("k"), col("v"))
    val cand = a.join(b, Seq("k", "v")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // a pair may collide in several bands
    // re-attach vectors + norms to the (few) surviving candidates and
    // score exactly — two equi-joins against the vector table, each
    // moving q once
    val out = cand
      .join(qt.select(col("vec_id").as("id_a"), col("q").as("qa"),
        col("n2").as("na2")), Seq("id_a"))
      .join(qt.select(col("vec_id").as("id_b"), col("q").as("qb"),
        col("n2").as("nb2")), Seq("id_b"))
      .withColumn("dot", expr(
        "aggregate(zip_with(qa, qb, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .select("id_a", "id_b", "dot", "na2", "nb2")
      .persist()
    out.count() // materialize while `bands`/`qt` are still cached
    bands.unpersist()
    qt.unpersist()
    lease(out)
  }

  /** PURE operator: near-dup pairs of an already-quantized vector table.
    * Unlike round 2, the operator plants NOTHING — it is a function of its
    * input table only; test-fixture row planting lives in
    * [[embeddingNearDup]]'s data prep.
    */
  def embeddingNearDupPairs(q: DataFrame): DataFrame =
    lshScoredCandidates(q)
      // cosine² ≥ 0.8² without any float sqrt: dot² · 10⁴ ≥ 6400 · na² · nb²
      .filter(col("dot") > 0 && expr(
        "CAST(dot AS DECIMAL(38,0)) * dot * 10000 >= " +
          "CAST(6400 AS DECIMAL(38,0)) * na2 * nb2"))
      .select("id_a", "id_b", "dot")
      .orderBy("id_a", "id_b")

  /** Driver query = fixture prep + the pure operator. The synthetic corpus
    * has no true near-dups (max organic cosine ≈ 0.51), so the FIXTURE
    * plants a deterministic near-copy of every 10th vector (id + 100000,
    * integer perturbation in [-5, 5] per component → cos ≈ 0.9999): the
    * operator must find exactly these pairs. The perturbation is integer
    * arithmetic, so the oracle plants identical copies.
    */
  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    releaseLeases()
    val q0 = quantized(spark, sfDir)
    val planted = q0.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("label"),
        expr("transform(q, (x, i) -> x + ((vec_id * 31 + i * 7) % 11) - 5)")
          .as("q"))
    embeddingNearDupPairs(q0.unionByName(planted))
  }

  /** Shared DuckDB CTE chain over a caller-supplied `ev` (vec_id, i, ex):
    * hyperplane matrix from md5 parity → band values → banded candidate
    * pairs → exact dots + norms — the oracle mirror of
    * [[lshScoredCandidates]].
    */
  private def lshBandSql(evCtes: String): String =
    s"""WITH $evCtes,
      |hyp AS (
      |  SELECT k, i,
      |    CASE WHEN (strpos('0123456789abcdef',
      |      substr(md5(CAST(k AS VARCHAR) || '|' || CAST(i AS VARCHAR)), 1, 1))
      |      - 1) % 2 = 0 THEN 1 ELSE -1 END AS h
      |  FROM (SELECT unnest(generate_series(0, 63)) AS k) ks,
      |       (SELECT unnest(generate_series(0, 63)) AS i) "is"),
      |sg AS (
      |  SELECT vec_id, k // 8 AS band_k, k % 8 AS bit,
      |    CAST(sum(ex * h) AS BIGINT) >= 0 AS pos
      |  FROM ev JOIN hyp USING (i) GROUP BY vec_id, k),
      |bv AS (
      |  SELECT vec_id, band_k,
      |    CAST(sum(CASE WHEN pos THEN CAST(1 AS BIGINT) << bit ELSE 0 END)
      |      AS BIGINT) AS bval
      |  FROM sg GROUP BY vec_id, band_k),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM bv a JOIN bv b
      |    ON a.band_k = b.band_k AND a.bval = b.bval AND a.vec_id < b.vec_id),
      |dots AS (
      |  SELECT id_a, id_b, CAST(sum(ea.ex * eb.ex) AS BIGINT) AS dot
      |  FROM cand
      |  JOIN ev ea ON ea.vec_id = id_a
      |  JOIN ev eb ON eb.vec_id = id_b AND eb.i = ea.i
      |  GROUP BY id_a, id_b),
      |nrm AS (SELECT vec_id, CAST(sum(ex * ex) AS BIGINT) AS n2
      |        FROM ev GROUP BY vec_id)""".stripMargin

  private val quantizedEvSql: String =
    """ev0 AS (
      |  SELECT vec_id, i - 1 AS i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS ex
      |  FROM (SELECT vec_id, embedding,
      |          unnest(generate_series(1, len(embedding))) AS i
      |        FROM embeddings))""".stripMargin

  /** Same construction in DuckDB: the hyperplane matrix regenerates from
    * md5 parity, candidates from the banded self-join, verification in
    * HUGEINT (exact, like Spark's DECIMAL(38,0)).
    */
  val embeddingNearDupSql: String =
    lshBandSql(quantizedEvSql + """,
      |ev AS (
      |  SELECT * FROM ev0
      |  UNION ALL
      |  SELECT vec_id + 100000, i, ex + ((vec_id * 31 + i * 7) % 11) - 5
      |  FROM ev0 WHERE vec_id % 10 = 0)""".stripMargin) + """
      |SELECT id_a, id_b, dot
      |FROM dots
      |JOIN nrm na ON na.vec_id = id_a
      |JOIN nrm nb ON nb.vec_id = id_b
      |WHERE dot > 0
      |  AND CAST(dot AS HUGEINT) * dot * 10000 >= CAST(6400 AS HUGEINT) * na.n2 * nb.n2
      |ORDER BY id_a, id_b""".stripMargin

  /** k-NN self-join (k = 5) over the banded-LSH candidate graph: each
    * vector's top-k neighbors among its band-collision candidates, exact
    * integer dot as the score. The production ANN-join shape: candidate
    * generation is the ONE banded self-equi-join (never all-pairs), the
    * per-vector top-k is a bounded window over candidates only. Vectors
    * with no band collision have no neighbors and are absent — at corpus
    * scale that is the LSH recall trade, tuned via bands × bits.
    */
  def knnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    releaseLeases()
    val cands = lshScoredCandidates(
      quantized(spark, sfDir).select(col("vec_id"), col("q")))
    val sym = cands.select(col("id_a").as("src_id"), col("id_b").as("dst_id"),
      col("dot"))
      .unionByName(cands.select(col("id_b").as("src_id"),
        col("id_a").as("dst_id"), col("dot")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src_id").orderBy(col("dot").desc, col("dst_id"))
    sym.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .orderBy("src_id", "rank")
  }

  val knnLshSql: String =
    lshBandSql(quantizedEvSql + ",\n|ev AS (SELECT * FROM ev0)".stripMargin) + """,
      |sym AS (
      |  SELECT id_a AS src_id, id_b AS dst_id, dot FROM dots
      |  UNION ALL
      |  SELECT id_b AS src_id, id_a AS dst_id, dot FROM dots),
      |rk AS (
      |  SELECT src_id, dst_id, dot,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY src_id
      |      ORDER BY dot DESC, dst_id) AS INT) AS rank
      |  FROM sym)
      |SELECT src_id, dst_id, dot, rank FROM rk
      |WHERE rank <= 5 ORDER BY src_id, rank""".stripMargin

  // ------------------------------------------------------ text analysis

  /** Language-ID by stopword-marker frequency (n-gram heuristic). The
    * argmax is a fixed-order CASE over greatest() — deterministic ties.
    */
  /** Adds `s_en..s_fr` marker counts and the argmax `predicted_lang`
    * column (fixed-order ties, `und` when no marker hits) — shared by
    * [[langId]] and [[corpusCurate]].
    */
  private def withLangScores(df: DataFrame): DataFrame = {
    val markers = Seq("en" -> " the ", "es" -> " el ", "de" -> " der ", "fr" -> " le ")
    val scored = markers.foldLeft(df) { case (d, (l, m)) =>
      d.withColumn(s"s_$l",
        ((length(concat(lit(" "), col("text"), lit(" "))) -
          length(regexp_replace(concat(lit(" "), col("text"), lit(" ")),
            java.util.regex.Pattern.quote(m), ""))) / m.length).cast("long"))
    }
    val g = greatest(col("s_en"), col("s_es"), col("s_de"), col("s_fr"))
    scored.withColumn("predicted_lang",
      when(g === 0, "und")
        .when(col("s_en") === g, "en").when(col("s_es") === g, "es")
        .when(col("s_de") === g, "de").otherwise("fr"))
  }

  def langId(spark: SparkSession, sfDir: String): DataFrame =
    withLangScores(docs(spark, sfDir)).select(
      col("doc_id"), col("lang").as("labeled_lang"),
      col("s_en"), col("s_es"), col("s_de"), col("s_fr"),
      col("predicted_lang"))
      .orderBy("doc_id")

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

  // ------------------------------------------------- contamination / PII

  /** Benchmark-contamination check — the training-pipeline op that keeps
    * eval sets out of the corpus: every 97th doc stands in for the
    * benchmark set; each remaining doc is scored by how many of its
    * distinct word 3-grams appear in ANY benchmark doc. Scale shape: one
    * shared shingle subtree, one DISTINCT on the (small) benchmark side,
    * one shuffle equi-join on the shingle string, one count aggregation —
    * never a doc × benchmark cross product. At 100 TB the benchmark side
    * is broadcast-sized by construction.
    */
  def textContamination(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = shingles(spark, sfDir)
    val isBench = col("doc_id") % 97 === 0
    val benchSh = sh.filter(isBench).select(col("sh")).distinct()
    val cand = sh.filter(!isBench)
    val hits = cand.join(benchSh, "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("hit_ngrams"))
    cand.groupBy("doc_id").agg(count(lit(1)).as("n_ngrams"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("hit_ngrams"), lit(0L)).as("hit_ngrams"),
        col("n_ngrams"),
        (coalesce(col("hit_ngrams"), lit(0L)) > 0).as("contaminated"))
      .orderBy("doc_id")
  }

  val textContaminationSql: String =
    shinglesSql + """,
      |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
      |cand AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0),
      |hits AS (
      |  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS hit_ngrams
      |  FROM cand c JOIN bench b ON c.sh = b.sh GROUP BY c.doc_id)
      |SELECT t.doc_id,
      |  CAST(coalesce(h.hit_ngrams, 0) AS BIGINT) AS hit_ngrams,
      |  CAST(t.n_ngrams AS BIGINT) AS n_ngrams,
      |  coalesce(h.hit_ngrams, 0) > 0 AS contaminated
      |FROM (SELECT doc_id, count(*) AS n_ngrams FROM cand GROUP BY doc_id) t
      |LEFT JOIN hits h ON t.doc_id = h.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Per-source corpus report — the numbers a curation pipeline publishes
    * per ingest slice: doc counts, exact-dup rate (distinct text hashes vs
    * docs), char-length stats, dominant language. One hash-groupBy per
    * source/lang cell, all map-side combinable; at 100 TB this is a single
    * shuffle on a low-cardinality key.
    */
  def corpusStats(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("source"), col("lang"),
        md5(lower(trim(col("text")))).as("h"), col("n_chars"))
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("docs"),
        countDistinct(col("h")).as("distinct_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .withColumn("dup_bp",
        expr("(docs - distinct_docs) * 10000 DIV docs"))
      .orderBy("source", "lang")

  val corpusStatsSql: String =
    """SELECT source, lang,
      |  CAST(count(*) AS BIGINT) AS docs,
      |  CAST(count(DISTINCT md5(lower(trim(text)))) AS BIGINT) AS distinct_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(min(n_chars) AS BIGINT) AS min_chars,
      |  CAST(max(n_chars) AS BIGINT) AS max_chars,
      |  CAST((count(*) - count(DISTINCT md5(lower(trim(text))))) * 10000
      |    // count(*) AS BIGINT) AS dup_bp
      |FROM documents GROUP BY source, lang ORDER BY source, lang""".stripMargin

  /** PII scrub: redact email addresses and count redactions per doc. The
    * synthetic corpus carries no PII, so the FIXTURE plants a
    * deterministic address on every 10th doc; the operator (regex
    * redaction — identical semantics in Java regex and RE2 for this
    * character-class pattern) must find exactly those. Pure map — no
    * shuffle at all; codegen'd `regexp_replace`/`regexp_count`.
    */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val planted = docs(spark, sfDir).select(
      col("doc_id"),
      when(col("doc_id") % 10 === 0,
        concat(col("text"), lit(" contact-"), col("doc_id").cast("string"),
          lit("@mail.example.com ok")))
        .otherwise(col("text")).as("t"))
    val pat = "[a-z0-9.]+@[a-z0-9.]+"
    planted.select(
      col("doc_id"),
      expr(s"CAST(regexp_count(t, '$pat') AS BIGINT)").as("n_emails"),
      expr(s"regexp_replace(t, '$pat', '<email>')").as("clean_text"))
      .orderBy("doc_id")
  }

  val piiScrubSql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 0
      |      THEN text || ' contact-' || CAST(doc_id AS VARCHAR) || '@mail.example.com ok'
      |      ELSE text END AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '[a-z0-9.]+@[a-z0-9.]+')) AS BIGINT) AS n_emails,
      |  regexp_replace(t, '[a-z0-9.]+@[a-z0-9.]+', '<email>', 'g') AS clean_text
      |FROM planted ORDER BY doc_id""".stripMargin

  /** Deterministic train/val/test split: bucket = first 4 md5 hex digits
    * of the doc id (0..65535) mod 100 → <90 train, <95 val, else test.
    * Hashing the ID (not the content) makes the assignment stable under
    * content edits AND under corpus growth — adding docs never moves an
    * existing doc across splits, the property training pipelines need to
    * keep eval sets frozen across corpus versions. Scale path: pure map
    * over one column — zero shuffles, zero UDFs, codegen'd md5; the sort
    * is presentation-only.
    */
  def dataSplit(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test"))
      .orderBy("doc_id")

  /** DuckDB oracle: positional hex parse of the same 4 md5 digits (the
    * [[simhashSql]] trick — what Spark's conv(,16,10) computes), so the
    * bucket arithmetic is integer-exact in both engines.
    */
  val dataSplitSql: String = {
    val h4 = (0 until 4).map { p =>
      s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), ${p + 1}, 1)) - 1)" +
        s" * ${math.pow(16, 3 - p).toLong}"
    }.mkString(" + ")
    s"""WITH h AS (
       |  SELECT doc_id, CAST(($h4) % 100 AS BIGINT) AS bucket FROM documents)
       |SELECT doc_id, bucket,
       |  CASE WHEN bucket < 90 THEN 'train'
       |    WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
       |FROM h ORDER BY doc_id""".stripMargin
  }

  /** The end-to-end curation query — what a training-data user actually
    * runs: language gate (argmax marker score ≠ und) ∧ quality gate
    * (length/word thresholds) ∧ exact-dedup keep-one (min doc_id per
    * content fingerprint), with the surviving corpus stamped with its
    * train/val/test split. ONE plan: the only shuffle is the fingerprint
    * window (high-cardinality md5 key); everything else is codegen'd maps
    * over one scan — the composite stays 100 TB-shaped because each gate
    * is. Emits kept rows plus per-doc gate flags for dropped ones (a
    * curation run must account for what it dropped, not just keep the
    * survivors).
    */
  def corpusCurate(spark: SparkSession, sfDir: String): DataFrame = {
    val d = withLangScores(docs(spark, sfDir))
      .withColumn("t", trim(col("text")))
      .withColumn("chars", length(col("t")).cast("long"))
      .withColumn("spaces",
        (length(col("t")) - length(regexp_replace(col("t"), " ", ""))).cast("long"))
      .withColumn("words", col("spaces") + 1)
      .withColumn("passes_quality",
        col("chars").between(100, 4000) && col("words") >= 20)
      .withColumn("fp", md5(lower(col("t"))))
      .withColumn("is_keeper",
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("fp"))
          === col("doc_id"))
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 100)
    d.select(
      col("doc_id"), col("predicted_lang"), col("words"),
      col("passes_quality"), col("is_keeper"),
      (col("passes_quality") && col("is_keeper") &&
        col("predicted_lang") =!= "und").as("kept"),
      when(col("passes_quality") && col("is_keeper") &&
        col("predicted_lang") =!= "und",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val").otherwise("test"))
        .as("split"))
      .orderBy("doc_id")
  }

  val corpusCurateSql: String = {
    val h4 = (0 until 4).map { p =>
      s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), ${p + 1}, 1)) - 1)" +
        s" * ${math.pow(16, 3 - p).toLong}"
    }.mkString(" + ")
    s"""WITH s AS (
       |  SELECT doc_id, trim(text) AS t,
       |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) // 5 AS s_en,
       |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' el ', ''))) // 4 AS s_es,
       |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' der ', ''))) // 5 AS s_de,
       |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' le ', ''))) // 4 AS s_fr,
       |    CAST(($h4) % 100 AS BIGINT) AS bucket
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, bucket,
       |    CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
       |      WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
       |      WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
       |      WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
       |      ELSE 'fr' END AS predicted_lang,
       |    length(t) AS chars,
       |    length(t) - length(replace(t, ' ', '')) + 1 AS words,
       |    (length(t) BETWEEN 100 AND 4000
       |      AND length(t) - length(replace(t, ' ', '')) + 1 >= 20) AS passes_quality,
       |    min(doc_id) OVER (PARTITION BY md5(lower(t))) = doc_id AS is_keeper
       |  FROM s)
       |SELECT doc_id, predicted_lang, CAST(words AS BIGINT) AS words,
       |  passes_quality, is_keeper,
       |  (passes_quality AND is_keeper AND predicted_lang <> 'und') AS kept,
       |  CASE WHEN passes_quality AND is_keeper AND predicted_lang <> 'und'
       |    THEN CASE WHEN bucket < 90 THEN 'train'
       |      WHEN bucket < 95 THEN 'val' ELSE 'test' END
       |    ELSE NULL END AS split
       |FROM q ORDER BY doc_id""".stripMargin
  }
}
