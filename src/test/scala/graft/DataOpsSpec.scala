package graft

import org.apache.spark.sql.functions._

import graft.queries.DataOps

/** Quality checks for the banded (LSH) dedup paths: the candidate
  * generation must actually FIND the near-duplicates the exact method
  * finds — parameter choices (band size/count) are what recall lives or
  * dies on at corpus scale, so it is asserted here, not assumed.
  */
class DataOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("sign-LSH near-dup recall vs brute force (8 bands x 8 bits)") {
    val banded = DataOps.embeddingNearDup(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute force over the same (planted) corpus: all pairs with cos² ≥ 0.8²
    val q0 = spark.read.parquet(s"$sf/embeddings.parquet").select(
      col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))")
        .as("q"))
    val planted = q0.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(q, (x, i) -> x + ((vec_id * 31 + i * 7) % 11) - 5)")
          .as("q"))
    val all = q0.unionByName(planted)
    val a = all.select(col("vec_id").as("id_a"), col("q").as("qa"))
    val b = all.select(col("vec_id").as("id_b"), col("q").as("qb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dot", expr(
        "aggregate(zip_with(qa, qb, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .withColumn("na2", expr(
        "aggregate(transform(qa, x -> x * x), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .withColumn("nb2", expr(
        "aggregate(transform(qb, x -> x * x), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .filter(col("dot") > 0 && expr(
        "CAST(dot AS DECIMAL(38,0)) * dot * 10000 >= CAST(6400 AS DECIMAL(38,0)) * na2 * nb2"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(brute.nonEmpty, "fixture must contain true near-dup pairs")
    val recall = banded.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"banded recall $recall < 0.9 (found ${banded.size}, true ${brute.size})")
    // banded output is verified exactly, so it can never exceed brute force
    assert(banded.subsetOf(brute))
  }

  test("minhash LSH candidates feed the exact-Jaccard verify stage") {
    val pairs = DataOps.minhashLshPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = DataOps.ngramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // verify stage scores exactly the candidate set, with sane values
    assert(verified.map(v => (v._1, v._2)).toSet == pairs)
    assert(verified.forall(v => v._3 >= 0 && v._3 <= 10000))
  }

  test("near-dup clustering matches driver-side union-find over verified pairs") {
    // independent model: union-find over the exact-Jaccard-verified edges
    val edges = DataOps.ngramJaccard(spark, sf).collect()
      .collect { case r if r.getLong(2) >= 8000 => (r.getLong(0), r.getLong(1)) }
    assert(edges.nonEmpty, "fixture must contain verified near-dup edges")
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = DataOps.dedupCluster(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet == all, "every doc gets a cluster assignment")
    val byCluster = got.groupBy(_._2)
    for ((id, cid, size) <- got) {
      assert(cid == find(id), s"doc $id cluster")
      assert(size == byCluster(cid).length.toLong, s"doc $id cluster_size")
    }
    // the fixture exercises transitivity: at least one component of size >= 3
    assert(got.exists(_._3 >= 3), "expected a multi-hop component in the fixture")
    // canonical representative is a member of its own cluster
    for ((cid, members) <- byCluster)
      assert(members.map(_._1).min == cid, s"cluster $cid canonical id")
  }

  test("connected components converge on an adversarial chain (pointer jumping)") {
    import spark.implicits._
    // a 300-vertex path: plain neighbor-min propagation needs ~300 rounds,
    // far over the 25-round bound — only O(log diameter) pointer jumping
    // converges here. Offset ids so min-id isn't trivially vertex 0, plus a
    // second component and an isolated self-contained clique.
    val path = (0L until 299L).map(i => (1000L + i, 1000L + i + 1))
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 5L) yield (a, b)
    val pairs = (path ++ clique).toDF("doc_a", "doc_b")
    val got = DataOps.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 305)
    for (i <- 1000L to 1299L) assert(got(i) == 1000L, s"vertex $i")
    for (i <- 1L to 5L) assert(got(i) == 1L, s"vertex $i")
  }

  test("contamination check matches a naive 3-gram overlap model") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Set[String] = {
      val ws = t.trim.split(" ")
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val bench = docs.collect { case (id, t) if id % 97 == 0 => grams(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    val got = DataOps.textContamination(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    for ((id, hits, total, flag) <- got) {
      val g = grams(docs(id))
      assert(total == g.size, s"doc $id total")
      assert(hits == g.count(bench.contains).toLong, s"doc $id hits")
      assert(flag == (hits > 0))
    }
    // candidates = every doc with >=3 words that is not a benchmark doc
    val expectIds = docs.collect {
      case (id, t) if id % 97 != 0 && grams(t).nonEmpty => id }.toSet
    assert(got.map(_._1).toSet == expectIds)
  }

  test("data split matches an independent md5 model and is growth-stable") {
    val got = DataOps.dataSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.nonEmpty)
    // independent model: JDK MessageDigest, not Spark's md5
    def bucket(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.take(2).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 100
    }
    for ((id, b, s) <- got) {
      assert(b == bucket(id), s"doc $id bucket")
      val expect = if (b < 90) "train" else if (b < 95) "val" else "test"
      assert(s == expect, s"doc $id split")
    }
    // all three splits are populated and roughly 90/5/5 at 500 docs
    val byCat = got.groupBy(_._3).map { case (k, v) => k -> v.length }
    assert(byCat.keySet == Set("train", "val", "test"))
    assert(byCat("train") > byCat("val") + byCat("test"))
    // growth stability: the assignment is a pure function of doc_id, so
    // membership never moves as the corpus grows — model the invariant by
    // recomputing on ids alone
    assert(got.forall { case (id, b, _) => bucket(id) == b })
  }

  test("transcript assembly matches a driver-side fold of the final state") {
    val live = graft.queries.CdcQueries.finalState(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        Option(r.getString(3))))
    val expected = live.groupBy(_._1).map { case (conv, turns) =>
      val sorted = turns.sortBy(_._2)
      conv -> (
        turns.length.toLong,
        turns.count(_._3 == "user").toLong,
        turns.count(_._3 == "assistant").toLong,
        turns.map(_._4.fold(0L)(t =>
          (t.length - t.replace(" ", "").length + 1).toLong)).sum,
        sorted.map(t => s"${t._3}: ${t._4.getOrElse("")}").mkString("\n"))
    }
    val got = graft.queries.CdcQueries.transcriptAssemble(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(got == expected)
    // every example renders every surviving turn exactly once
    assert(got.values.map(_._5.count(_ == '\n') + 1).sum == live.length)
  }

  test("keep-best dedup picks the longest doc per cluster, id tiebreak") {
    val clusters = DataOps.dedupCluster(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = clusters.groupBy(_._2._1).map { case (cid, members) =>
      val ids = members.map(_._1)
      val keeper = ids.minBy(id => (-chars(id), id))
      cid -> (keeper, ids.length.toLong, chars(keeper))
    }
    val got = DataOps.dedupKeepBest(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected)
    // clusters actually merged something, so "best" differs from "first"
    // somewhere in the fixture unless every cluster min is also longest —
    // at minimum, the op returns one row per cluster
    assert(got.size == clusters.map(_._2._1).distinct.length)
  }

  test("corpus curation agrees with its component gates") {
    val cur = DataOps.corpusCurate(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), Option(r.getString(6)))).toMap
    val lang = DataOps.langId(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("predicted_lang")).toMap
    val qual = DataOps.textQuality(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("passes_quality")).toMap
    val keepers = DataOps.dedupExact(spark, sf).collect()
      .map(_.getAs[Long]("keeper_id")).toSet
    val split = DataOps.dataSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(cur.keySet == lang.keySet)
    for ((id, (pl, _, pq, keep, kept, sp)) <- cur) {
      assert(pl == lang(id), s"doc $id lang")
      assert(pq == qual(id), s"doc $id quality")
      assert(keep == keepers.contains(id), s"doc $id keeper")
      assert(kept == (pq && keep && pl != "und"), s"doc $id kept")
      assert(sp == (if (kept) Some(split(id)) else None), s"doc $id split")
    }
    // the gates actually bite on this corpus: some docs dropped, some kept
    assert(cur.values.exists(_._5) && cur.values.exists(!_._5))
  }

  test("pii scrub redacts exactly the planted addresses") {
    val got = DataOps.piiScrub(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length == 500)
    for ((id, n, clean) <- got) {
      assert(n == (if (id % 10 == 0) 1L else 0L), s"doc $id count")
      assert(!clean.contains("@"), s"doc $id leaked an address")
      if (id % 10 == 0) assert(clean.endsWith("contact-<email> ok"))
    }
  }
}
