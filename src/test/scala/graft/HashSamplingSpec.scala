package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

/** Portable (md5-keyed) sampling family: per-row pure-expression
  * membership, so the contracts are exact — cross-engine hex rendering
  * (pinned against the JVM's own MessageDigest), partition invariance,
  * fraction accuracy, sample NESTING under growing fractions, stratum
  * threshold algebra, and window parity for the per-group form.
  */
class HashSamplingSpec extends SparkSpec {

  private lazy val li = Tables.open(spark, sf, "lineitem")
    .withColumn("__id", concat(col("l_orderkey").cast("string"), lit("-"),
      col("l_linenumber").cast("string")))
    .cache()

  test("uniformByHash: fraction accuracy, partition invariance, determinism") {
    val n = li.count()
    val f = 0.05
    val s1 = Sampling.uniformByHash(li, "__id", f, seed = 42L)
    val got = s1.count()
    assert(math.abs(got - f * n) <= 4 * math.sqrt(f * n) + 5,
      s"selected $got of $n at fraction $f")
    // membership is a pure per-row expression: any physical partitioning
    // (and a second run) selects the identical set
    val s2 = Sampling.uniformByHash(li.repartition(13, col("l_partkey")),
      "__id", f, seed = 42L)
    assert(s1.select("__id").collect().map(_.getString(0)).toSet ==
      s2.select("__id").collect().map(_.getString(0)).toSet)
  }

  test("uniformByHash: samples nest as the fraction grows") {
    // hash < t1 implies hash < t2 for t1 <= t2: the f=0.01 sample must be
    // a strict subset of f=0.05 — the reproducible-subset property the
    // seeded RNG family cannot offer
    val small = Sampling.uniformByHash(li, "__id", 0.01)
      .select("__id").collect().map(_.getString(0)).toSet
    val big = Sampling.uniformByHash(li, "__id", 0.05)
      .select("__id").collect().map(_.getString(0)).toSet
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  test("uniformByHash: boundary fractions and membership stability under growth") {
    assert(Sampling.uniformByHash(li, "__id", 0.0).count() == 0)
    assert(Sampling.uniformByHash(li, "__id", 1.0).count() == li.count())
    intercept[IllegalArgumentException] {
      Sampling.uniformByHash(li, "__id", 1.5)
    }
    // growth stability: sampling a SUBSET of the corpus selects exactly
    // the intersection — new rows never evict old ones
    val sub = li.filter(col("l_orderkey") % 3 === 0)
    val fromSub = Sampling.uniformByHash(sub, "__id", 0.05)
      .select("__id").collect().map(_.getString(0)).toSet
    val fromFull = Sampling.uniformByHash(li, "__id", 0.05)
      .filter(col("l_orderkey") % 3 === 0)
      .select("__id").collect().map(_.getString(0)).toSet
    assert(fromSub == fromFull)
  }

  test("hash rendering matches the JVM md5 of the same key (oracle contract)") {
    // the oracle re-derives membership from md5(id || ':seed') hex — pin
    // Spark's rendering byte-for-byte so the cross-engine contract can
    // never drift silently
    val row = li.select(col("__id"),
      md5(concat(col("__id"), lit(":42"))).as("h")).head()
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest((row.getString(0) + ":42").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(row.getString(1) == expect)
  }

  test("stratifiedByHash: per-stratum thresholds are uniformByHash restricted") {
    val fr = Map("A" -> 0.08, "N" -> 0.02, "R" -> 0.08)
    val got = Sampling.stratifiedByHash(li, "l_returnflag", "__id", fr)
    // a stratum's selection IS the uniform selection at its fraction,
    // restricted to the stratum (same hash, same threshold algebra)
    fr.foreach { case (k, f) =>
      val strat = got.filter(col("l_returnflag") === k)
        .select("__id").collect().map(_.getString(0)).toSet
      val uni = Sampling.uniformByHash(li.filter(col("l_returnflag") === k),
        "__id", f).select("__id").collect().map(_.getString(0)).toSet
      assert(strat == uni, s"stratum $k")
    }
    // a stratum absent from the map is dropped entirely
    val dropped = Sampling.stratifiedByHash(li, "l_returnflag", "__id",
      Map("A" -> 0.5))
    assert(dropped.filter(col("l_returnflag") =!= "A").count() == 0)
  }

  test("uniformPerGroupByHash: window parity and exactly-k sizes") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val k = 4
    val got = Sampling.uniformPerGroupByHash(docs, "lang", "doc_id", k)
    val win = docs
      .withColumn("__h", md5(concat(col("doc_id").cast("string"), lit(":42"))))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("__h"), col("doc_id"))))
      .filter(col("__rk") <= k)
      .select("lang", "doc_id", "n_chars")
    assert(got.select("lang", "doc_id", "n_chars").collect().toSet ==
      win.collect().toSet)
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotSizes = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (g, n) =>
      assert(gotSizes(g) == math.min(k.toLong, n), s"group $g")
    }
    // partition invariance (pure hash order, bounded-buffer merge)
    val re = Sampling.uniformPerGroupByHash(
      docs.repartition(17, col("doc_id")), "lang", "doc_id", k)
    assert(re.select("lang", "doc_id").collect().toSet ==
      got.select("lang", "doc_id").collect().toSet)
  }

  test("weightedByHash: inclusion tracks weight, clamps at 1, nests in rate") {
    import spark.implicits._
    // 3 weight levels x 600 rows: empirical keep-rates must track
    // min(1, rate*w) within a binomial envelope
    val rows = (0L until 1800L).map(id => (id, Seq(100.0, 400.0, 2000.0)((id % 3).toInt)))
    val df = rows.toDF("id", "w")
    val rate = 0.0008 // p = 0.08 / 0.32 / 1.0 (clamped)
    val got = Sampling.weightedByHash(df, "id", "w", rate)
    val byW = got.groupBy("w").count()
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    Seq(100.0, 400.0, 2000.0).foreach { w =>
      val p = math.min(1.0, rate * w)
      val exp = 600 * p
      assert(math.abs(byW.getOrElse(w, 0L) - exp) <= 4 * math.sqrt(exp * (1 - p)) + 3,
        s"w=$w: kept ${byW.get(w)}, expected ~$exp")
    }
    // clamp branch: every p=1 row survives
    assert(byW(2000.0) == 600L)
    // nesting: a smaller rate selects a subset (thresholds are monotone)
    val small = Sampling.weightedByHash(df, "id", "w", rate / 4)
      .select("id").collect().map(_.getLong(0)).toSet
    val big = got.select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
    // degenerate weights are excluded by contract
    val weird = Seq((1L, Double.NaN), (2L, -5.0), (3L, 0.0))
      .toDF("id", "w")
      .unionByName(Seq((4L, Option.empty[Double])).toDF("id", "w"))
    assert(Sampling.weightedByHash(weird, "id", "w", 1.0).count() == 0)
    // partition invariance (pure per-row expression)
    val re = Sampling.weightedByHash(df.repartition(13, col("w")), "id", "w", rate)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(re == big)
  }

  test("temperatureMixByHash: flattening shares, clamp branch, determinism") {
    val docs = Tables.open(spark, sf, "documents").cache()
    try {
      val natural = docs.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val mixed = Sampling.temperatureMixByHash(docs, "lang", "doc_id",
        temperature = 2.0, targetRows = 450L)
      val got = mixed.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // T=2 flattens: each lang's KEPT FRACTION rises as its natural
      // count falls (share ∝ √n ⇒ rate ∝ 1/√n); compare the extremes
      val biggest = natural.maxBy(_._2)._1
      val smallest = natural.minBy(_._2)._1
      val rate = (l: String) => got(l).toDouble / natural(l)
      assert(rate(smallest) > rate(biggest),
        s"flattening violated: $got vs natural $natural")
      // at 450 every non-dominant lang's fraction clamps at 1 — all its
      // rows survive (the LEAST(1.0, ·) branch the catalog row pins in SQL)
      assert(got(smallest) == natural(smallest))
      // pure per-row membership: identical set under any partitioning
      val ids1 = mixed.select("doc_id").collect().map(_.getLong(0)).toSet
      val ids2 = Sampling.temperatureMixByHash(
        docs.repartition(13, col("source")), "lang", "doc_id", 2.0, 450L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids1 == ids2)
      // temperature 1 preserves natural shares exactly: rate = target/N
      // for every source, i.e. ONE uniform threshold — equals uniformByHash
      val t1 = Sampling.temperatureMixByHash(docs, "lang", "doc_id", 1.0, 400L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val uni = Sampling.uniformByHash(docs, "doc_id", 400.0 / docs.count())
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(t1 == uni)
    } finally { docs.unpersist(); () }
  }

  test("temperatureMixTokensByHash: weight-budgeted shares track √W") {
    val docs = Tables.open(spark, sf, "documents").cache()
    try {
      val w = docs.groupBy("lang").agg(sum(col("n_chars")).as("w")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val mixed = Sampling.temperatureMixTokensByHash(docs, "lang", "doc_id",
        "n_chars", temperature = 2.0, targetWeight = 60000L)
      val got = mixed.groupBy("lang").agg(sum(col("n_chars")).as("w")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // expected kept weight per lang = target·√W_l/Σ√W — realized weight
      // is a sum of ~rate·n_l independent inclusions; allow wide noise
      val z = w.values.map(v => math.sqrt(v.toDouble)).sum
      w.foreach { case (l, wl) =>
        val exp = 60000L * math.sqrt(wl.toDouble) / z
        assert(math.abs(got.getOrElse(l, 0L) - exp) < 0.5 * exp + 2000,
          s"$l: kept ${got.get(l)} chars, expected ~$exp")
      }
      // degenerate stratum contract: all-null source key fails loudly
      intercept[IllegalArgumentException] {
        Sampling.temperatureMixTokensByHash(
          docs.withColumn("lang", lit(null).cast("string")),
          "lang", "doc_id", "n_chars", 2.0, 1000L)
      }
    } finally { docs.unpersist(); () }
  }

  test("hashThreshold quantization is the shared oracle constant") {
    // the SQL literals in the catalog oracles interpolate hashThreshold —
    // pin the quantization rule (round-half-up on f·2^52) so a change
    // here can't silently diverge from committed oracle text
    assert(Sampling.hashThreshold(0.01) == 45035996273705L)
    assert(Sampling.hashThreshold(0.5) == (1L << 51))
    assert(Sampling.hashThreshold(0.0) == 0L)
    assert(Sampling.hashThreshold(1.0) == (1L << 52))
  }
}
